"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the SURVEY §2 inventory for the driver's
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q01_pricing_summary) on /root/testdata/sf0.001."""
    from etl_sql_and_pyspark_developement__spark.plans import QUERIES
    from etl_sql_and_pyspark_developement__spark.session import configure_existing

    configure_existing(spark)
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# Entries with no driver CORRECTNESS row for their *current* code —
# listed FIRST so a driver that samples 50 entries per round covers
# the unproven backlog before re-proving already-green rows.
# Round-4 backlog (per VERDICT r03 item 1): exactly the 6 entries
# added after the r03 driver snapshot, plus anything round 4
# touches (appended as it changes).
_NEEDS_DRIVER_ROW = [
    # never driver-checked (added after the r03 snapshot)
    "q71_triangle_count", "q72_ewma_smoothing", "q73_drift_psi",
    "q74_wilson_ci", "q75_chi_square", "p17_target_encoding",
    # round-4 changes: shared kNN-graph artifact consumers (q68/p12;
    # q71 above), fold rounding/guard (q61/q72 above), hierarchy
    # dangling-parent pre-check (q66)
    "q68_pagerank_centrality", "p12_density_prune",
    "q61_capped_running_total", "q66_hierarchy_rollup",
    # round-4 additions: native recursive CTE twin, staged-doc VARIANT,
    # rank-test / graph / concentration / ANN-eval lanes
    "q76_sql_recursive", "q69_variant_json",
    "q77_mann_whitney", "q78_kcore", "q79_gini_concentration",
    "s08_ann_recall_eval", "q80_cusum_changepoint",
    "d19_containment_dedup", "t21_keyness_loglik",
    "q81_bootstrap_ci", "m07_audio_vad",
    "q82_seasonal_decompose", "q83_time_to_convert",
    "q84_lift_gains", "q85_source_overlap", "q86_holt_forecast",
    "q87_benford_audit", "p18_shard_manifest",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    unproven/changed-first (see _NEEDS_DRIVER_ROW)."""
    from etl_sql_and_pyspark_developement__spark.plans import QUERIES

    ordered = {k: QUERIES[k] for k in _NEEDS_DRIVER_ROW if k in QUERIES}
    for k in sorted(QUERIES):
        ordered.setdefault(k, QUERIES[k])
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    from etl_sql_and_pyspark_developement__spark.plans import ORACLES

    return dict(ORACLES)
