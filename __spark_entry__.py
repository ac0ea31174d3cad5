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
    # round-5 changes: capped-fold HALF_UP helper rides Spark's
    # Double.toString decimalization (q61), hierarchy validate gate +
    # NULL-parent message (q66), kcore budget-vs-confirm fix (q78)
    "q61_capped_running_total", "q66_hierarchy_rollup", "q78_kcore",
    # round-5 additions: survival / concentration / LATERAL surface /
    # sweep-line / autocorr / KS lanes + curation audits
    "q88_survival_km", "q89_hhi_concentration", "q90_lateral_topk",
    "q91_interval_union", "q92_autocorr_daily", "q93_ks_two_sample",
    "d20_dup_inflation_audit", "t22_term_burstiness",
    "p19_privacy_noise", "s09_knn_label_vote",
    # round-5 Spark-4 SQL surfaces + lake-layout lane
    "q94_sql_pipe", "q95_sql_udf", "q96_sql_variables",
    "q97_partition_pruned_rollup",
    # round-5 eval / multimodal-dedup additions
    "d21_lsh_recall_eval", "m08_frame_dedup",
    # round-5 change: d06/d15 consume the shared verified-pairs artifact
    "d06_dedup_components", "d15_quality_keeper",
    # round-5: exact-distinct bitmaps + CV-split lane
    "q98_bitmap_exact_distinct", "p20_group_kfold",
    # round-5: directional as-of (q25's operator grew tiebreak+forward)
    "q99_asof_directions", "q25_asof_attribution",
    # round-5: bucketed co-located join lane
    "q100_bucketed_colocated_join",
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
