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
    # round-6 change: q88 de-vacuated — data-derived mean-gap censor
    # horizon (nonzero rows at every scale), terminal d=n bucket
    # pinned to 0.0 instead of log(0), in-plan population-split guard
    "q88_survival_km",
    # round-6 change: DECIMAL(38,0)/HUGEINT cross-multiplies so
    # neither engine overflows 2^63 at large scale factors
    "q89_hhi_concentration", "q93_ks_two_sample",
    # round-6 change: bucketed-twin cache key now carries EACH
    # table's own source identity (v=2 — twins rebuilt)
    "q100_bucketed_colocated_join",
    # round-6 addition: AQE runtime skew-split demonstration lane
    "q101_aqe_skew_join",
    # round-6 additions: in-flight observe() quality counters (q33
    # refactored to share the check list), iterated BPE trainer,
    # OR-merged bitmap rolling distinct
    "q102_observed_quality", "q33_data_quality",
    "t23_bpe_train_iterations", "q103_rolling_bitmap_distinct",
    # round-6 addition: runtime dynamic-partition-pruning lane
    "q104_dynamic_partition_pruning",
    # round-6 addition: A-Res weighted reservoir sample
    "p21_weighted_reservoir",
    # round-6 addition: Python Data Source API connector surface
    "q105_python_datasource",
    # round-6 addition: incremental index-vs-delta ingestion dedup
    "d22_incremental_dedup",
    # round-6 addition: BPE train->apply->measure compression lane
    "t24_bpe_compression",
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
