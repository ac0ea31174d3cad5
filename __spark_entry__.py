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
    # round-9 addition: AQE partition-coalescing lane (third AQE
    # lever after q101 skew-split and q104 DPP)
    "q126_aqe_coalesce",
    # round-9 addition: priced Arrow scalar UDF exhibit (in-row
    # UDF==expression equality; the 4.5x cost recorded in PLANS.md)
    "q127_arrow_scalar_udf",
    # round-9 addition: retention/TTL partition-delete maintenance
    # lane (atomic sweep, survivors value-verified)
    "q128_retention_delete",
    # round-9 addition: hidden _metadata file-lineage audit lane
    "q129_file_metadata_audit",
    # round-9 addition: mergeSchema two-generation read lane
    "q130_schema_evolution_read",
    # round-9 addition: temporal embargo split with crossing audit
    "p24_temporal_embargo_split",
    # round-9 addition: AQE runtime SMJ->BHJ conversion lane
    "q131_aqe_runtime_broadcast",
    # round-9 addition: Hive-style script transform (no-serde) lane
    "q132_script_transform",
    # round-9 change: q120's final rollup now filters on thr/2 (the
    # last threshold keeping >= 1000 orders) so the output is
    # non-empty and the converged threshold/tier are GENUINELY
    # value-compared (ADVICE r8: the empty-vs-empty hash match was
    # vacuous) — operator AND oracle moved together
    "q120_sql_scripting",
    # round-9 change: vector_features_arrow now fails loudly on NULL
    # list slots / elements — fresh row re-proves the kernel
    "s11_arrow_vector_features",
    # round-9 change: analyzed_part_table / analyzed_star_tables grew
    # a self-healing metadata-only stats check (crash between
    # saveAsTable and ANALYZE no longer wedges a stats-less table)
    # and moved onto the shared _artifact_dest key recipe — fresh
    # rows re-prove both CBO lanes end-to-end
    "q106_cbo_stats_join", "q119_cbo_join_reorder",
    # round-9 change: xml_orders_fixture re-keyed onto _artifact_dest
    # (artifact rebuilds under the new key)
    "q122_xml_interop",
    # round-9 change: maintained_daily_table now derives its CREATE
    # TABLE DDL from rollup.schema instead of hardcoding it
    "q114_insert_overwrite_dynamic",
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
