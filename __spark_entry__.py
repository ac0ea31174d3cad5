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
    # round-8 addition: Python UDTF + LATERAL correlation lane
    "q118_udtf_lateral",
    # round-8 addition: CBO join-reorder lane (3-table star, stats-
    # driven rotation; values join-order-invariant)
    "q119_cbo_join_reorder",
    # round-8 addition: SQL scripting (BEGIN/DECLARE/WHILE/IF) lane
    "q120_sql_scripting",
    # round-8 addition: approx_top_k heavy-hitters sketch lane
    "q121_approx_top_k",
    # round-8 addition: native XML source interop lane
    "q122_xml_interop",
    # round-8 addition: mapInArrow integer-moments kernel lane
    "s11_arrow_vector_features",
    # round-8 addition: modern-SQL ergonomics lane (params/IDENTIFIER/
    # listagg/lateral alias/try_cast)
    "q123_modern_sql",
    # round-8 addition: parquet footer-stats aggregate pushdown lane
    "q124_agg_pushdown",
    # round-8 addition: k-anonymity suppression release lane
    "p23_k_anonymity",
    # round-8 addition: GROUP BY partition-column pushdown lane
    "q125_groupby_pushdown",
    # round-8 change: q115's reader now localCheckpoints the split
    # (cache-lifetime-independent plan) — fresh row re-proves it
    "q115_quarantine_ingest",
    # round-7 change: BPE re-segmentation rebuilt on both-delimited
    # symbol strings + two-pass replace (end delimiter kills the
    # prefix-extension false merge; pass 2 catches consecutive runs)
    # — operator AND oracle moved together, so fresh rows are needed
    "t23_bpe_train_iterations", "t24_bpe_compression",
    # round-7 change: q89's window denominator now DECIMAL(38,0)
    # (the nation-total sum itself passes 2^63 at big SF)
    "q89_hhi_concentration",
    # round-7 additions: explicit salted-join lane and the native
    # batch session_window twin of q03
    "q107_salted_join", "q109_session_window",
    # round-7 addition: ANALYZE TABLE + CBO stats-driven planning lane
    "q106_cbo_stats_join",
    # round-7 addition: zone-map / row-group skipping measurement lane
    "q108_rowgroup_skipping",
    # round-7 additions: runtime bloom-filter join lane, WindowGroupLimit
    # rank-pushdown lane, exchange-reuse self-join lane
    "q110_bloom_filter_join", "q111_window_group_limit",
    "q112_exchange_reuse",
    # round-7 addition: leakage-free held-out bigram-LM evaluation
    "t25_heldout_perplexity",
    # round-7 addition: Python Data Source filter pushdown lane
    "q113_python_ds_pushdown",
    # round-7 addition: SQL INSERT OVERWRITE dynamic-partition refresh
    "q114_insert_overwrite_dynamic",
    # round-7 addition: LSH banding parameter sweep (r x b S-curve)
    "d23_lsh_band_sweep",
    # round-7 addition: ORC format interop lane
    "q116_orc_interop",
    # round-7 addition: composed IVF-PQ ANN (FAISS IVFPQ shape)
    "s10_ivf_pq_ann",
    # round-7 addition: leakage-safe (near-dup-grouped) train/test split
    "p22_leakage_safe_split",
    # round-7 addition: small-file compaction maintenance lane
    "q117_compaction_maintenance",
    # round-7 change: q105's sizing count is now cached per source
    # identity (one less driver job per pass) — body changed, so a
    # fresh driver row re-proves it
    "q105_python_datasource",
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
