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
# Round-3 backlog (per VERDICT r02): 23 entries added after the r02
# driver snapshot + 7 modified after their r01 row, plus anything
# touched this round (appended as it changes).
_NEEDS_DRIVER_ROW = [
    # never driver-checked (added after the r02 snapshot)
    "d14_url_dedup", "d15_quality_keeper", "d16_entity_resolution",
    "d17_cdc_chunk_dedup", "p13_dataset_card", "p14_label_vote",
    "q52_rolling_distinct", "q53_path_pattern", "q54_forward_fill",
    "q55_snapshot_diff", "q56_trend_regression", "q57_sql_cohort",
    "q58_multitouch_attribution", "q59_histogram", "q60_pareto_abc",
    "q61_capped_running_total", "q62_temporal_join",
    "t13_bpe_merge_counts", "t14_char_diversity", "t15_oov_rate",
    "t16_hash_embed", "t17_sentiment", "t18_langid_eval",
    # modified after their r01 driver row (r02 did not re-sample them)
    "q12_ltv_deciles", "q14_percentile_benchmark", "q16_roi_deciles",
    "q17_daily_growth", "d11_semantic_dedup", "m04_window_features",
    "p06_token_budget",
    # round-3 changes: components rework (d06/d07), similarity-path
    # rebuild (s03/s04), and the six new round-3 queries
    "d06_dedup_components", "d07_components_exact",
    "s03_ann_ivf", "s04_mmr_diverse_topk",
    "q63_anomaly_mad", "q64_sequence_bigrams", "d18_ngram_novelty",
    "t19_readability", "t20_zipf_slope", "p15_pps_sample",
    "t02_lang_id",  # predict_lang single-tokenize rebuild (round 3)
    "q65_weighted_median", "q66_hierarchy_rollup", "q67_rfm_segments",
    "s07_rrf_fusion", "q68_pagerank_centrality", "p16_length_batching",
    "q69_variant_json",
    "q27_approx_sketches",  # distinct/percentile agg split (round 3)
    "q70_zorder_layout", "q71_triangle_count", "q72_ewma_smoothing",
    "q73_drift_psi", "p17_target_encoding", "q74_wilson_ci", "q75_chi_square",
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
