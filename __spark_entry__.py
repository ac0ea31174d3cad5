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


# Queries the round-1 driver did not reach (it recorded exactly the
# first 50 registered entries), plus entries modified or added this
# round — listed FIRST so a driver that samples or time-boxes its
# correctness pass covers the unproven surface before re-proving
# already-green rows.
_NEEDS_DRIVER_ROW = [
    "q25_asof_attribution", "q26_rolling_window", "q27_approx_sketches",
    "q28_gap_fill", "q29_scd2_merge", "q30_sql_surface", "q31_unpivot",
    "q32_collect_agg", "q33_data_quality", "q34_interval_attribution",
    "q35_binge_pipeline", "q36_grouping_sets", "q37_full_outer",
    "q38_window_gallery", "q39_range_join", "q40_json_extract",
    "q41_higher_order", "q42_salted_agg", "q43_time_rollup",
    "d05_dedup_edit_distance", "d06_dedup_components",
    "d07_components_exact", "d08_embedding_neardup", "d09_decontaminate",
    "s03_ann_ivf", "s04_mmr_diverse_topk", "m02_frame_sample",
    "m03_resize", "p01_per_group_cap", "p02_stratified_sample",
    "p03_hash_split", "p04_pipeline_e2e", "p05_corpus_mix",
    # new this round
    "q46_windowed_percentile", "q47_sql_rollup", "q48_sql_window",
    "p09_sequence_pack", "q49_sql_sessionize", "t11_bigram_surprisal",
    "m05_image_phash", "p10_curriculum", "s05_knn_graph",
    "p11_temperature_mix", "q50_ranked_concat", "q51_sketch_merge",
    "d13_boilerplate_scrub", "p12_density_prune", "t12_heuristic_rules",
    "s06_pq_ann", "m06_modality_router", "p13_dataset_card", "t13_bpe_merge_counts", "q52_rolling_distinct",
    # modified this round (need fresh green rows)
    "q12_ltv_deciles", "q14_percentile_benchmark", "q16_roi_deciles",
    "q17_daily_growth", "d11_semantic_dedup", "m04_window_features",
    "p06_token_budget", "m02_frame_sample", "p02_stratified_sample",
    "m03_resize", "s04_mmr_diverse_topk",
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
