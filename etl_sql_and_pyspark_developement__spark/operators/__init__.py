from etl_sql_and_pyspark_developement__spark.operators.asof import as_of_join
from etl_sql_and_pyspark_developement__spark.operators.cohort import cohort_retention
from etl_sql_and_pyspark_developement__spark.operators.cooccurrence import pair_cooccurrence
from etl_sql_and_pyspark_developement__spark.operators.dedup import (
    exact_dedup_stats,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from etl_sql_and_pyspark_developement__spark.operators.scd2 import scd2_apply
from etl_sql_and_pyspark_developement__spark.operators.sessionize import sessionize
from etl_sql_and_pyspark_developement__spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
)
from etl_sql_and_pyspark_developement__spark.operators.topk import top_k_per_group
from etl_sql_and_pyspark_developement__spark.operators.transitions import state_transitions

__all__ = [
    "sessionize",
    "top_k_per_group",
    "cohort_retention",
    "state_transitions",
    "pair_cooccurrence",
    "as_of_join",
    "scd2_apply",
    "exact_dedup_stats",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "cosine_topk",
    "ann_lsh_topk",
]
