from etl_sql_and_pyspark_developement__spark.operators.cohort import cohort_retention
from etl_sql_and_pyspark_developement__spark.operators.cooccurrence import pair_cooccurrence
from etl_sql_and_pyspark_developement__spark.operators.sessionize import sessionize
from etl_sql_and_pyspark_developement__spark.operators.topk import top_k_per_group
from etl_sql_and_pyspark_developement__spark.operators.transitions import state_transitions

__all__ = [
    "sessionize",
    "top_k_per_group",
    "cohort_retention",
    "state_transitions",
    "pair_cooccurrence",
]
