from etl_sql_and_pyspark_developement__spark.plans.oracles import ORACLES
from etl_sql_and_pyspark_developement__spark.plans.queries import QUERIES

__all__ = ["QUERIES", "ORACLES"]
