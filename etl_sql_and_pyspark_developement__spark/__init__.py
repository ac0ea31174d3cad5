"""PySpark-native analytics engine re-expressing the capabilities of the
reference repo dabbiruavinash/ETL-SQL-AND-PYSPARK-DEVELOPEMENT- (paired
SQL + PySpark analytics workloads) as an idiomatic Spark DataFrame/SQL
library, plus LLM-training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing).

See SURVEY.md for the full capability inventory this package covers.
"""

from etl_sql_and_pyspark_developement__spark.session import get_spark

__all__ = ["get_spark"]
