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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_sql_and_pyspark_developement__spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    from etl_sql_and_pyspark_developement__spark.plans import ORACLES

    return dict(ORACLES)
