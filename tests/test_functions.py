"""Unit tests for the shared column-expression helpers."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_safe_div_null_on_zero(spark):
    from etl_sql_and_pyspark_developement__spark.functions import safe_div

    df = spark.createDataFrame([(10.0, 4.0), (1.0, 0.0)], ["n", "d"])
    got = [r.q for r in df.select(safe_div(F.col("n"), F.col("d")).alias("q")).collect()]
    assert got[0] == 2.5
    assert got[1] is None


def test_pct_and_zscore(spark):
    from etl_sql_and_pyspark_developement__spark.functions import pct, zscore

    df = spark.createDataFrame([(25.0, 100.0, 10.0, 5.0)], ["x", "t", "m", "s"])
    r = df.select(
        pct(F.col("x"), F.col("t")).alias("p"),
        zscore(F.col("x"), F.col("m"), F.col("s")).alias("z"),
    ).collect()[0]
    assert r.p == 25.0
    assert r.z == 3.0


def test_bucket_by_thresholds(spark):
    from etl_sql_and_pyspark_developement__spark.functions import bucket_by_thresholds

    df = spark.createDataFrame([(1,), (15,), (100,)], ["v"])
    buckets = bucket_by_thresholds(
        F.col("v"), [(5, "low"), (50, "mid")], "high"
    )
    got = [r.b for r in df.select(buckets.alias("b")).collect()]
    assert got == ["low", "mid", "high"]


def test_needs_driver_row_names_real_queries():
    """Every key in the driver-priority backlog must be a registered
    query — a typo here would silently demote a real backlog entry
    below the driver's 50-row sampling horizon."""
    import __spark_entry__ as entry

    from etl_sql_and_pyspark_developement__spark.plans import QUERIES

    unknown = [k for k in entry._NEEDS_DRIVER_ROW if k not in QUERIES]
    assert not unknown, f"backlog names unknown queries: {unknown}"
