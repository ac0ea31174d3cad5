"""The §2 query inventory: each entry is a (spark, sf_dir) -> DataFrame
callable re-expressing a reference capability Spark-first.

Conventions (driver-contract critical):
- Every computed column is aliased, with the *same* name used in the
  DuckDB oracle (plans/oracles.py) — the driver's comparator sorts
  columns by name and hashes values.
- All double outputs are rounded (money: 2 dp, rates/averages: 4 dp) so
  summation-order nondeterminism can't flip the value hash.
- Date anchors are literals or derived from the data, never
  current_date(), so results are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sql_and_pyspark_developement__spark.sources.catalog import table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def query(key: str):
    def deco(fn):
        QUERIES[key] = fn
        return fn

    return deco


# ---------------------------------------------------------------------------
# Core relational / analytics parity (SURVEY §2 table 1)
# ---------------------------------------------------------------------------


@query("q01_pricing_summary")
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide groupBy multi-agg (TPC-H Q1 shape).

    Reference parity: the grouped-metric rollups in
    pyspark/User Engagement Funnel Analysis.py:17-24 (8-agg groupBy) and
    Infrastructure Cost Optimization by Content Type.py.

    Scale: single shuffle on two low-cardinality keys; all aggregates
    decompose into partial (map-side) + final — optimal at any SF.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
