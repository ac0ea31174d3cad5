"""Range (point-in-interval) join — Spark OSS has no native range-join
optimization: a bare  p BETWEEN lo AND hi  predicate plans as a
BroadcastNestedLoopJoin (or cartesian) + filter, O(|points|·|intervals|).

This is the canonical bin-bucketing rewrite (the semantics of the
Databricks RANGE_JOIN hint, expressed in open-source Spark): every
point maps to exactly ONE bin, every interval explodes to the bins it
spans, and the join becomes an equi-join on (bin [, keys...]) with the
exact BETWEEN as a residual filter. Catalyst then plans a shuffled
equi-join, partial work is distributed, and AQE can handle skewed bins.

Cost model: interval side grows by ~(interval_width / bin_width + 1)
rows; candidate pairs per bin shrink proportionally. Pick bin_width of
the order of the typical interval width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampType


def _basis(df: DataFrame, name: str) -> Column:
    """Numeric binning basis for a column: epoch seconds for
    timestamps/dates (truncation is bin-consistent: p >= lo implies
    floor-seconds(p) >= floor-seconds(lo), so coverage never leaks),
    the raw value for numerics."""
    dt = df.schema[name].dataType
    if isinstance(dt, (TimestampType, DateType)):
        return F.unix_timestamp(F.col(name))
    return F.col(name)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    keys: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    lo <= point <= hi (and equal `keys`, if given), without a nested
    loop. `points` and `intervals` must not share column names other
    than `keys`; the result carries all point columns plus the
    interval columns minus the duplicated keys.
    """
    p = points.withColumn(
        "__bin", F.floor(_basis(points, point_col) / F.lit(bin_width))
    ).alias("__pts")
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_basis(intervals, lo_col) / F.lit(bin_width)),
                F.floor(_basis(intervals, hi_col) / F.lit(bin_width)),
            )
        ),
    ).alias("__iv")

    cond = F.col("__pts.__bin") == F.col("__iv.__bin")
    for k in keys:
        cond = cond & (F.col(f"__pts.{k}") == F.col(f"__iv.{k}"))
    cond = (
        cond
        & (F.col(f"__pts.{point_col}") >= F.col(f"__iv.{lo_col}"))
        & (F.col(f"__pts.{point_col}") <= F.col(f"__iv.{hi_col}"))
    )

    keep_iv = [
        c for c in intervals.columns if c not in keys
    ]
    out = p.join(i, cond, how).select(
        *[F.col(f"__pts.{c}") for c in points.columns],
        *[F.col(f"__iv.{c}") for c in keep_iv],
    )
    return out
