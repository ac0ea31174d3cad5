"""First-touch cohort retention matrix (the reference's Content
Performance with Cohort Analysis workload: signup-month cohorts ×
month offset).

Scale: two shuffles — one groupBy to find each entity's first-touch
month (partial-agg friendly min), one groupBy on (cohort, offset).
The retention denominator comes from a window over the *aggregated*
matrix (tiny), not from re-scanning the facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
) -> DataFrame:
    """Return (cohort_month, month_offset, active_entities,
    retention_pct) where cohort_month is the entity's first activity
    month and retention_pct is relative to the offset-0 cohort size."""
    month = F.date_format(F.date_trunc("month", F.col(ts_col)), "yyyy-MM")
    activity = df.select(
        F.col(entity_col).alias("entity"),
        F.date_trunc("month", F.col(ts_col)).alias("month_ts"),
        month.alias("month"),
    )
    first = activity.groupBy("entity").agg(
        F.min("month_ts").alias("cohort_ts"),
        F.min("month").alias("cohort_month"),
    )
    matrix = (
        activity.join(first, "entity")
        .select(
            "cohort_month",
            F.months_between(F.col("month_ts"), F.col("cohort_ts"))
            .cast("int")
            .alias("month_offset"),
            "entity",
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.countDistinct("entity").alias("active_entities"))
    )
    w = Window.partitionBy("cohort_month")
    base = F.max(
        F.when(F.col("month_offset") == 0, F.col("active_entities"))
    ).over(w)
    return matrix.withColumn(
        "retention_pct",
        F.round(F.col("active_entities") * 100.0 / base, 4),
    )
