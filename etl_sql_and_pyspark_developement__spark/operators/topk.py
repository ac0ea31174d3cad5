"""Top-K per group (the reference's per-geography content ranking,
SQL/Geographic Content Preference Mapping.txt — RANK() per region).

Scale: Window.partitionBy(group) + row_number is a single shuffle on
the group key, and Spark's WindowGroupLimit pushes the K-limit into
the sort (no full per-group sort materialization on recent Spark).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_name: str = "rnk",
) -> DataFrame:
    """Keep the top-k rows per group. Pass fully deterministic
    ``order_cols`` (include a unique tiebreaker) for reproducibility."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )
