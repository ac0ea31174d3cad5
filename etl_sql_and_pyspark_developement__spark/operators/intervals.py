"""Interval union (gaps-and-islands): merge overlapping per-entity
intervals into maximal covered spans.

The reference computes watched-time from viewing_history rows
(pyspark/Binge-Watching Behavior Analysis.py — per-session
total_watch_duration sums raw durations, which double-counts
overlapping plays). Interval union is the correct primitive: per
entity, sort intervals, island-break wherever a new interval starts
after the running max end, then aggregate per island.

Scale: exactly ONE shuffle — both windows partition by the entity key
(high cardinality), and the island groupBy reuses that partitioning
(Catalyst collapses it into the same exchange). No self-joins, no
O(n^2) overlap tests. All arithmetic is BIGINT (epoch microseconds),
so results are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    entity_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Return one row per (entity, island) with ``island_start``,
    ``island_end`` (same type as the inputs) and ``n_intervals``.

    Intervals are half-open-agnostic: touching intervals
    (start == previous end) merge, matching the SQL running-max idiom.
    ``tiebreak_col`` makes row order deterministic under equal starts.
    """
    order: list[Column] = [F.col(start_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("island_id", island)
        .groupBy(entity_col, "island_id")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count("*").alias("n_intervals"),
        )
    )
