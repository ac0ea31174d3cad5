"""Gap-based sessionization (the reference's binge-session detection,
SQL/Binge-Watching Behavior Analysis.txt:10-33, re-expressed as the
canonical Spark lag+cumsum pattern).

Scale: exactly ONE shuffle — the window partitions by the entity key;
lag and the running sum then execute within each partition. No
self-joins, no collect. At 100 TB this is the textbook plan: shuffle
on user_id once, everything else is partition-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign ``session_seq`` (1-based per entity) by splitting the
    entity's event stream wherever the gap exceeds ``gap_seconds``.

    ``tiebreak_col`` makes ordering deterministic under equal
    timestamps (required for oracle parity and reproducible runs).
    """
    order: list[Column] = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    cum = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(is_new).over(cum))
