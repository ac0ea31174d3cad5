"""State-transition matrix via LAG (the reference's Subscription
Upgrade-Downgrade Patterns workload: consecutive subscription states
per user → transition counts).

Scale: one shuffle (window on the entity key), then a low-cardinality
groupBy on (from_state, to_state) — partial aggregation collapses it
map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def state_transitions(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Return (from_state, to_state, n_transitions, pct_of_from) over
    consecutive per-entity state observations."""
    order: list[Column] = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    pairs = (
        df.withColumn("from_state", F.lag(state_col).over(w))
        .filter(F.col("from_state").isNotNull())
        .select("from_state", F.col(state_col).alias("to_state"))
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count("*").alias("n_transitions")
    )
    w_from = Window.partitionBy("from_state")
    return counts.withColumn(
        "pct_of_from",
        F.round(
            F.col("n_transitions") * 100.0 / F.sum("n_transitions").over(w_from), 4
        ),
    )
