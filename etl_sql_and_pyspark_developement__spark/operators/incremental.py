"""Incremental aggregate maintenance: compute per-batch PARTIAL
aggregates, then merge partials — never re-scan history.

The 100 TB pattern: a daily rollup over an append-only fact is
maintained by aggregating only the new partition and merging it with
the stored partial state (sum→sum, count→sum, min→min, max→max);
non-decomposable outputs (avg) are derived from decomposable partials
at read time. This is exactly Spark's map-side partial-aggregation
contract lifted to cross-batch persistence, so merged results are
bit-identical to a full recompute — the invariant the q45 oracle
verifies value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# decomposable aggregate -> (partial expr, merge fn)
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def partial_aggs(
    df: DataFrame, keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Per-batch partial state. specs: {out_col: (fn, col)} with fn in
    sum/count/min/max ('count' col may be '*')."""
    aggs = []
    for out, (fn, col) in specs.items():
        if fn not in _MERGE:
            raise ValueError(f"{fn!r} is not decomposable")
        expr = F.count("*") if fn == "count" and col == "*" else getattr(F, fn)(col)
        aggs.append(expr.alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    parts: list[DataFrame], keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge any number of partial-state frames into the combined
    aggregate — a union + one decomposable groupBy, regardless of how
    many batches contributed."""
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    aggs = [
        _MERGE[fn](out).alias(out) for out, (fn, _col) in specs.items()
    ]
    return merged.groupBy(*keys).agg(*aggs)
