"""Scale-path quantile bucketing.

Exact NTILE(n) needs a global sort — at 10⁹+ entities the single
ORDER BY window is the bottleneck (q12's ltv deciles note in
PLANS.md). The 2-pass alternative: (1) approx_percentile computes the
n-1 cut points with a fixed-size mergeable sketch (partial-aggregable,
one shuffle of sketch bytes, never rows); (2) each row's bucket is a
branch-free comparison against the broadcast cut array — narrow, no
shuffle, no sort.

Buckets are approximate at the boundaries (sketch accuracy
1/accuracy), exact in expectation; ties land in the lower bucket,
matching SQL width-bucket semantics rather than NTILE's exact
equal-count split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_ntile(
    df: DataFrame,
    value_col: str,
    n: int,
    out_col: str = "bucket",
    accuracy: int = 10000,
) -> DataFrame:
    """Assign each row an approximate n-tile bucket in [1, n] by
    `value_col`, ascending (bucket 1 = smallest values)."""
    probs = [i / n for i in range(1, n)]
    cuts = df.select(
        F.percentile_approx(value_col, probs, accuracy).alias("c")
    ).first()["c"]
    return df.withColumn(out_col, bucket_expr(F.col(value_col), list(cuts)))


def bucket_expr(value: Column, cuts: list[float]) -> Column:
    """1 + (number of cut points strictly below value) as a codegen
    expression over a literal array — no join, no UDF."""
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    return (
        F.lit(1)
        + F.size(F.filter(arr, lambda c: c < value))
    ).cast("int")
