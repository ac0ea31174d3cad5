"""As-of (point-in-time) join — Spark has no native one; this is the
canonical scale-correct composition: tag + union + partitioned window
with last(ignorenulls), i.e. ONE shuffle on the key and no range
explosion. (The alternative, applyInPandas + pd.merge_asof per group,
drops to Python; only worth it for many columns of payload.)

For each left row, attaches the latest right row with
right.ts <= left.ts within the same key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, Column | str],
) -> DataFrame:
    """Return `left` plus, for every name in `payload`, the value of
    that right-side column from the most recent right row at or before
    the left row's timestamp (NULL if none).

    Ties on the right side break toward the greater right timestamp
    then arbitrary-but-deterministic via the payload ordering column
    order; callers with duplicate (key, ts) right rows should
    pre-aggregate.
    """
    pay_names = list(payload)
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[
            (F.col(c) if isinstance(c, str) else c).alias(f"__p_{n}")
            for n, c in payload.items()
        ],
    )
    l = left.withColumn("__k", F.col(key)).withColumn(
        "__ts", F.col(left_ts)
    ).withColumn("__side", F.lit(1))
    for n in pay_names:
        l = l.withColumn(f"__p_{n}", F.lit(None).cast(r.schema[f"__p_{n}"].dataType))
    unioned = l.select(*[f.name for f in l.schema.fields]).unionByName(
        r, allowMissingColumns=True
    )
    # right rows (side 0) sort before left rows at equal ts -> "<=" semantics
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned
    for n in pay_names:
        matched = matched.withColumn(
            f"asof_{n}", F.last(f"__p_{n}", ignorenulls=True).over(w)
        )
    return (
        matched.filter(F.col("__side") == 1)
        .drop("__k", "__ts", "__side", *[f"__p_{n}" for n in pay_names])
    )
