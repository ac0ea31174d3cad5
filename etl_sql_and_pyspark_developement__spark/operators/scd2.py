"""SCD Type-2 merge emulation (CDC apply) with plain DataFrame ops.

Spark without Delta/Iceberg has no MERGE INTO; the standard emulation
is: detect changed keys (join + any-attr-differs), close the old rows
(set valid_to), append the new versions, pass untouched rows through.
One shuffle on the business key for the join; the union is narrow.

This is the reference category's bread-and-butter ETL pattern
(slowly-changing user/subscription attributes — cf. the Subscription
Upgrade-Downgrade workload tracking attribute changes over time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attr_cols: list[str],
    effective_date: str,
) -> DataFrame:
    """Apply `updates` (key + attr_cols) to an SCD2 `dim` (key +
    attr_cols + valid_from + valid_to, open rows have valid_to NULL).

    Returns the new dimension state: closed old versions, opened new
    versions (valid_from = effective_date), unchanged rows untouched.
    """
    open_rows = dim.filter(F.col("valid_to").isNull())
    closed_rows = dim.filter(F.col("valid_to").isNotNull())

    upd = updates.select(
        F.col(key), *[F.col(c).alias(f"__new_{c}") for c in attr_cols]
    )
    joined = open_rows.join(upd, key, "left")
    differs: Column = F.lit(False)
    for c in attr_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    # Rows whose update actually changes something. (Presence of an
    # update is detected via the first attr being non-null post-join —
    # updates with all-NULL attrs are not supported.)
    changed = joined.filter(F.col(f"__new_{attr_cols[0]}").isNotNull() & differs)

    closed_now = changed.select(
        key,
        *attr_cols,
        "valid_from",
        F.lit(effective_date).alias("valid_to"),
    )
    opened_now = changed.select(
        key,
        *[F.col(f"__new_{c}").alias(c) for c in attr_cols],
        F.lit(effective_date).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    unchanged = joined.filter(
        F.col(f"__new_{attr_cols[0]}").isNull() | ~differs
    ).select(key, *attr_cols, "valid_from", "valid_to")

    return closed_rows.select(key, *attr_cols, "valid_from", "valid_to").unionByName(
        unchanged
    ).unionByName(closed_now).unionByName(opened_now)
