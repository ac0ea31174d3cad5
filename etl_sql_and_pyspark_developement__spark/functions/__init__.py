"""Reusable column-expression helpers shared across plans/operators.

These are thin combinators over pyspark.sql.functions — everything
stays JVM-side / codegen-friendly. They encode the engine's
conventions (rounding discipline for oracle parity, null-safe ratios,
deterministic bucketing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: Column | str) -> Column:
    """Money aggregate convention: round to 2 dp."""
    return F.round(col, 2)


def rate(col: Column | str) -> Column:
    """Rate/average convention: round to 4 dp."""
    return F.round(col, 4)


def safe_div(num: Column, den: Column, ndigits: int = 4) -> Column:
    """NULL (not error / inf) when the denominator is 0 — matches the
    SQL CASE WHEN den > 0 convention used by the oracles."""
    return F.round(F.when(den != 0, num / den), ndigits)


def pct(num: Column, den: Column, ndigits: int = 4) -> Column:
    return F.round(num * 100.0 / den, ndigits)


def zscore(col: Column, mean: Column, std: Column, ndigits: int = 4) -> Column:
    return F.round(F.when(std != 0, (col - mean) / std), ndigits)


def disc_price() -> Column:
    """TPC-H style discounted price expression."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def bucket_by_thresholds(col: Column, thresholds: list[tuple[float, str]], default: str) -> Column:
    """First-match-wins CASE chain: [(upper_bound, label), ...]."""
    expr = None
    for bound, label in thresholds:
        cond = col <= bound
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(default)


def md5_bucket(col: Column, mod: int = 100) -> Column:
    """THE engine's deterministic hash-bucket assignment (the p03
    split contract): first 8 hex chars of md5(value-as-string) read as
    an integer, mod `mod`. Engine-portable — DuckDB renders the same
    md5 hex for the same string, so oracle twins mirror it as
    CAST(('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8)) AS BIGINT)
    % mod. This helper is the ONE definition; inline copies predating
    it (p03/p07/p20 in plans/queries.py) are pinned by their driver
    rows and must match it literally.
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % mod
    )
