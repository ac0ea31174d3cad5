"""Sampling operators for training-data pipelines: stratified
sampling, deterministic per-group caps (hot-group downsampling), and
seeded train/test splits.

Scale notes: sampleBy/randomSplit are map-side filters (no shuffle);
the per-group cap is one window shuffle on the group key — the same
cost as any per-group operation, used to stop a few giant groups
(one language, one domain) from dominating a 100 TB training mix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (deterministic under a fixed
    seed and input partitioning)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def per_group_cap(
    df: DataFrame, group_col: str, order_col: str, cap: int
) -> DataFrame:
    """Keep at most `cap` rows per group, chosen deterministically by
    `order_col` — reproducible downsampling of over-represented groups
    (unlike random sampling, re-runs and engines agree exactly)."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def train_test_split(
    df: DataFrame, id_col: str, test_fraction_pct: int = 10, buckets: int = 100
) -> tuple[DataFrame, DataFrame]:
    """Deterministic hash split: rows whose id hashes into the first
    `test_fraction_pct` of `buckets` go to test. Stable across runs,
    engines, and re-partitioning — the property random splits lack."""
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets))
    test = df.filter(bucket < test_fraction_pct)
    train = df.filter(bucket >= test_fraction_pct)
    return train, test
