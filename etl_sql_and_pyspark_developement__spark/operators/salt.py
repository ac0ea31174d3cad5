"""Skew mitigation: salted joins and two-phase (partial) aggregation.

AQE's skew-join handles moderate skew automatically; explicit salting
is the tool for *known* pathological keys (the null key, the megacity,
the viral item) where one partition would otherwise receive a large
fraction of 100 TB.

- salted_join: replicate the small side `salt` times, scatter the big
  side's hot keys across `salt` sub-partitions. Trades `salt`× small-
  side duplication for an even shuffle.
- two_phase_agg: groupBy(key, salt) → groupBy(key) — breaks a hot
  group's partial aggregation across executors. Only valid for
  decomposable aggregates (sum/count/min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The salt column is derived from a deterministic hash of the whole
    big-side row id space (monotonically varying values), so hot keys
    spread across `salt` partitions.

    Only inner/left/left_semi/left_anti are correct under replication:
    with how="right"/"full", an unmatched small-side row appears once
    PER SALT REPLICA (salt× duplicate null-extended rows), so those
    modes are rejected rather than silently wrong.
    """
    how_norm = how.replace("_", "").lower()
    allowed = {"inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti"}
    if how_norm not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would emit each unmatched small-side "
            f"row once per salt replica; use inner/left/left_semi/left_anti, "
            f"or salt the other side"
        )
    big_salted = big.withColumn(
        "__salt", (F.pmod(F.xxhash64(*big.columns), F.lit(salt))).cast("int")
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_rep, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation for decomposable aggregates.

    agg_exprs: {output_col: "sum(col)" | "count(*)" | "min(col)" |
    "max(col)"} — phase 1 computes per-(key, salt) partials, phase 2
    merges (sum→sum, count→sum, min→min, max→max).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    phase1_aggs = []
    phase2_aggs = []
    for out_name, expr in agg_exprs.items():
        fn_name = expr.split("(", 1)[0].strip().lower()
        if fn_name not in merge_fn:
            raise ValueError(
                f"{fn_name!r} is not decomposable; two_phase_agg supports "
                f"{sorted(merge_fn)}"
            )
        phase1_aggs.append(F.expr(expr).alias(f"__p_{out_name}"))
        phase2_aggs.append(merge_fn[fn_name](f"__p_{out_name}").alias(out_name))
    partial = salted.groupBy(*key_cols, "__salt").agg(*phase1_aggs)
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Key-distribution diagnostic — the pre-flight check that decides
    whether a join/agg on `key_col` needs salting, AQE skew handling,
    or is safe as-is. One row per profiled key column:

    - n_rows / n_keys:     totals
    - max_key_n, top_key:  heaviest key (ties: lexicographically
                           LARGEST key string — max-of-struct order,
                           deterministic and engine-portable)
    - top_ppm:             heaviest key's share of rows, integer ppm
    - avg_group_x1000:     mean group size ×1000 (integer div)
    - skew_ppm:            max/avg ratio in ppm — 1 000 000 means
                           perfectly uniform; a join that shuffles this
                           key sends max_key_n rows to ONE task, so
                           e.g. skew_ppm > 16 000 000 (16× mean) reads
                           "salt this key or broadcast the other side"

    All derived values are integer arithmetic (bit-exact vs any SQL
    engine). Two shuffles, both decomposable: groupBy(key) with
    map-side partials, then a single-row rollup.
    """
    per_key = df.groupBy(F.col(key_col).cast("string").alias("k")).agg(
        F.count("*").alias("n")
    )
    rolled = per_key.agg(
        F.sum("n").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max(F.struct(F.col("n"), F.col("k"))).alias("_top"),
    )
    return rolled.select(
        F.lit(key_col).alias("key_col"),
        "n_rows",
        "n_keys",
        F.col("_top.n").alias("max_key_n"),
        F.col("_top.k").alias("top_key"),
        F.expr("(1000000 * _top.n) div n_rows").alias("top_ppm"),
        F.expr("(1000 * n_rows) div n_keys").alias("avg_group_x1000"),
        F.expr("(1000000 * _top.n * n_keys) div n_rows").alias("skew_ppm"),
    )
