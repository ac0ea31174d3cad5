"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. Query set broadcasts;
  one pass over the corpus; per-query top-k via window. Exact and
  oracle-able, O(|queries| * |corpus|).
- LSH-bucketed ANN: the scale path. Random-hyperplane signatures from
  a deterministic plane matrix; bucket equi-join shrinks candidates
  to ~corpus/2^bits per query before exact scoring.

All vector math is built-in higher-order functions (zip_with +
aggregate) in DOUBLE — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"0D, (acc, v) -> acc + v)"
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Scale: F.broadcast on the query side → a broadcast nested-loop
    that streams the corpus exactly once, no shuffle of the corpus;
    the window partitions by query (small) for the top-k.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    )
    pairs = c.join(F.broadcast(q), F.lit(True))
    if not include_self:
        pairs = pairs.filter(F.col("cand_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine",
        F.round(_dot("q_vec", "c_vec") / (_norm("q_vec") * _norm("c_vec")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "cand_id", "cosine")
    )


def _planes(n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes via a fixed LCG —
    reproducible across runs/sessions without any RNG state."""
    planes = []
    state = 0x2545F4914F6CDD1D
    for _ in range(n_bits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1.0 if (state >> 32) & 1 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(vec_col: str, n_bits: int, dim: int) -> Column:
    """Integer bucket id: sign bits of the vector against n_bits
    deterministic hyperplanes."""
    planes = _planes(n_bits, dim)
    sig = None
    for b, row in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in row])
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col), plane, lambda x, w: x.cast("double") * w
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, 1 << b).otherwise(0)
        sig = bit if sig is None else sig + bit
    return sig.cast("long")


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 4,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket, then exact
    cosine within the bucket.

    Multi-probe: the query side also probes every hamming-1 bucket
    (n_bits+1 probe rows per query — queries are the small side, so
    this is free), the standard recall lift that keeps the corpus-side
    join a pure equi-join on the bucket id.

    Scale: signature is a map-side expression; the bucket equi-join
    replaces the full cross product with ~(n_bits+1)/2^n_bits of it.
    Recall is tested against cosine_topk in tests/test_similarity.py.
    """
    sig = lsh_signature(vec_col, n_bits, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sig.alias("bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.expr(f"bucket ^ {1 << b}").cast("long")
                for b in range(n_bits)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        sig.alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("cand_id") != F.col("query_id")
    )
    scored = pairs.withColumn(
        "cosine",
        F.round(_dot("q_vec", "c_vec") / (_norm("q_vec") * _norm("c_vec")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "cand_id", "cosine")
    )
