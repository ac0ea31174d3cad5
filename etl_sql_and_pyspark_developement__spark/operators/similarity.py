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

    Norms are computed ONCE PER ROW on each side before the pair
    join, not per pair (r11 — the knn_graph/d08 lesson applied to
    the exact baseline: higher-order-function folds evaluate
    interpreted per element, and the per-pair form paid 3 of them —
    dot + both norms — where 1 suffices; |queries|·|corpus| pairs ×
    2×64 interpreted ops was most of s08's exact side). Same
    sequential fold per vector, same multiply order in the divisor —
    bit-identical cosine values.
    """
    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(vec_col).alias("__qn"),
    )
    # corpus side spread BEFORE the norm projection + pair scoring —
    # a single-row-group embeddings file otherwise scores every
    # |queries|·|corpus| pair on one core (r11; no-op at real scale)
    c = spread_small_scan(
        corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    ).select(
        "cand_id",
        "c_vec",
        _norm("c_vec").alias("__cn"),
    )
    pairs = c.join(F.broadcast(q), F.lit(True))
    if not include_self:
        pairs = pairs.filter(F.col("cand_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine",
        F.round(_dot("q_vec", "c_vec") / (F.col("__qn") * F.col("__cn")), 6),
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
    deterministic hyperplanes.

    Emitted as ONE parsed SQL expression: composing the n_bits × dim
    plane literals through py4j one Column op at a time costs ~1.5s of
    driver time per call (and this is called once per join side).
    repr() round-trips doubles exactly, so the literals — and thus the
    buckets the s02/d08 oracles mirror — are bit-identical.
    """
    planes = _planes(n_bits, dim)
    terms = []
    for b, row in enumerate(planes):
        arr = "array(" + ", ".join(f"{v!r}D" for v in row) + ")"
        proj = (
            f"aggregate(zip_with({vec_col}, {arr},"
            " (x, w) -> cast(x as double) * w), 0D, (acc, v) -> acc + v)"
        )
        terms.append(f"(case when {proj} > 0 then {1 << b} else 0 end)")
    return F.expr("cast(" + " + ".join(terms) + " as bigint)")


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
    # norms once per row, not per pair (r11 — see cosine_topk)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(vec_col).alias("__qn"),
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
    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    c = spread_small_scan(
        corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    ).select(
        "cand_id",
        "c_vec",
        _norm("c_vec").alias("__cn"),
        lsh_signature("c_vec", n_bits, dim).alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("cand_id") != F.col("query_id")
    )
    scored = pairs.withColumn(
        "cosine",
        F.round(_dot("q_vec", "c_vec") / (F.col("__qn") * F.col("__cn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "cand_id", "cosine")
    )


def adaptive_n_bits(n_rows: int, target_bucket: int = 8, floor_bits: int = 8) -> int:
    """Hyperplane count that keeps E[bucket size] ≈ target_bucket as
    the corpus grows: buckets ∝ 2^n_bits, so n_bits must grow with
    log2(n). At fixed n_bits the bucket join is quadratic — measured
    89× wall at 10× vectors with n_bits=8; with bits scaling, pair
    work stays ~n·(n_bits+1)·target_bucket. The recall trade: more
    bits lower per-pair collision probability, partially compensated
    by the probe count growing with n_bits — the same
    capacity-∝-corpus rule as d11's k = floor(sqrt(n)) clustering."""
    import math

    return max(floor_bits, math.ceil(math.log2(max(n_rows, 1) / target_bucket)))


def knn_graph(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int | None = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate k-NN GRAPH over the whole corpus: every vector's
    top-k cosine neighbors among vectors sharing an LSH bucket (own
    bucket plus every hamming-1 probe). The kNN graph is the backbone
    of semantic curation — SemDeDup clustering, density-based quality
    scoring, and graph-based diversity sampling all start from it.

    Unlike ann_lsh_topk (small query set, broadcast), BOTH sides here
    are the full corpus, so neither is broadcast: the probe side
    explodes (n_bits+1) rows per vector and the candidate join is a
    shuffle equi-join on the bucket id. Expected pair count is
    ~(n_bits+1)/2^n_bits of n² — at n_bits=8 that is ~3.5% of the
    cross product, and recall is tested vs the exact graph.

    Pairs are UNIQUE BY CONSTRUCTION — no dedup shuffle: a query's
    probe rows carry (n_bits+1) DISTINCT bucket values, and each
    corpus vector sits in exactly ONE bucket, so a (query, candidate)
    pair can match at most one probe row (it matches iff
    hamming(sig_q, sig_c) ≤ 1). Scoring happens AT the bucket join
    (both sides carry their vector), so the whole operator is two
    wide ops: the bucket join and the per-vector top-k window. The
    probe side replicates each vector (n_bits+1)× through the
    shuffle — the standard LSH trade (the minhash band path
    replicates 32×), cheaper than re-joining vectors onto id-only
    pairs twice. Real embedding distributions skew bucket sizes —
    AQE skew-join splits hot buckets; n_bits must grow with the
    corpus to keep E[bucket size] bounded (buckets ∝ 2^n_bits) —
    pass n_bits=None to size it automatically via adaptive_n_bits
    (one count job; stays 8 up to ~2k vectors, so small-corpus
    results are unchanged).

    EXACT-duplicate vectors defeat any bucketing: ten identical
    copies of every vector multiply same-bucket candidate pairs
    ~100× no matter how many bits — LSH can only split points that
    differ. Measured on 10×-duplicated sf0.1 embeddings: 153s raw vs
    9.2s after a d01-style exact-vector collapse (one representative
    per distinct vector). Run the dedup tier FIRST — the pipeline
    ordering SURVEY §2's dedup ladder documents.
    """
    if n_bits is None:
        n_bits = adaptive_n_bits(corpus.count())
    # norms computed ONCE per vector here, not per candidate pair —
    # per-pair work drops to one dot product + two scalar reads
    # localCheckpoint, not persist: both join sides read this frame,
    # but persist's columnar cache build costs more than the one-time
    # shuffle-block write (see dedup._materialize for measurements)
    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    base = spread_small_scan(
        corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    ).select(
        "vid",
        "vec",
        lsh_signature("vec", n_bits, dim).alias("bucket"),
        _norm("vec").alias("nrm"),
    ).localCheckpoint()
    probes = F.array(
        F.col("bucket"),
        *[F.expr(f"bucket ^ {1 << b}").cast("long") for b in range(n_bits)],
    )
    q = base.select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
        F.explode(probes).alias("bucket"),
    )
    c = base.select(
        F.col("vid").alias("cand_id"),
        F.col("vec").alias("c_vec"),
        F.col("nrm").alias("c_nrm"),
        F.col("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cosine",
            F.round(_dot("q_vec", "c_vec") / (F.col("q_nrm") * F.col("c_nrm")), 6),
        )
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "cand_id", "cosine")
    )


def _centroids_df(spark, centroids: list[list[float]]):
    """Tiny (k rows) DataFrame of centroid vectors — joined broadcast
    instead of inlined as literals, so plans stay small at any k.
    Built via the pandas/Arrow path: the row-list createDataFrame
    pays ~0.65s of Python->JVM conversion per call even warm, the
    Arrow batch ~0.1s (measured) — and kmeans builds this table once
    per Lloyd iteration."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "cluster": list(range(len(centroids))),
            "centroid": [[float(x) for x in c] for c in centroids],
        }
    )
    return spark.createDataFrame(pdf, "cluster int, centroid array<double>")


def _sq_l2(vec_col: str, cent_col: str) -> Column:
    return F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col(cent_col),
            lambda x, w: (x.cast("double") - w) * (x.cast("double") - w),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _nearest_centroid(vec_col: str, centroids: list[list[float]]):
    """Map-side argmin over squared L2 distance to each (literal)
    centroid, as array_sort over (distance, id) structs so every
    distance expression appears exactly ONCE in the plan. A chained
    when(closer, d).otherwise(best) fold would duplicate each distance
    subtree at every step — exponential expression growth that stalls
    Catalyst past ~10 centroids.
    """
    entries = []
    for i, c in enumerate(centroids):
        arr = "array(" + ", ".join(f"{v!r}D" for v in c) + ")"
        # power(..., 2), not x*x: mirrors the Column form's `** 2` so
        # the rewrite below is bit-identical (Math.pow vs multiply can
        # differ in the last ulp, which could flip argmin ties).
        d = (
            f"aggregate(zip_with({vec_col}, {arr},"
            " (x, w) -> power(cast(x as double) - w, 2)),"
            " 0D, (acc, v) -> acc + v)"
        )
        entries.append(f"named_struct('d', {d}, 'cluster', {i})")
    # One parsed expression (see lsh_signature): k × dim literals built
    # through py4j cost ~2s of driver time at k=16, dim=64.
    return F.expr(
        "cast(array_sort(array(" + ", ".join(entries) + "))[0].cluster as int)"
    )


MAX_INLINE_CENTROID_CELLS = 4096  # k*dim above this -> join formulation


def assign_clusters(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    formulation: str = "auto",
) -> DataFrame:
    """(id, vec, cluster) — two formulations, picked by k×dim (or
    forced via `formulation`: "inline" | "join"):

    - small quantizers: centroid literals inlined, argmin via
      array_sort-of-structs → a pure MAP-SIDE expression, zero shuffle
      of the corpus. Plan grows with k×dim, so capped. The right
      choice for the one-off FINAL assignment of a huge corpus.
    - large quantizers: broadcast join against a centroid table +
      min_by argmin → plan size independent of k, at the cost of a
      k× row expansion + groupBy shuffle. The right trade once the
      inline plan would stall Catalyst — and for REPEATED assignment
      (Lloyd training), where re-analyzing the k×dim literal tree
      every iteration costs more wall time than the small shuffle
      (measured ~2x on the training loop).
    """
    inline = (
        formulation == "inline"
        or (
            formulation == "auto"
            and len(centroids) * len(centroids[0]) <= MAX_INLINE_CENTROID_CELLS
        )
    )
    if inline:
        return corpus.select(
            F.col(id_col),
            F.col(vec_col),
            _nearest_centroid(vec_col, centroids).alias("cluster"),
        )
    spark = corpus.sparkSession
    cents = _centroids_df(spark, centroids)
    scored = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    ).join(F.broadcast(cents), F.lit(True))
    return (
        scored.withColumn("__dist", _sq_l2("__vec", "centroid"))
        .groupBy("__id")
        .agg(
            F.min_by("cluster", F.col("__dist")).alias("cluster"),
            F.first("__vec").alias("__vec"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__vec").alias(vec_col),
            "cluster",
        )
    )


def kmeans_lite_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 2,
    dim: int = 64,
    train_sample_mod: int | None = None,
    seed_vectors: list[list[float]] | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd's iterations for IVF coarse quantization.

    Seeds: the k vectors with the lowest ids (deterministic, no RNG).
    Each iteration: assign every vector to its nearest centroid
    (broadcast centroid table + min_by argmin), then average per
    cluster (one groupBy). The centroid list itself is tiny (k × dim
    floats) — collecting it to the driver is the standard IVF training
    pattern, NOT a data collect.

    At billions of vectors, pass `train_sample_mod=m` to train on the
    deterministic 1/m hash-sample of the corpus (standard IVF practice
    — quantizer quality needs a representative sample, not every row;
    only the final assignment must see the full corpus).
    """
    id_col = corpus.columns[0]
    if train_sample_mod and train_sample_mod > 1:
        corpus = corpus.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(train_sample_mod)) == 0
        )
    if seed_vectors is not None:
        # Caller-provided seeds (r12): a composed index (ann_ivf_pq)
        # already collects the lowest-id vectors for its PQ codebooks —
        # passing the same rows here merges two orderBy-limit collect
        # jobs into one. The caller owns the contract that these ARE
        # the k lowest-id vectors of the (possibly sampled) train
        # corpus, i.e. exactly what the collect below would return.
        centroids = [[float(x) for x in v] for v in seed_vectors[:k]]
    else:
        seeds = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
        centroids = [[float(x) for x in row[0]] for row in seeds]
    for _ in range(iterations):
        assigned = assign_clusters(
            corpus, centroids, id_col, vec_col, formulation="join"
        )
        sums = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_c = [row[:] for row in centroids]
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.cluster, [0.0] * dim)[r.pos] = r.s
            cnt[r.cluster] = max(cnt.get(r.cluster, 0), r.n)
        for c, vec in acc.items():
            new_c[c] = [x / cnt[c] for x in vec]
        centroids = new_c
    return centroids


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    train_iterations: int = 2,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    n_clusters inverted lists; each query scores only the n_probe
    nearest lists.

    Scale: training touches aggregates only; assignment and probe
    selection join a broadcast centroid table (plan size independent
    of k — works at k=4096 as at k=16); the probe join is an equi-join
    on cluster id, cutting scored candidates to ~n_probe/n_clusters of
    the corpus. Recall vs brute force is asserted in
    tests/test_similarity.py.
    """
    spark = corpus.sparkSession
    # a NULL vector can neither train the quantizer nor be probed —
    # drop such rows at the operator boundary (no-op on clean data)
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    # training scans the corpus once per Lloyd iteration and the final
    # assignment once more — materialize it across those passes
    # (localCheckpoint: cheaper than persist's columnar cache build,
    # see dedup._materialize); spread first so training/assignment map
    # work parallelizes off a single-row-group file (r11)
    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    corpus = spread_small_scan(corpus).localCheckpoint()
    centroids = kmeans_lite_centroids(
        corpus, vec_col, n_clusters, train_iterations, dim
    )
    if not centroids:
        # empty corpus (e.g. an empty ingest partition): no lists to
        # probe — return an empty, correctly-typed result instead of
        # training a quantizer on nothing
        return spark.createDataFrame(
            [], "query_id BIGINT, rnk INT, cand_id BIGINT, cosine DOUBLE"
        )
    c = assign_clusters(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        "cluster",
    )
    # each query probes its n_probe nearest centroids
    cents = _centroids_df(spark, centroids)
    q_scored = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).join(F.broadcast(cents), F.lit(True)).withColumn(
        "__dist", _sq_l2("q_vec", "centroid")
    )
    probe_w = Window.partitionBy("query_id").orderBy("__dist", "cluster")
    # norms once per row, not per probe pair (r11 — see cosine_topk)
    q = (
        q_scored.withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "q_vec", _norm("q_vec").alias("__qn"), "cluster")
    )
    pairs = c.withColumn("__cn", _norm("c_vec")).join(
        F.broadcast(q), "cluster"
    ).filter(F.col("cand_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine",
        F.round(_dot("q_vec", "c_vec") / (F.col("__qn") * F.col("__cn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "cand_id", "cosine")
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold) — the semantic-dedup step of a training-data pipeline.

    candidates=None runs the exact all-pairs verifier (broadcast
    nested loop; quadratic — the ground truth, fine to ~10^3
    vectors). At scale, pass an (id_a, id_b) candidate frame from the
    LSH (lsh_signature same-bucket pairs — deterministic, so even a
    SQL oracle can mirror it; see d08) or IVF (same-cluster pairs)
    machinery: the verification math is IDENTICAL, only the pair
    source changes — the same exact-vs-candidates duality as d02/d03
    for text.

    Per-pair cost is ONE dot product: vectors are L2-normalized once
    per row before the join (cos = dot(a/|a|, b/|b|)), not
    dot/(|a|·|b|) per pair — 3x less array math on the quadratic
    side of the plan.
    """

    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    emb = spread_small_scan(emb.select(id_col, vec_col))

    def normed(side_id: str, side_vec: str):
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        nrm = F.sqrt(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        return emb.select(
            F.col(id_col).alias(side_id), v.alias("__v"), nrm.alias("__n")
        ).select(
            side_id,
            F.transform(F.col("__v"), lambda x: x / F.col("__n")).alias(side_vec),
        )

    a = normed("id_a", "va")
    b = normed("id_b", "vb")
    if candidates is not None:
        pairs = candidates.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .select("id_a", "id_b", F.round(F.col("__cos"), 6).alias("cosine"))
    )


_ASSIGN_KERNEL_SCHEMA = "id bigint, cluster bigint, cent double, u array<double>"


def _assign_seeded_argmax_kernel(pts: DataFrame, seeds) -> DataFrame:
    """mapInArrow seeded-argmax assignment — (id, cluster, cent, u),
    bit-identical to the retired SQL form
    max(struct(round(dot(u, su), 6), -seed_id)) over a broadcast seed
    join (parity test in tests/test_similarity.py):

    - dot: the SQL form materializes zip_with products then left-folds
      from 0.0 — the kernel multiplies one dimension at a time into an
      accumulator (`acc += U[:, d] * S[:, d]` per d), the identical
      IEEE op sequence per (point, seed) element (numpy mul/add are
      plain IEEE doubles, no FMA);
    - round(· , 6): Spark rounds HALF_UP on BigDecimal(repr(double)).
      Fast path: sign·floor(|x|·1e6 + 0.5)/1e6, EXACT whenever the
      scaled fraction is farther than 1e-7 from .5 (double mul error
      ≤1e-10 at |x|≤~1, repr-vs-binary gap ≤1e-11); elements inside
      that window are recomputed with decimal.Decimal(repr(x)) —
      Python repr is shortest-roundtrip like the JVM's, and ONLY the
      boundary window can disagree between the two paths. -0.0 results
      normalize to +0.0 (BigDecimal has no signed zero);
    - argmax tie rule: seeds arrive sorted by seed_id ascending and
      np.argmax takes the FIRST maximum — exactly max(-seed_id);
    - u passes through, replacing the SQL form's join-back;
    - NULL semantics mirror the SQL form exactly (pinned by the
      parity test): a NULL vector, a vector containing a NULL
      element, or a length mismatch vs the seed dimension makes every
      per-seed cosine NULL in the SQL form, and max(struct) then
      resolves purely on -seed_id — so such rows emit
      (min seed_id over ALL seeds, NULL cent); a NULL seed vector can
      never win against any non-NULL cent and only participates in
      that all-NULL fallback; with NO seeds at all the SQL form's
      inner join produces an EMPTY frame, and so does the kernel.

    `seeds`: [(seed_id, [float, ...] | None), ...] sorted by seed_id.
    """
    import pyarrow as pa

    seed_list = [
        (int(s), None if vec is None else [float(x) for x in vec])
        for s, vec in seeds
    ]

    def kernel(batches):
        import numpy as np

        valid = [(s, vec) for s, vec in seed_list if vec is not None]
        dims = {len(vec) for _, vec in valid}
        if len(dims) > 1:
            raise ValueError(
                f"seeded-argmax kernel: seed dims differ ({dims})"
            )
        d = dims.pop() if dims else 0
        S = (
            np.asarray([vec for _, vec in valid], dtype=np.float64)
            if valid
            else np.zeros((0, d), dtype=np.float64)
        )
        sids = np.asarray([s for s, _ in valid], dtype=np.int64)
        min_all = min((s for s, _ in seed_list), default=None)
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")
        for batch in batches:
            n = len(batch)
            if n == 0 or min_all is None:
                # no seeds: the SQL form's inner join yields no rows
                continue
            ids_np = batch.column("id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            u = batch.column("u")
            if u.offset != 0:
                # a sliced ListArray's offsets index the UNsliced
                # values buffer; take() rebuilds it compacted with
                # row validity preserved
                u = u.take(pa.array(np.arange(n), pa.int64()))
            offs = np.asarray(u.offsets)
            lens = np.diff(offs)
            row_null = np.asarray(u.is_null())
            # rows whose vector contains a NULL element fold to NULL
            # in the SQL form — route them to the NULL path too
            if u.values.null_count:
                elem_ok = np.asarray(u.values.is_valid())
                cs = np.concatenate(([0], np.cumsum(~elem_ok)))
                has_null_elem = (cs[offs[1:]] - cs[offs[:-1]]) > 0
            else:
                has_null_elem = np.zeros(n, dtype=bool)
            ok = (~row_null) & (~has_null_elem) & (lens == d) & (len(valid) > 0)
            cluster = np.full(n, min_all, dtype=np.int64)
            cent_out = np.full(n, np.nan, dtype=np.float64)
            cent_null = ~ok
            if ok.any():
                flat = u.values.to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                idx = offs[:-1][ok][:, None] + np.arange(d)[None, :]
                U = flat[idx]
                m = U.shape[0]
                # left-fold dot, one dimension at a time (docstring)
                acc = np.zeros((m, S.shape[0]), dtype=np.float64)
                for dim in range(d):
                    acc += U[:, dim : dim + 1] * S[None, :, dim]
                # Spark-exact HALF_UP 6dp round: vectorized fast path
                # + exact Decimal recompute inside the .5-boundary
                # window
                scaled = np.abs(acc) * 1e6
                frac = scaled - np.floor(scaled)
                cent = np.sign(acc) * np.floor(scaled + 0.5) / 1e6
                risky = np.abs(frac - 0.5) < 1e-7
                if risky.any():
                    for r, c in np.argwhere(risky):
                        cent[r, c] = float(
                            Decimal(repr(float(acc[r, c]))).quantize(
                                q6, ROUND_HALF_UP
                            )
                        )
                cent[cent == 0.0] = 0.0  # no -0.0 (BigDecimal-parity)
                best = np.argmax(cent, axis=1)
                cluster[ok] = sids[best]
                cent_out[ok] = cent[np.arange(m), best]
            yield pa.RecordBatch.from_pydict(
                {
                    "id": pa.array(ids_np, pa.int64()),
                    "cluster": pa.array(cluster, pa.int64()),
                    "cent": pa.array(
                        cent_out, pa.float64(), mask=cent_null
                    ),
                    "u": u.cast(pa.list_(pa.float64())),
                }
            )

    return pts.select("id", "u").mapInArrow(kernel, _ASSIGN_KERNEL_SCHEMA)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    threshold: float = 0.95,
    top_compare: int = 200,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"), in a fully DETERMINISTIC seeded form the DuckDB
    oracle mirrors value-for-value:

    1. seeds — the k items with the smallest md5(id) (k defaults to
       floor(sqrt(n)), so k GROWS with the corpus: cluster populations
       stay ~sqrt(n) and in-cluster pair work is O(n^1.5), never
       O(n²/const) — the scale flaw of a fixed k);
    2. assignment — argmax cosine-to-seed (rounded 6dp, ties to the
       smaller seed id), computed as one partial-aggregable
       max(struct) against the broadcast seed set — no iterative Lloyd
       loop, no driver-side re-planning, no float-sum-order
       nondeterminism;
    3. pruning — within a cluster, DROP every item whose cosine to a
       MORE CENTRAL item (higher cosine-to-seed; ties to smaller id)
       among the cluster's `top_compare` most central items exceeds
       `threshold` — the keeper side is capped, bounding per-cluster
       pair work at top_compare x |cluster|.

    Returns (id_col, cluster, cent, dropped) for every corpus row;
    `cluster` is the seed's id.

    Scale: seeds are a top-k (TakeOrderedAndProject; k·dim ≈ 16 MB of
    doubles at n=10⁹, dim=64 — broadcastable); assignment shuffles n
    pre-combined rows (map-side max(struct)), not n×k; at extreme n
    the assignment scan can route through s02's LSH prefilter.
    Zero-norm vectors keep cosine 0 and are never dropped.
    """
    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    base = spread_small_scan(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )
    if k is None:
        import math

        k = max(1, math.isqrt(base.count()))
    v = F.transform(F.col("v"), lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    unit = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)
    pts = base.select("id", unit.alias("u"))
    # Seeds COLLECTED (k·dim doubles — the same tiny payload the old
    # broadcast shipped; at n=10⁹, k=√n this is ~16 MB, the standard
    # quantizer-training collect, NOT a data collect) and handed to
    # the mapInArrow assignment kernel (r12): the n×k argmax used to
    # ride an interpreted zip_with/aggregate fold per (point, seed)
    # PAIR plus a groupBy shuffle and a join back to re-attach u —
    # the kernel does the same left-fold dot vectorized per dimension
    # (bit-identical op order), Spark-exact 6dp HALF_UP rounding, and
    # first-max argmax over seed_id-ascending seeds (== the SQL
    # max(struct(cent, -seed_id)) tie rule), emitting (id, cluster,
    # cent, u) in ONE narrow map — no pair explosion, no shuffle, no
    # re-join. Bit-parity with the retired SQL form is asserted in
    # tests/test_similarity.py (incl. tie and .5-boundary cases).
    seed_rows = (
        pts.withColumn("__mk", F.md5(F.col("id").cast("string")))
        .orderBy("__mk", "id")
        .limit(k)
        .select(F.col("id").alias("seed_id"), F.col("u").alias("su"))
        .collect()
    )
    seeds = sorted(
        (
            int(r["seed_id"]),
            None if r["su"] is None else list(r["su"]),
        )
        for r in seed_rows
    )
    assigned = _assign_seeded_argmax_kernel(pts, seeds).localCheckpoint()
    w_rank = Window.partitionBy("cluster").orderBy(F.desc("cent"), F.asc("id"))
    ranked = assigned.withColumn("crank", F.row_number().over(w_rank))
    a = ranked.filter(F.col("crank") <= top_compare).select(
        F.col("id").alias("id_a"),
        F.col("cluster").alias("ca"),
        F.col("cent").alias("cent_a"),
        F.col("u").alias("va"),
    )
    b = ranked.select(
        F.col("id").alias("id_b"),
        F.col("cluster").alias("cb"),
        F.col("cent").alias("cent_b"),
        F.col("u").alias("vb"),
    )
    more_central = (F.col("cent_a") > F.col("cent_b")) | (
        (F.col("cent_a") == F.col("cent_b")) & (F.col("id_a") < F.col("id_b"))
    )
    cos_ab = F.round(
        F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    dropped = (
        a.join(b, (F.col("ca") == F.col("cb")) & more_central)
        .filter(cos_ab > threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    return assigned.join(dropped, "id", "left").select(
        F.col("id").alias(id_col),
        "cluster",
        "cent",
        F.coalesce("__dropped", F.lit(0)).alias("dropped"),
    )


def mmr_select(
    corpus: DataFrame,
    query_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    pool: int = 50,
    lambda_x1000: int = 700,
) -> DataFrame:
    """Maximal-Marginal-Relevance diverse top-k (Carbonell & Goldstein
    1998) — the data-selection step that picks items both RELEVANT to
    a query and DIVERSE from each other (dedup-aware retrieval /
    training-subset selection):

        MMR(d) = λ·cos(q, d) − (1−λ)·max_{s∈S} cos(d, s)

    Two-tier plan, the standard scale shape for greedy-sequential
    selection:
    1. DISTRIBUTED: exact cosine relevance of every corpus row to the
       query (one broadcast-scan pass, no shuffle), then top-`pool`
       candidates via ORDER BY relevance LIMIT pool (pool ≪ corpus).
    2. DRIVER: greedy MMR over the pool — the algorithm is inherently
       sequential in k, and the pool is O(pool·dim) floats by
       construction, so this is a top-k-sized collect, not a corpus
       collect.

    λ is passed in integer thousandths and all driver arithmetic uses
    the same float64 ops both sides would use, ties broken by id, so
    the selection is deterministic. query_id=None uses the smallest
    id in the corpus as the query vector (excluded from candidates).

    Returns (rank, id, relevance, mmr_score) with rank 1..k.
    """
    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    base = spread_small_scan(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )
    if query_id is None:
        # one combined 1-row job: the min id AND its vector (min_by),
        # instead of a min(id) job + a filter job + a broadcast build
        qid_row = base.agg(
            F.min("id").alias("qid"), F.min_by("v", "id").alias("qv")
        ).collect()[0]
        query_id, qraw = qid_row["qid"], qid_row["qv"]
    else:
        qrows = base.filter(F.col("id") == query_id).select("v").collect()
        qraw = qrows[0]["v"] if qrows else None
    if qraw is None:  # empty corpus, or query_id not present in it
        return corpus.sparkSession.createDataFrame(
            [], "rank INT, vec_id BIGINT, relevance DOUBLE, mmr_score DOUBLE"
        )
    # Normalize the query DRIVER-side with the same left-to-right
    # float64 ops the corpus-side F.aggregate fold uses (acc starts at
    # 0.0; one square, add, sqrt, divide per element — bit-identical
    # to the previous in-plan normalization), then inline it as a
    # LITERAL array: no broadcast join, no per-row query sub-plan —
    # the analysis/codegen of that join dominated this query's wall
    # time (pool-bounded data; measured 2.5x).
    import math

    qacc = 0.0
    for x in qraw:
        qacc = qacc + float(x) * float(x)
    qn = math.sqrt(qacc)
    if qn == 0.0:
        return corpus.sparkSession.createDataFrame(
            [], "rank INT, vec_id BIGINT, relevance DOUBLE, mmr_score DOUBLE"
        )
    qu = F.array(*[F.lit(float(x) / qn) for x in qraw])
    unit = F.transform(F.col("v"), lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("v"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    # Zero-norm guard: x/0 would make NaN relevance, and Spark sorts
    # NaN LARGEST under ORDER BY DESC — degenerate vectors would
    # hijack top pool slots and poison the driver greedy loop. Exclude
    # them (a zero query vector yields no result rather than NaNs).
    cands = (
        base.filter((F.col("id") != query_id) & (nrm > 0))
        .select("id", F.transform(unit, lambda x: x / nrm).alias("uv"))
        .withColumn(
            "relevance",
            F.aggregate(
                F.zip_with(F.col("uv"), qu, lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        )
        .orderBy(F.desc("relevance"), "id")
        .limit(pool)
        .select("id", "uv", "relevance")
    )
    rows = cands.collect()  # |pool| rows by construction — not a corpus collect
    lam = lambda_x1000 / 1000.0
    remaining = {r["id"]: (list(r["uv"]), float(r["relevance"])) for r in rows}
    selected: list[tuple[int, int, float, float]] = []
    sel_vecs: list[list[float]] = []
    while remaining and len(selected) < k:
        best = None
        for rid in sorted(remaining):
            uv, rel = remaining[rid]
            max_sim = max(
                (sum(a * b for a, b in zip(uv, sv)) for sv in sel_vecs),
                default=0.0,
            )
            score = lam * rel - (1.0 - lam) * max_sim
            if best is None or score > best[1]:
                best = (rid, score, rel)
        rid, score, rel = best
        sel_vecs.append(remaining.pop(rid)[0])
        selected.append((len(selected) + 1, rid, rel, score))
    # Emit the k result rows as a literal inline-table plan instead of
    # createDataFrame: the Python->JVM row-conversion path costs
    # ~0.7s per call even warm (measured), pure-literal plans ~0.1s —
    # and k rows of 4 scalars are trivially literal-able.
    spark = corpus.sparkSession
    if not selected:
        return spark.createDataFrame(
            [], "rank INT, vec_id BIGINT, relevance DOUBLE, mmr_score DOUBLE"
        )
    return spark.range(1).select(
        F.inline(
            F.array(*[
                F.struct(
                    F.lit(rank).cast("int").alias("rank"),
                    F.lit(rid).cast("bigint").alias("vec_id"),
                    F.lit(round(rel, 6)).cast("double").alias("relevance"),
                    F.lit(round(score, 6)).cast("double").alias("mmr_score"),
                )
                for rank, rid, rel, score in selected
            ])
        )
    )


def embedding_neardup_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Precomputed artifact for screening ARRIVING embeddings against a
    static reference corpus: (c_id, L2-unit vector, LSH bucket),
    materialized once (localCheckpoint) and reused across every
    screened batch/micro-batch — the embedding twin of
    dedup.corpus_neardup_index's never-rescan contract. Signatures are
    scale-invariant, so hashing the raw vector and storing the unit
    vector is consistent."""
    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    sig = lsh_signature(vec_col, n_bits, dim)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return spread_small_scan(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("c_id"),
        F.when(nrm > 0, F.transform(v, lambda x: x / nrm))
        .otherwise(v)
        .alias("c_unit"),
        sig.alias("bucket"),
    ).localCheckpoint()


def embedding_neardup_screen(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_bits: int = 8,
    dim: int = 64,
    cache_handles: list | None = None,
) -> DataFrame:
    """Drop every batch embedding with a cosine >= threshold match in
    the indexed corpus (ids differing); returns surviving batch rows
    unchanged — the semantic-ingest gate of a continuous multimodal /
    embedding crawl.

    The BATCH side (small) carries the multi-probe expansion (own
    bucket + hamming-1) and is broadcast onto the corpus index, so the
    probe join never shuffles the corpus; per-pair cost is ONE dot
    product on pre-normalized vectors. Per-batch cost ∝ batch size,
    never the corpus — the same sustainability contract as
    dedup.neardup_screen, lifted to embeddings. Long-running callers
    (st12's per-micro-batch loop) MUST pass `cache_handles` and
    unpersist them after the sink write.
    """
    sig = lsh_signature(vec_col, n_bits, dim)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    b = batch.select(
        F.col(id_col).alias("b_id"),
        F.when(nrm > 0, F.transform(v, lambda x: x / nrm))
        .otherwise(v)
        .alias("b_unit"),
        sig.alias("bucket"),
    ).persist()
    if cache_handles is not None:
        cache_handles.append(b)
    probes = F.array(
        F.col("bucket"),
        *[F.expr(f"bucket ^ {1 << i}").cast("long") for i in range(n_bits)],
    )
    probed = b.select("b_id", "b_unit", F.explode(probes).alias("bucket"))
    cos = F.aggregate(
        F.zip_with(F.col("b_unit"), F.col("c_unit"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dup_ids = (
        index.join(F.broadcast(probed), "bucket")
        .filter(F.col("b_id") != F.col("c_id"))
        .filter(cos >= threshold)
        .select("b_id")
        .distinct()
    )
    return batch.join(
        dup_ids.withColumnRenamed("b_id", id_col), id_col, "left_anti"
    )


def density_prune(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    k: int = 5,
    n_bits: int | None = 8,
    dim: int = 64,
    keep_num: int = 1,
    keep_den: int = 2,
    graph: DataFrame | None = None,
) -> DataFrame:
    """D4-style density-based diversification (Tirumala et al. 2023):
    score every vector by the total cosine similarity to its k nearest
    neighbors in the approximate kNN graph (dense region = redundant,
    prototypical content), then per group keep the LEAST dense
    keep_num/keep_den fraction — pruning the over-represented modes a
    near-dup pass (d08/d11) leaves behind.

    Emits the full per-vector artifact (density_ppm, dens_rank, kept),
    not just the kept set, so downstream mixing can reweight rather
    than drop.

    Determinism/oracle: per-neighbor cosines are the kNN graph's
    6dp-rounded doubles, converted to integer micro-units BEFORE the
    sum — density_ppm is a BIGINT sum, reduction-order-independent,
    so the DuckDB oracle matches bit-exactly. Vectors with fewer than
    k graph neighbors (sparse buckets) sum what they have; isolated
    vectors get density 0 — absent similarity counts as dissimilar.

    Scale: knn_graph's two wide ops (bucket join + per-vector top-k)
    dominate; on top of that, one groupBy on the graph (high-
    cardinality query_id), a broadcast of |groups| counts, and the
    per-group rank via quantiles.grouped_prefix_stats — no serial
    per-group window even when one label holds most of the corpus.
    keep threshold is integer arithmetic (rank*den <= n*num), exact
    at any size.

    Pass ``graph`` (query_id, rnk, cand_id, cosine — knn_graph's
    schema) to score against a PRE-BUILT graph artifact instead of
    constructing it inline: the production pipeline builds the graph
    once per corpus snapshot (sources/io.knn_graph_artifact) and every
    consumer reads the materialization.
    """
    from etl_sql_and_pyspark_developement__spark.operators.quantiles import (
        grouped_prefix_stats,
    )

    g = graph if graph is not None else knn_graph(
        corpus, id_col=id_col, vec_col=vec_col, k=k, n_bits=n_bits, dim=dim
    )
    density = g.groupBy(F.col("query_id").alias("__vid")).agg(
        F.sum(F.round(F.col("cosine") * 1000000).cast("bigint")).alias(
            "density_ppm"
        )
    )
    base = corpus.select(
        F.col(id_col).alias("__vid"), F.col(group_col).alias("grp")
    ).join(density, "__vid", "left").select(
        "__vid", "grp", F.coalesce("density_ppm", F.lit(0)).alias("density_ppm")
    )
    ranked = grouped_prefix_stats(
        base.withColumn("__one", F.lit(1)),
        group_col="grp",
        sum_col="__one",
        priority_cols=["density_ppm"],
        tiebreak_col="__vid",
        rank_out="dens_rank",
        cum_out="__cum",
        descending=False,
    )
    counts = base.groupBy("grp").agg(F.count("*").alias("__n"))
    return (
        ranked.join(F.broadcast(counts), "grp")
        .select(
            F.col("__vid").alias(id_col),
            F.col("grp").alias(group_col),
            "density_ppm",
            F.col("dens_rank").cast("int").alias("dens_rank"),
            (F.col("dens_rank") * keep_den <= F.col("__n") * keep_num).alias(
                "kept"
            ),
        )
    )


def _pq_code_expr(
    vec_col: str, codebook: list[list[float]], offset: int, sub_dim: int
) -> Column:
    """Argmin code over one subspace's codebook: squared-L2 between
    slice(vec, offset+1, sub_dim) and each (literal) codebook entry,
    via array_sort-of-structs so every distance subtree appears once
    (same construction and Math.pow discipline as _nearest_centroid,
    which the s03 oracle already mirrors bit-exactly)."""
    sub = f"slice({vec_col}, {offset + 1}, {sub_dim})"
    entries = []
    for i, c in enumerate(codebook):
        arr = "array(" + ", ".join(f"{v!r}D" for v in c) + ")"
        d = (
            f"aggregate(zip_with({sub}, {arr},"
            " (x, w) -> power(cast(x as double) - w, 2)),"
            " 0D, (acc, v) -> acc + v)"
        )
        entries.append(f"named_struct('d', {d}, 'code', {i})")
    return F.expr(
        "cast(array_sort(array(" + ", ".join(entries) + "))[0].code as int)"
    )


def ann_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m_sub: int = 4,
    k_codes: int = 8,
    dim: int = 64,
    refine_n: int = 20,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): split each vector
    into `m_sub` subspaces, quantize each against a per-subspace
    codebook of `k_codes` entries, and answer queries in two stages —
    an ADC (asymmetric distance computation) scan that sums per-
    subspace query→codeword distances over the CODES, then an exact
    cosine re-rank of the top `refine_n` ADC candidates.

    Completes the ANN toolbox (brute s01 → LSH s02 → IVF s03 → kNN
    graph s05): PQ is the MEMORY story — the scan touches m_sub small
    ints per vector (m_sub·log2(k_codes) bits, here 4 codes ≈ 12 bits
    vs 256 bytes of floats), which is what keeps 10⁹-vector indexes
    in RAM; only the refine stage re-reads refine_n real vectors per
    query.

    Deterministic end-to-end (lowest-id codebook seeds, argmin ties to
    the lower code, fixed-order ADC sum d0+d1+…), so the DuckDB oracle
    mirrors codebooks, codes, ADC, and refine value-for-value.

    Scale: codebooks are k_codes×dim floats collected once (a
    constant, not data); encoding is one map-side pass (m_sub argmin
    expressions, zero shuffle); the ADC scan is broadcast-queries ×
    codes with no shuffle; refine joins refine_n·|queries| ids back
    against the corpus — the only wide op is the final per-query
    top-k window over refine_n rows.
    """
    spark = corpus.sparkSession
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    sub_dim = dim // m_sub
    seed_rows = corpus.orderBy(id_col).limit(k_codes).select(vec_col).collect()
    if not seed_rows:
        return spark.createDataFrame(
            [],
            f"query_id long, rnk int, cand_id long, "
            f"adc_dist double, cosine double",
        )
    seeds = [[float(x) for x in r[0]] for r in seed_rows]
    codebooks = [
        [s[m * sub_dim : (m + 1) * sub_dim] for s in seeds]
        for m in range(m_sub)
    ]
    code_cols = [
        _pq_code_expr(vec_col, codebooks[m], m * sub_dim, sub_dim).alias(
            f"code_{m}"
        )
        for m in range(m_sub)
    ]
    # encoded frame feeds the ADC scan; the refine stage re-reads real
    # vectors from the corpus — materialize the (tiny-per-row) codes
    enc = corpus.select(
        F.col(id_col).alias("cand_id"), *code_cols
    ).localCheckpoint()

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # ADC: per subspace, distance from the query's subvector to the
    # codeword the candidate stored — element_at over the literal
    # codebook, summed in FIXED order (d0 + d1 + ...)
    def sub_d(m: int) -> Column:
        cb = (
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{v!r}D" for v in c) + ")"
                for c in codebooks[m]
            )
            + ")"
        )
        return F.expr(
            f"aggregate(zip_with(slice(q_vec, {m * sub_dim + 1}, {sub_dim}),"
            f" element_at({cb}, code_{m} + 1),"
            " (x, w) -> power(cast(x as double) - w, 2)),"
            " 0D, (acc, v) -> acc + v)"
        )

    adc_dist = sub_d(0)
    for m in range(1, m_sub):
        adc_dist = adc_dist + sub_d(m)
    scored = (
        F.broadcast(q)
        .join(enc, F.col("query_id") != F.col("cand_id"))
        .withColumn("adc_dist", F.round(adc_dist, 6))
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    shortlist = (
        scored.withColumn("__pr", F.row_number().over(w_adc))
        .filter(F.col("__pr") <= refine_n)
        .select("query_id", "q_vec", "cand_id", "adc_dist")
    )
    # exact refine: true cosine on the shortlisted real vectors
    cand_vecs = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(vec_col).alias("c_nrm"),
    )
    refined = shortlist.join(cand_vecs, "cand_id").withColumn(
        "cosine",
        F.round(
            _dot("q_vec", "c_vec") / (_norm("q_vec") * F.col("c_nrm")),
            6,
        ),
    )
    w_fin = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("cand_id")
    )
    return (
        refined.withColumn("rnk", F.row_number().over(w_fin))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "cand_id", "adc_dist", "cosine")
    )


def collapse_exact_vectors(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """The d01-for-vectors tier that MUST precede graph construction
    on duplicate-heavy corpora: collapse exact-duplicate vectors to
    one representative each (lowest id, deterministic), returning
    (representatives, membership).

    `representatives` has the corpus schema restricted to (id, vec)
    plus `multiplicity`; `membership` maps every original id to its
    representative — join any representative-level result (kNN edges,
    cluster labels, densities) back out to the full corpus with one
    equi-join.

    Why it exists: LSH bucketing can only split points that DIFFER —
    ten identical copies of every vector multiply same-bucket
    candidate pairs ~100× regardless of bit count (measured: 153s vs
    9.2s for knn_graph on 10×-duplicated sf0.1 embeddings). Exact
    collapse is one hash groupBy; the md5-of-bytes key avoids
    shuffling raw vectors twice.

    Scale: one (hash)-keyed shuffle over the corpus; representatives
    carry their vector, membership carries only ids.
    """
    hashed = corpus.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__vec"),
        F.md5(F.to_json(F.col(vec_col))).alias("__h"),
    )
    w = Window.partitionBy("__h").orderBy("__vid")
    tagged = hashed.select(
        "__vid",
        "__vec",
        "__h",
        F.min("__vid").over(w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("__rep"),
    ).localCheckpoint()
    reps = (
        tagged.filter(F.col("__vid") == F.col("__rep"))
        .join(
            tagged.groupBy("__rep").agg(
                F.count(F.lit(1)).alias("multiplicity")
            ),
            "__rep",
        )
        .select(
            F.col("__vid").alias(id_col),
            F.col("__vec").alias(vec_col),
            "multiplicity",
        )
    )
    membership = tagged.select(
        F.col("__vid").alias(id_col), F.col("__rep").alias("rep_id")
    )
    return reps, membership


def ann_ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    train_iterations: int = 1,
    m_sub: int = 4,
    k_codes: int = 8,
    refine_n: int = 20,
) -> DataFrame:
    """IVF-PQ composed ANN — the production billion-vector index
    shape (FAISS's IVFPQ): the IVF coarse quantizer (s03) prunes the
    SEARCH SPACE to n_probe inverted lists per query, and inside the
    probed lists the PQ codes (s06) prune the MEMORY — the ADC scan
    touches m_sub small ints per candidate instead of dim floats,
    with an exact cosine re-rank of the top refine_n. Neither stage
    alone carries a 10⁹-vector index: IVF with full vectors still
    reads dim floats per probed candidate; PQ alone still scans every
    code. Composed, the scan cost is (n_probe/n_clusters) of the
    corpus at m_sub bytes each.

    Deterministic end to end by composition of the two verified
    stages (lowest-id seeds for both quantizers, argmin ties to the
    lower id/code, fixed-order ADC sum), so the DuckDB oracle chains
    the s03 and s06 mirrors value-for-value.

    Scale: centroids and codebooks are tiny collected constants;
    cluster assignment + PQ encoding are ONE map-side pass over the
    corpus; the probe join is a broadcast equi-join on cluster id;
    refine re-reads refine_n real vectors per query.
    """
    from etl_sql_and_pyspark_developement__spark.operators.spread import (
        spread_small_scan,
    )

    spark = corpus.sparkSession
    # r12 (VERDICT item 5): project to the two consumed columns, SPREAD
    # before materializing (the corpus feeds the heavy inline argmin +
    # PQ-code map pass — off a single-row-group file it ran on one
    # core; no-op at real scale, the s03 fix applied here), and collect
    # the k-means seeds and PQ codebook seeds in ONE job (both are "the
    # lowest-id vectors", k_codes ≤ n_clusters here and the slice is
    # free) instead of two separate orderBy-limit collects.
    corpus = spread_small_scan(
        corpus.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col)
    ).localCheckpoint()
    n_seed = max(k_codes, n_clusters)
    seed_rows = (
        corpus.orderBy(id_col).limit(n_seed).select(vec_col).collect()
    )
    all_seeds = [[float(x) for x in r[0]] for r in seed_rows]
    centroids = kmeans_lite_centroids(
        corpus,
        vec_col,
        n_clusters,
        train_iterations,
        dim,
        seed_vectors=all_seeds[:n_clusters],
    )
    empty_schema = (
        "query_id BIGINT, rnk INT, cand_id BIGINT,"
        " adc_dist DOUBLE, cosine DOUBLE"
    )
    if not centroids:
        return spark.createDataFrame([], empty_schema)
    sub_dim = dim // m_sub
    seeds = all_seeds[:k_codes]
    codebooks = [
        [s[m * sub_dim : (m + 1) * sub_dim] for s in seeds]
        for m in range(m_sub)
    ]
    code_cols = [
        _pq_code_expr(vec_col, codebooks[m], m * sub_dim, sub_dim).alias(
            f"code_{m}"
        )
        for m in range(m_sub)
    ]
    # ONE map-side pass: coarse cluster id + the m_sub PQ codes.
    # NOT localCheckpointed (r12): the encoded frame has exactly one
    # consumer (the probe join) — the old LC paid an eager job + a
    # materialization for nothing (A/B below in the lane's record).
    enc = assign_clusters(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("cand_id"), "cluster", *code_cols
    )
    cents = _centroids_df(spark, centroids)
    q_scored = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        .join(F.broadcast(cents), F.lit(True))
        .withColumn("__dist", _sq_l2("q_vec", "centroid"))
    )
    probe_w = Window.partitionBy("query_id").orderBy("__dist", "cluster")
    q = (
        q_scored.withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", "q_vec", "cluster")
    )
    pairs = enc.join(F.broadcast(q), "cluster").filter(
        F.col("cand_id") != F.col("query_id")
    )

    def sub_d(m: int) -> Column:
        cb = (
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{v!r}D" for v in c) + ")"
                for c in codebooks[m]
            )
            + ")"
        )
        return F.expr(
            f"aggregate(zip_with(slice(q_vec, {m * sub_dim + 1}, {sub_dim}),"
            f" element_at({cb}, code_{m} + 1),"
            " (x, w) -> power(cast(x as double) - w, 2)),"
            " 0D, (acc, v) -> acc + v)"
        )

    adc_dist = sub_d(0)
    for m in range(1, m_sub):
        adc_dist = adc_dist + sub_d(m)
    scored = pairs.withColumn("adc_dist", F.round(adc_dist, 6))
    w_adc = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    shortlist = (
        scored.withColumn("__pr", F.row_number().over(w_adc))
        .filter(F.col("__pr") <= refine_n)
        .select("query_id", "q_vec", "cand_id", "adc_dist")
    )
    cand_vecs = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(vec_col).alias("c_nrm"),
    )
    refined = shortlist.join(cand_vecs, "cand_id").withColumn(
        "cosine",
        F.round(
            _dot("q_vec", "c_vec") / (_norm("q_vec") * F.col("c_nrm")), 6
        ),
    )
    w_fin = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("cand_id")
    )
    return (
        refined.withColumn("rnk", F.row_number().over(w_fin))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "cand_id", "adc_dist", "cosine")
    )


ARROW_FEATURES_SCHEMA = (
    "vec_id bigint, n_dims int, sum_micro bigint, sumsq_micro bigint"
)


def vector_features_arrow(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """mapInArrow vector-feature kernel — the Arrow-NATIVE Python
    boundary (RecordBatch in / RecordBatch out, no pandas
    conversion), the third and lowest-overhead rung of the Python
    ladder the engine documents (row UDF ≪ Pandas UDF < mapInArrow):
    where the m-lane kernels accept pandas for ergonomic byte
    wrangling, a numeric kernel over fixed-width vectors wants the
    columnar buffers directly.

    Per vector: n_dims, and the INTEGER micro-unit moments
    sum(floor(x_f64 * 1e6)) and sum(floor(x_f64 * 1e6)^2) — the
    quantizer pre-pass (scale calibration for int8 vector
    compression) computed exactly: float32 widens to float64
    losslessly, floor lands on integers, and integer sums are
    order-independent, so a DuckDB list_transform/list_sum oracle
    replays every value bit-for-bit (no float-summation tolerance
    anywhere).

    Execution: values buffer flattened once per batch, two
    vectorized numpy passes, per-list sums via add.reduceat on the
    list offsets — zero Python per-element work. Narrow map, no
    shuffle; at 100 TB this is scan-bound and embarrassingly
    parallel.
    """
    import pyarrow as pa

    def kernel(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column(id_col)
            vecs = batch.column(vec_col)
            if len(batch) == 0:
                continue
            # a sliced ListArray's offsets index the UNsliced values
            # buffer; rebuild compacted if a slice ever reaches us
            if vecs.offset != 0:
                vecs = pa.ListArray.from_arrays(
                    pa.array(
                        np.asarray(vecs.offsets) - vecs.offsets[0].as_py()
                    ),
                    vecs.flatten(),
                )
            # NULL list slots / NULL elements have no integer-exact
            # meaning here (a null list would silently become an
            # (n_dims=0, 0, 0) row, a null element a NaN whose
            # floor().astype(int64) is undefined garbage that can slip
            # past the overflow guard) — fail loudly instead of
            # emitting wrong values.
            if vecs.null_count or vecs.values.null_count:
                raise ValueError(
                    "vector_features_arrow: NULL embeddings / NULL "
                    "vector elements are not supported; filter or "
                    "impute them before the kernel"
                )
            flat = vecs.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            micro = np.floor(flat * 1_000_000.0).astype(np.int64)
            offsets = np.asarray(vecs.offsets)
            n_dims = np.diff(offsets).astype(np.int32)
            # Segment sums as prefix-sum differences: exact for ANY
            # offsets pattern (empty lists anywhere, including the
            # batch tail) — np.add.reduceat mishandles both a trailing
            # offset == len(arr) and repeated offsets. Overflow guard,
            # in two tiers BEFORE any int64 squaring (squaring first
            # can wrap and make the check pass on garbage):
            # 1. per-element: |micro| must square inside int64;
            # 2. whole-batch: the cumsum-of-squares peak is the plain
            #    sum of squares (all terms >= 0), measured exactly
            #    enough via a float64 dot (rel. error ~1e-16 against a
            #    2x headroom limit of 2^62) — a worst-case
            #    size*max^2 bound would spuriously reject legitimate
            #    high-dim unit-NORM batches whose true sum is ~1e12
            #    per vector, not per element.
            m = int(np.abs(micro).max()) if micro.size else 0
            mf = micro.astype(np.float64)
            if m > 3_000_000_000 or (
                micro.size and float(np.dot(mf, mf)) >= float(1 << 62)
            ):
                raise OverflowError(
                    "vector_features_arrow: squared micro-units would "
                    "approach int64 range; rescale the vectors or "
                    "reduce the Arrow batch size"
                )
            sq = micro * micro
            cs = np.concatenate(([0], np.cumsum(micro)))
            cs2 = np.concatenate(([0], np.cumsum(sq)))
            sum_micro = cs[offsets[1:]] - cs[offsets[:-1]]
            sumsq_micro = cs2[offsets[1:]] - cs2[offsets[:-1]]
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": ids.cast(pa.int64()),
                    "n_dims": pa.array(n_dims, pa.int32()),
                    "sum_micro": pa.array(sum_micro, pa.int64()),
                    "sumsq_micro": pa.array(sumsq_micro, pa.int64()),
                }
            )

    # NOT spread (r11 A/B: 0.51s -> 0.91s with the widening exchange —
    # the vectorized Arrow kernel clears a small corpus faster
    # single-task than the exchange round-trip, the m-lane finding)
    return df.select(id_col, vec_col).mapInArrow(
        kernel, ARROW_FEATURES_SCHEMA
    )
