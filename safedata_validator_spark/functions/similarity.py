"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: dot products as pure
Spark expressions (zip_with + aggregate — JVM-side, no Python). The scale
path is random-hyperplane LSH: embeddings are bucketed by sign-bit signature
(vectorized pandas/Arrow UDF over numpy), queries probe their own bucket plus
hamming-1 neighbours, and only bucket-mates get exact scoring — turning the
all-pairs crossJoin into per-bucket joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window


def vec_norm(a: Column) -> Column:
    """L2 norm of an array<float/double> column (the cosine denominator
    factor) — exposed so pair-scoring joins can precompute it ONCE per
    vector instead of once per pair (a vector in k candidate pairs
    otherwise re-folds its own norm k times; the fold is interpreted
    higher-order code, so this is 2/3 of the per-pair work). Bit-identical
    to the norm the inline form computed: same fold, same order."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def dot_product(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns — built-ins only."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — built-ins only."""
    return dot_product(a, b) / (vec_norm(a) * vec_norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query → (query_id, vec_id, sim, rank).
    Queries are broadcast (few); the corpus streams. Ties break on vec_id so
    results are deterministic."""
    # norms precomputed per SIDE before the pair join: each corpus vector
    # otherwise re-folds its own norm once per query (and each query once
    # per corpus row) — the folds are interpreted higher-order code, so
    # this removes 2/3 of the per-pair expression work. The product
    # dot/(na*nb) is bit-identical (same folds, same order).
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        vec_norm(F.col(vec_col)).alias("__qn"),
    )
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__vec"),
        vec_norm(F.col(vec_col)).alias("__vn"),
    ).crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        "vec_id",
        (dot_product(F.col("__vec"), F.col("__qvec")) / (F.col("__vn") * F.col("__qn"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def nbits_for(n: int) -> int:
    """Scale-aware sign-LSH width: ≈log2(corpus) bits keeps expected bucket
    occupancy O(1), so in-bucket pairing stays linear as the corpus grows
    (a FIXED nbits makes every bucket — and its pair join — grow
    quadratically with N)."""
    import math

    return max(4, math.ceil(math.log2(max(n, 2))))


def n_centroids_for(n: int) -> int:
    """Scale-aware IVF list count: ≈√N centroids balances quantizer cost
    (N·C assignment work) against list length (N/C scored per probe) — the
    standard IVF sizing rule."""
    import math

    return max(1, round(math.sqrt(n)))


def _hyperplanes(dim: int, nbits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).astype(np.float64)


def add_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    nbits: int = 8,
    seed: int = 7,
    out_col: str = "bucket",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket id per vector — ONE vectorized
    pandas UDF over Arrow batches (a numpy matmul per batch, no per-row
    Python). Deterministic: hyperplanes are seeded. Pass ``dim`` when known —
    probing it via ``first()`` executes the upstream plan once extra."""
    if dim is None:
        dim = df.select(F.size(vec_col)).first()[0]
    planes = _hyperplanes(dim, nbits, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, nbits)
        weights = (1 << np.arange(nbits)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int32))

    return df.withColumn(out_col, bucket_of(F.col(vec_col)))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int | None = 8,
    seed: int = 7,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose LSH bucket is
    within ``probe_hamming`` bits of the query's bucket (multi-probe).
    → (query_id, vec_id, sim, rank). Recall rises with probe_hamming and
    falls with nbits; exactness is recovered at probe_hamming=nbits.
    ``nbits=None`` derives ≈log2(corpus) from a count (see ``nbits_for``);
    pass ``dim`` to avoid the first() schema probe."""
    if nbits is None:
        nbits = nbits_for(embeddings.count())
    corpus = add_lsh_bucket(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__vec")),
        "__vec", nbits, seed, dim=dim,
    )
    q = add_lsh_bucket(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")),
        "__qvec", nbits, seed, out_col="qbucket", dim=dim,
    )
    # expand each query to its probe buckets (bucket ids within hamming≤p)
    probes = [0] + ([1 << b for b in range(nbits)] if probe_hamming >= 1 else [])
    if probe_hamming >= 2:
        probes += [
            (1 << i) | (1 << j) for i in range(nbits) for j in range(i + 1, nbits)
        ]
    # per-side norm precompute — same rationale (and bit-identity) as
    # brute_force_topk; computed BEFORE the probe-ring explode so each
    # query folds its norm once, not once per probe bucket, and each
    # corpus vector once, not once per candidate pair
    corpus = corpus.withColumn("__vn", vec_norm(F.col("__vec")))
    q = q.withColumn("__qn", vec_norm(F.col("__qvec")))
    q_exp = q.select(
        "query_id",
        "__qvec",
        "__qn",
        "qbucket",
        F.explode(F.array(*[F.lit(p) for p in probes])).alias("__flip"),
    ).select(
        "query_id", "__qvec", "__qn",
        F.col("qbucket").bitwiseXOR(F.col("__flip")).alias("bucket"),
    )
    scored = corpus.join(F.broadcast(q_exp), "bucket").where(F.col("vec_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        "vec_id",
        (dot_product(F.col("__vec"), F.col("__qvec")) / (F.col("__vn") * F.col("__qn"))).alias("sim"),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """Vectorized assignment of unit-normalised vectors to their ``nprobe``
    nearest (cosine) centroids — one numpy matmul per Arrow batch."""
    cents = centroids  # (C, dim), rows unit-norm

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        sims = (m / norms) @ cents.T  # (batch, C)
        p = min(nprobe, sims.shape[1])
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p]  # unordered top-p
        order = np.take_along_axis(sims, top, axis=1).argsort(axis=1)[:, ::-1]
        ranked = np.take_along_axis(top, order, axis=1).astype(np.int32)
        return pd.Series([row.tolist() for row in ranked])

    return assign


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    lloyd_iters: int = 2,
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: seed centroids are the
    ``n_centroids`` vectors with the lowest ``xxhash64(id, seed)`` (a seeded
    pseudo-random sample needing no Date.now-style nondeterminism), refined
    with ``lloyd_iters`` k-means iterations. Each iteration is one fact pass:
    assignment via the vectorized UDF, centroid update via
    posexplode → groupBy(cluster, dim) — shuffle volume C × dim, tiny.
    Returns a (C, dim) unit-norm numpy array (driver-side: the quantizer is
    dimension-table-sized, like every other dim in this engine)."""
    seeded = embeddings.select(
        F.col(vec_col).alias("v"),
        F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("__h"),
    )
    rows = seeded.orderBy("__h").limit(n_centroids).collect()
    cents = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    vecs = embeddings.select(F.col(vec_col).alias("v"))
    for _ in range(lloyd_iters):
        assign = _assign_udf(cents, nprobe=1)
        assigned = vecs.select(F.element_at(assign(F.col("v")), 1).alias("cid"), "v")
        sums = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum(F.col("val").cast("double")).alias("s"))
            .collect()
        )
        new = cents.copy()  # empty clusters keep their previous centroid
        acc: dict[int, np.ndarray] = {}
        for r in sums:
            acc.setdefault(r["cid"], np.zeros(cents.shape[1]))[r["pos"]] = r["s"]
        for cid, v in acc.items():
            norm = np.linalg.norm(v)
            if norm > 0:
                new[cid] = v / norm
        cents = new
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int | None = 16,
    nprobe: int = 2,
    seed: int = 7,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k — the second scale path beside ``lsh_topk``:
    a coarse quantizer (k-means over cosine) partitions the corpus into
    inverted lists; each query scores only its ``nprobe`` nearest lists.
    → (query_id, vec_id, sim, rank). Recall rises with nprobe (exact at
    nprobe=n_centroids); expected cost per query is nprobe/C of the corpus.
    At cluster scale the corpus assignment is computed once and persisted as
    a bucketed/partitioned-by-cid table; queries then prune partitions.
    ``n_centroids=None`` derives ≈√corpus from a count (``n_centroids_for``)."""
    if n_centroids is None:
        n_centroids = n_centroids_for(embeddings.count())
    cents = train_ivf_centroids(embeddings, n_centroids, id_col, vec_col, seed, lloyd_iters)
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__vec")
    ).withColumn("cid", F.element_at(_assign_udf(cents, 1)(F.col("__vec")), 1))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    ).withColumn("cid", F.explode(_assign_udf(cents, nprobe)(F.col("__qvec"))))
    scored = corpus.join(F.broadcast(q), "cid").where(F.col("vec_id") != F.col("query_id"))
    scored = scored.select(
        "query_id", "vec_id", cosine(F.col("__vec"), F.col("__qvec")).alias("sim")
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    nbits: int | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: pairs sharing
    a bucket with cosine ≥ threshold → (id_a, id_b, sim). Near-identical
    vectors collide in every bit with high probability, so a single-bucket
    join finds them without the all-pairs product. ``nbits`` defaults to
    ≈log2(corpus) (``nbits_for``) so bucket occupancy — and the quadratic
    in-bucket pairing — stays O(1) per bucket as the corpus grows; pass it
    explicitly to pin recall, and ``dim`` to skip the first() schema probe."""
    if nbits is None:
        nbits = nbits_for(embeddings.count())
    b = add_lsh_bucket(
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "v", nbits, seed, dim=dim,
    )
    # per-side norm precompute (bit-identical; see brute_force_topk): a
    # vector in k same-bucket pairs folds its norm once, not k times
    b = b.withColumn("n", vec_norm(F.col("v")))
    lhs = b.alias("a")
    rhs = b.alias("b")
    cand = lhs.join(
        rhs,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (dot_product(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))).alias("sim"),
    )
    return cand.where(F.col("sim") >= threshold)
