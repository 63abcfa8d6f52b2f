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


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — built-ins only."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


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
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__vec")
    ).crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    scored = scored.select(
        "query_id", "vec_id", cosine(F.col("__vec"), F.col("__qvec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).astype(np.float64)


def add_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    nbits: int = 8,
    seed: int = 7,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket id per vector — ONE vectorized
    pandas UDF over Arrow batches (a numpy matmul per batch, no per-row
    Python). Deterministic: hyperplanes are seeded."""
    first = df.select(F.size(vec_col)).first()
    dim = first[0]
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
    nbits: int = 8,
    seed: int = 7,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose LSH bucket is
    within ``probe_hamming`` bits of the query's bucket (multi-probe).
    → (query_id, vec_id, sim, rank). Recall rises with probe_hamming and
    falls with nbits; exactness is recovered at probe_hamming=nbits."""
    corpus = add_lsh_bucket(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__vec")),
        "__vec", nbits, seed,
    )
    q = add_lsh_bucket(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")),
        "__qvec", nbits, seed, out_col="qbucket",
    )
    # expand each query to its probe buckets (bucket ids within hamming≤p)
    probes = [0] + ([1 << b for b in range(nbits)] if probe_hamming >= 1 else [])
    if probe_hamming >= 2:
        probes += [
            (1 << i) | (1 << j) for i in range(nbits) for j in range(i + 1, nbits)
        ]
    q_exp = q.select(
        "query_id",
        "__qvec",
        "qbucket",
        F.explode(F.array(*[F.lit(p) for p in probes])).alias("__flip"),
    ).select(
        "query_id", "__qvec", F.col("qbucket").bitwiseXOR(F.col("__flip")).alias("bucket")
    )
    scored = corpus.join(F.broadcast(q_exp), "bucket").where(F.col("vec_id") != F.col("query_id"))
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
    nbits: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: pairs sharing
    a bucket with cosine ≥ threshold → (id_a, id_b, sim). Near-identical
    vectors collide in every bit with high probability, so a single-bucket
    join finds them without the all-pairs product."""
    b = add_lsh_bucket(
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v", nbits, seed
    )
    lhs = b.alias("a")
    rhs = b.alias("b")
    cand = lhs.join(
        rhs,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine(F.col("a.v"), F.col("b.v")).alias("sim"),
    )
    return cand.where(F.col("sim") >= threshold)
