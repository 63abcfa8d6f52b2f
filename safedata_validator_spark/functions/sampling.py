"""Deterministic sampling / splitting for training corpora.

Train/val/test assignment and stratified subsampling must be REPRODUCIBLE
(re-running the pipeline on the same corpus yields the same split,
regardless of partitioning, ordering, or cluster size) — so none of this
uses ``df.sample``/``rand()``. Every decision is a pure function of the
row's id and a salt: ``bucket = conv(substr(md5(salt || id), 1, 8), 16, 10)
% 10_000``. md5 is used (not xxhash64) because every SQL engine agrees on
it, which keeps the operators exactly oracle-checkable; the first 8 hex
chars give a uniform 32-bit value, far more resolution than the 10^4
bucket space needs.

All pure Spark Column expressions — JVM-side, whole-stage codegen, no
shuffle: split assignment and sampling are embarrassingly parallel row
filters, the cheapest possible shape at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space for split/sample thresholds — weights are resolved to
#: integer bucket counts out of 10_000 (0.01% granularity)
BUCKETS = 10_000


def hash_bucket(id_col: Column, salt: str) -> Column:
    """Deterministic uniform bucket in [0, BUCKETS) from a row id + salt.

    Independent salts give independent bucketings, so a split decision
    never correlates with a sampling decision made on the same ids.
    """
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % BUCKETS).cast("int")


def split_assign(id_col: Column, weights: dict[str, float], salt: str = "split") -> Column:
    """Split-name column ('train'/'val'/'test'/...) from cumulative weight
    thresholds over the hash bucket. Weights must sum to 1.0 (±1 bucket of
    rounding is absorbed by the LAST split, which takes the open tail)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    bucket = hash_bucket(id_col, salt)
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/val/test split column (default
    98/1/1)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    return df.withColumn(split_col, split_assign(F.col(id_col), weights, salt))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows — a pure row filter, so the
    SAME rows survive at every parallelism and partitioning. Uniform within
    any stratum because the bucket is independent of every data column;
    per-stratum exactness (and oracle checks) follow from determinism."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_bucket(F.col(id_col), salt) < int(round(fraction * BUCKETS)))
