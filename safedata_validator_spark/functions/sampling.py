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


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    part_cols: tuple[str, ...] = ("source",),
    seq_col: str = "seq_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid head-to-tail in
    ``id_col`` order within each ``part_cols`` group and cut into training
    sequences of ``budget`` size units — ``seq_id`` = which sequence this
    document STARTS in (floor(start_offset / budget)), the GPT-style packing
    rule. Adds ``seq_id`` and ``start_offset``.

    Scale shape: one partitioned running-sum window — the partition key
    bounds the window, so no global single-partition sort ever happens. At
    100 TB pass a sharded key (e.g. ``(source, hash_bucket(id) % k)``) via
    ``part_cols``; packing semantics are per-group by definition, so
    sharding changes WHICH docs share a sequence, not the validity of the
    packing."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*[F.col(c) for c in part_cols])
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(size_col)).over(w) - F.col(size_col)).cast("long")
    return df.withColumn("start_offset", start).withColumn(
        seq_col, F.floor(F.col("start_offset") / budget).cast("long")
    )


def mixture_resample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    target_weights: dict[str, float],
    salt: str = "mixture",
) -> DataFrame:
    """Deterministic corpus-mixture rebalancing: downsample each stratum so
    the surviving corpus matches ``target_weights`` proportions (Pile/Dolma
    style source reweighting), keeping as much data as possible — the
    stratum that would need UPsampling keeps 100% and anchors the scale.

    keep_rate(s) = target(s) × K / count(s), K = min_s count(s)/target(s);
    rows survive iff their salted md5 bucket < floor(rate × BUCKETS) — the
    same pure-row-filter shape as ``stratified_sample``, so the result is
    reproducible at any parallelism. Strata absent from ``target_weights``
    are dropped (target 0).

    The per-stratum counts are a tiny aggregate (|strata| rows) joined back
    by BROADCAST — the corpus itself is scanned twice (count + filter) but
    never shuffled."""
    if not target_weights or any(w <= 0 for w in target_weights.values()):
        raise ValueError("target_weights must be non-empty and positive")
    s = F.col(stratum_col)
    pairs = []
    for name, wt in target_weights.items():
        pairs += [F.lit(name), F.lit(float(wt))]
    target = F.create_map(*pairs)[s]
    counts = (
        df.select(s.alias("__stratum"), target.alias("__target"))
        .where(F.col("__target").isNotNull())
        .groupBy("__stratum", "__target")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    k = counts.agg(
        F.min(F.col("__cnt") / F.col("__target")).alias("__k")
    )
    rates = counts.crossJoin(F.broadcast(k)).select(
        "__stratum",
        F.floor(
            (F.col("__target") * F.col("__k") / F.col("__cnt")) * BUCKETS
        ).cast("int").alias("__thr"),
    )
    return (
        df.join(F.broadcast(rates), s == F.col("__stratum"), "inner")
        .where(hash_bucket(F.col(id_col), salt) < F.col("__thr"))
        .drop("__stratum", "__thr")
    )


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
