"""Corpus-statistical LM quality signal: bigram cross-entropy /
perplexity per document against a reference corpus model.

``text.quality_score`` is a row-local heuristic (length / punctuation /
stopword ratios); this module adds the corpus-statistical signal the
public curation literature filters on (CCNet-style LM perplexity): an
interpolated bigram model is estimated from a REFERENCE corpus and every
document is scored against it. Low perplexity = text shaped like the
reference (or templated repeats of it); very high perplexity = token
soup / OOV-heavy noise; curation keeps a middle band.

Model: interpolated bigram with add-one unigram backoff,

    P(w2 | w1) = lam * c(w1 w2)/c(w1)  +  (1-lam) * (c(w2)+1)/(N+V)

over the reference corpus (c = reference counts, N = reference token
total, V = reference vocabulary size). The backoff term keeps every
probability strictly positive, so held-out documents with unseen words
or bigrams score finitely (a pure MLE would be +inf there, and
SELF-scoring pure MLE has the opposite artifact: a singleton junk bigram
is its own only evidence and scores a perfect 1.0). Per-doc score = mean
-log2 P over bigram positions (bits/token); perplexity = 2^H.

Spark-first shape (the 100 TB plan):

* One compact token array per document, persisted — unigram counts,
  bigram counts and the scoring pass all derive their exploded views
  row-locally from it (the minhash/spans compact-array design).
* Counts are map-side-combined groupBys keyed on the 8-byte xxhash64 of
  the gram text — shuffle volume is |distinct grams| x 16 bytes, never
  the corpus, and hot grams ("the") collapse on the map side.
* Scoring LEFT-joins the exploded bigram view against the count tables
  on the 8-byte keys (shuffle |tokens| rows per table, AQE splits the
  skewed hot keys), then one groupBy(id) average; the scalar (N, V) row
  is a 1-row broadcast crossJoin (the profiler's totals shape).
* Hash note: 2^64 collision odds per table — the standard trade of every
  hashed operator here (see functions.dedup docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_validator_spark.functions.dedup import _hand_off_cache
from safedata_validator_spark.functions.text import normalize_text


def _token_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id, toks array<string>) over normalised text; empty for blank."""
    nrm = normalize_text(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(nrm == "", F.array().cast("array<string>"))
        .otherwise(F.split(nrm, " "))
        .alias("toks"),
    )


def _bigram_view(toks: DataFrame) -> DataFrame:
    """Row-local exploded view → (id, w1h, w2h, bgh) per bigram position."""
    return toks.select(
        "id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.struct(
                        F.xxhash64(a).alias("w1h"),
                        F.xxhash64(b).alias("w2h"),
                        F.xxhash64(F.concat_ws(" ", a, b)).alias("bgh"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<w1h:bigint,w2h:bigint,bgh:bigint>>")
            ),
        ).alias("bg"),
    ).select("id", "bg.w1h", "bg.w2h", "bg.bgh")


def bigram_cross_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ref: DataFrame | None = None,
    lam: float = 0.9,
) -> DataFrame:
    """→ (id, n_tokens, n_bigrams, cross_entropy, perplexity) per doc of
    ``df``, scored against the interpolated bigram model of ``ref``
    (defaults to ``df`` itself — self-scoring measures repetitiveness
    against the corpus's own statistics; pass a clean reference corpus
    for the CCNet-style quality reading). ``ref`` must expose the same
    ``id_col``/``text_col``. Docs with fewer than 2 tokens have no
    bigrams: cross_entropy and perplexity are NULL there (a 0 would fake
    "perfectly predicted").
    """
    if not 0.0 < lam < 1.0:
        raise ValueError("lam must be strictly between 0 and 1")
    toks = _token_arrays(df, id_col, text_col).persist()
    caches: tuple = (toks,)
    if ref is None:
        ref_toks = toks
    else:
        ref_toks = _token_arrays(ref, id_col, text_col).persist()
        caches = caches + (ref_toks,)

    uni_counts = (
        ref_toks.select(F.explode("toks").alias("w"))
        .groupBy(F.xxhash64("w").alias("wh"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg_counts = _bigram_view(ref_toks).groupBy("bgh").agg(
        F.count(F.lit(1)).alias("c12")
    )
    totals = uni_counts.agg(
        F.sum("c").alias("__n"), F.count(F.lit(1)).alias("__v")
    )

    p_bg = F.when(
        F.col("c1").isNotNull() & F.col("c12").isNotNull(),
        F.col("c12") / F.col("c1"),
    ).otherwise(F.lit(0.0))
    p_uni = (F.coalesce(F.col("c2"), F.lit(0)) + 1) / (F.col("__n") + F.col("__v"))
    p = F.lit(lam) * p_bg + F.lit(1.0 - lam) * p_uni

    # scoring joins run on the occurrence STREAM deliberately — two
    # alternatives were measured and rejected at 10M/local[32]:
    # (1) groupBy(id, bigram) pre-aggregation (weighted mean): only pays
    #     off on repetitive corpora; on low-repetition ones its hash
    #     state holds every occurrence as a distinct 4-long key and
    #     OOM'd the 8 GB heap.
    # (2) resolving c12/c1 on the model side to drop the c1 probe join:
    #     on low-repetition corpora |distinct bigrams| ≈ |occurrences|,
    #     so the "small" model-side join is occurrence-scale and the net
    #     is a LOSS (132.4 s → 143.3 s at 12 GB); it would win only on
    #     strongly Zipf-shaped corpora.
    # Heap note: at 10M/local[32] this op is squeezed by the persisted
    # token cache + 32 concurrent join tasks in the default 8 GB heap
    # (completes some windows at ~240 s, OOMs others);
    # SPARK_DRIVER_MEM=12g runs it at 132.4 s / 75.5k docs/sec.
    scored = (
        _bigram_view(toks)
        .join(bg_counts, "bgh", "left")
        .join(uni_counts.select(F.col("wh").alias("w1h"), F.col("c").alias("c1")), "w1h", "left")
        .join(uni_counts.select(F.col("wh").alias("w2h"), F.col("c").alias("c2")), "w2h", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(-F.log2(p)).alias("cross_entropy"),
        )
    )

    out = (
        toks.select("id", F.size("toks").alias("n_tokens"))
        .join(scored, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round("cross_entropy", 6).alias("cross_entropy"),
            F.round(F.pow(F.lit(2.0), "cross_entropy"), 6).alias("perplexity"),
        )
    )
    return _hand_off_cache(out, caches)


def perplexity_band(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lo_quantile: float = 0.1,
    hi_quantile: float = 0.9,
    ref: DataFrame | None = None,
    lam: float = 0.9,
) -> DataFrame:
    """→ ``bigram_cross_entropy`` columns + ``band`` ('low'/'keep'/'high')
    against the scored corpus's perplexity quantiles — the CCNet-style
    middle-band curation rule (drop reference-shaped boilerplate at the
    low end and token soup at the high end, keep the middle).

    The quantile thresholds are ONE approx-percentile row broadcast back
    over the scores (the profiler's 1-row totals shape); docs without
    bigrams keep a NULL band.
    """
    scored = bigram_cross_entropy(df, id_col, text_col, ref=ref, lam=lam)
    qs = scored.where(F.col("perplexity").isNotNull()).agg(
        F.percentile_approx("perplexity", lo_quantile).alias("__lo"),
        F.percentile_approx("perplexity", hi_quantile).alias("__hi"),
    )
    out = (
        scored.crossJoin(F.broadcast(qs))
        .withColumn(
            "band",
            F.when(F.col("perplexity").isNull(), F.lit(None).cast("string"))
            .when(F.col("perplexity") < F.col("__lo"), F.lit("low"))
            .when(F.col("perplexity") > F.col("__hi"), F.lit("high"))
            .otherwise(F.lit("keep")),
        )
        .drop("__lo", "__hi")
    )
    return _hand_off_cache(out, tuple(getattr(scored, "_sdv_cached", ())))
