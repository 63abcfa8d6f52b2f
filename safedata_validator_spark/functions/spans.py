"""Span-level exact-substring deduplication (training-data hygiene).

Doc-level dedup (exact / MinHash / SimHash / n-gram Jaccard, see
``functions.dedup``) removes whole documents; this module finds the token
SPANS that occur verbatim in more than one document — boilerplate,
licence blocks, copied passages — the signal behind suffix-array
substring dedup in the public training-data literature (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") — and removes
them row-locally while keeping the rest of each document.

Definition: a duplicated window is a run of exactly ``n`` consecutive
normalised tokens whose joined text occurs in at least two DISTINCT
documents (within-document repetition is a different signal and already
scored by ``functions.repetition``). Overlapping/adjacent duplicated
windows merge into maximal spans, so any shared substring of >= n tokens
is covered end-to-end.

Spark-first shape (the 100 TB plan):

* One compact ``array<bigint>`` of window hashes per document, persisted
  by the caller if reused — exploded (id, pos, hash) views derive
  row-locally, the same compact-array design the minhash pipeline uses
  (``dedup.shingle_hash_array``).
* Duplicate detection is ONE map-side-combined groupBy on the 8-byte
  window hash: ``min(id) != max(id)`` decides "seen in 2+ docs" without
  collecting occurrence lists, so reducer state per hash is two longs no
  matter how hot the window (a collect_list variant would hold every
  occurrence of a ubiquitous boilerplate window in one reducer).
* Positions are recovered by re-joining the row-locally re-derived
  exploded view against the duplicated-hash set on the 8-byte key —
  shuffle volume |tokens| once, skewed hot hashes split by AQE, output
  bounded by |duplicated windows|.
* Span merge (gaps-and-islands over sorted window starts) and span
  removal are pure Column expressions over per-document arrays — zero
  Python, zero extra shuffle.

Hash collisions: xxhash64 over the joined window text — at 2^64 the
collision probability across even 10^13 windows is ~1e-6 (birthday
bound), the same trade the exact-dedup fingerprint and the n-gram
decontaminator already make (``functions.dedup`` module docstring).

Reference parity: the reference engine has no dedup operators (it is a
single-file validator); this module is part of the engine's
training-data-pipeline surface (SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from safedata_validator_spark.functions.dedup import _hand_off_cache, carry
from safedata_validator_spark.functions.text import normalize_text


def window_hash_array(df: DataFrame, id_col: str, text_col: str, n: int = 20) -> DataFrame:
    """→ (id, n_tokens, whs array<bigint>) — xxhash64 of every n-token
    window of the normalised text, one element per start position.

    Same shifted-slice trick as ``dedup.word_shingles``: n zipped O(n)
    array slices per row instead of an O(len²) per-index slice lambda.
    Unlike shingling, positions matter, so there is no array_distinct.
    """
    if n < 2:
        raise ValueError("window length n must be >= 2")
    toks = F.split(normalize_text(F.col(text_col)), " ")
    length = F.size(toks) - (n - 1)
    shifted = [F.slice(toks, i + 1, F.greatest(length, F.lit(0))) for i in range(n)]
    zipped = F.arrays_zip(*shifted)
    whs = F.when(
        (F.size(toks) >= n) & (F.element_at(toks, 1) != ""),
        F.transform(
            zipped, lambda s: F.xxhash64(F.concat_ws(" ", *[s[str(i)] for i in range(n)]))
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(F.element_at(toks, 1) == "", F.lit(0)).otherwise(F.size(toks)).alias("n_tokens"),
        whs.alias("whs"),
    )


def _exploded(hashed: DataFrame) -> DataFrame:
    """Row-local exploded view → (id, pos, wh); pos is 0-based."""
    return hashed.select("id", F.posexplode("whs").alias("pos", "wh"))


def cross_doc_window_hashes(hashed: DataFrame) -> DataFrame:
    """→ (wh) hashes whose window text occurs in >= 2 distinct documents.

    min/max carry "two distinct ids seen" through map-side combine, so
    the shuffle holds one (hash, lo, hi) row per DISTINCT window and hot
    boilerplate windows collapse on the map side.
    """
    return (
        _exploded(hashed)
        .groupBy("wh")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .select("wh")
    )


def _merge_starts(starts: Column, n: int) -> Column:
    """Sorted window starts → merged maximal spans array<struct<s,e>>
    (token-index intervals, inclusive). Each start p covers [p, p+n-1];
    runs overlapping or touching merge (gaps-and-islands, row-local)."""
    empty = F.array().cast("array<struct<s:int,e:int>>")
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    return F.aggregate(
        starts,
        empty,
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= last(acc)["e"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["s"].alias("s"),
                        F.greatest(last(acc)["e"], p + n - 1).cast("int").alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(F.struct(p.cast("int").alias("s"), (p + n - 1).cast("int").alias("e"))),
            )
        ),
    )


def duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 20
) -> DataFrame:
    """→ (id, n_tokens, spans, n_spans, n_dup_tokens) for EVERY input doc
    (docs without cross-document duplicated windows keep empty spans).

    ``spans`` are inclusive token-index intervals into the NORMALISED
    token sequence (``text.normalize_text`` then single-space split) —
    the same coordinate system ``remove_duplicated_spans`` consumes.

    The compact hash-array table is persisted (it feeds the duplicate
    scan, the position re-join, and the final doc spine — three scans of
    a table much smaller than the exploded view); the cache hands off to
    the caller via ``dedup.release``, like every dedup pipeline here.
    """
    hashed = window_hash_array(df, id_col, text_col, n).persist()
    dup = cross_doc_window_hashes(hashed)
    starts = (
        _exploded(hashed)
        .join(dup, "wh")  # AQE splits skewed hot-hash partitions
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    spans = F.coalesce(
        _merge_starts(F.col("starts"), n), F.array().cast("array<struct<s:int,e:int>>")
    )
    out = (
        hashed.select("id", "n_tokens")
        .join(starts, "id", "left")
        .select(
            "id",
            "n_tokens",
            spans.alias("spans"),
        )
        .withColumn("n_spans", F.size("spans"))
        .withColumn(
            "n_dup_tokens",
            F.aggregate(
                "spans", F.lit(0), lambda acc, sp: acc + sp["e"] - sp["s"] + F.lit(1)
            ),
        )
    )
    return _hand_off_cache(out, (hashed,))


def remove_duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 20
) -> DataFrame:
    """→ input columns + (n_tokens, n_dup_tokens, text_clean): the
    normalised text with every cross-document duplicated span dropped.

    The rebuild filters the token array by position against the span
    list — O(tokens × spans) row-local work, no shuffle beyond
    ``duplicated_spans``'s own; span counts per doc are small in real
    corpora (they merge into maximal runs).
    """
    spans_df = duplicated_spans(df, id_col, text_col, n)
    marked = spans_df.select(
        F.col("id").alias("__sid"), "n_tokens", "n_dup_tokens", "spans"
    )
    toks = F.split(normalize_text(F.col(text_col)), " ")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])
        ),
    )
    out = (
        df.join(marked, F.col(id_col) == F.col("__sid"))
        .withColumn("text_clean", F.array_join(kept, " "))
        .drop("__sid", "spans")
    )
    return carry(spans_df, out)


def decontaminated_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
) -> DataFrame:
    """Surgical decontamination, detection half: → (id, n_tokens, spans,
    n_spans, n_dup_tokens) for the TRAINING docs containing at least one
    n-token window that appears verbatim anywhere in the EVAL corpus
    (docs without leaks are omitted — the output is bounded by leak
    volume, not corpus size). ``dedup.decontaminate`` COUNTS the hits to
    drop whole documents; this locates the leaked passages as merged
    maximal spans so ``remove_decontaminated_spans`` can excise just them.

    Scale shape: the eval side is tiny next to training, so its distinct
    window-hash set rides a BROADCAST semi-join against the row-locally
    exploded training windows — the 100-TB side's only exchange is the
    per-doc position regroup, bounded by |leaked windows|.
    """
    hashed = window_hash_array(train, id_col, text_col, n).persist()
    eval_whs = (
        window_hash_array(eval_df, id_col, text_col, n)
        .select(F.explode("whs").alias("wh"))
        .distinct()
    )
    starts = (
        _exploded(hashed)
        .join(F.broadcast(eval_whs), "wh", "left_semi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    out = (
        hashed.select("id", "n_tokens")
        .join(starts, "id")
        .select("id", "n_tokens", _merge_starts(F.col("starts"), n).alias("spans"))
        .withColumn("n_spans", F.size("spans"))
        .withColumn(
            "n_dup_tokens",
            F.aggregate(
                "spans", F.lit(0), lambda acc, sp: acc + sp["e"] - sp["s"] + F.lit(1)
            ),
        )
    )
    return _hand_off_cache(out, (hashed,))


def remove_decontaminated_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
) -> DataFrame:
    """→ training columns + (n_tokens, n_dup_tokens, text_clean): the
    normalised text with every eval-leaked span excised; docs without
    leaks pass through with n_dup_tokens = 0 and their normalised text.

    The rebuild left-joins training against the flagged set — bounded by
    leak volume, usually tiny; left to AQE rather than a broadcast hint
    because a pathological eval (e.g. a licence block the whole corpus
    shares) can flag every document.
    """
    spans_df = decontaminated_spans(train, eval_df, id_col, text_col, n)
    marked = spans_df.select(
        F.col("id").alias("__sid"), F.col("n_dup_tokens").alias("__dup"), "spans"
    )
    toks = F.split(normalize_text(F.col(text_col)), " ")
    n_tok = F.when(F.element_at(toks, 1) == "", F.lit(0)).otherwise(F.size(toks))
    spans = F.coalesce(F.col("spans"), F.array().cast("array<struct<s:int,e:int>>"))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(spans, lambda sp: (i >= sp["s"]) & (i <= sp["e"])),
    )
    out = (
        train.join(marked, F.col(id_col) == F.col("__sid"), "left")
        .withColumn("n_tokens", n_tok.cast("int"))
        .withColumn("n_dup_tokens", F.coalesce("__dup", F.lit(0)))
        .withColumn(
            "text_clean",
            F.when(n_tok == 0, F.lit("")).otherwise(F.array_join(kept, " ")),
        )
        .drop("__sid", "__dup", "spans")
    )
    return carry(spans_df, out)
