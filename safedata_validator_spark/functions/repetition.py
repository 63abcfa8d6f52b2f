"""Repetition / boilerplate signals for pretraining-corpus quality filtering.

The Gopher/MassiveText-style repetition battery (Rae et al. 2021, table A1):
documents dominated by a few repeated n-grams or duplicated lines are
machine-generated boilerplate and get filtered before training. Signals per
document:

* ``top{n}gram_frac`` — fraction of the document's n-grams taken by its
  single most frequent n-gram (token-level analogue of Gopher's
  top-n-gram character fraction),
* ``dup{n}gram_frac`` — fraction of n-gram occurrences beyond the first
  (1 − distinct/total),
* ``dup_line_frac`` / ``dup_line_char_frac`` — duplicated-line fraction by
  count and by characters.

Everything is row-local array arithmetic (split → shifted-slice zip →
sort → one linear ``aggregate`` pass), so the operator is a pure
projection: zero shuffles, zero UDFs, whole-stage codegen, and the cost is
O(tokens·log tokens) per document regardless of corpus size — the cheapest
possible distributed shape for a 100-TB quality sweep. The per-document
mode (most frequent n-gram count) deliberately uses sort + longest-run
instead of explode + groupBy: the latter would shuffle |corpus n-grams|
rows to answer a per-row question.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from safedata_validator_spark.functions.text import normalize_text


def ngram_array(toks: Column, n: int) -> Column:
    """All word n-grams of a token array, duplicates preserved (the
    repetition signals NEED the duplicates — contrast dedup.word_shingles,
    which distincts). Same O(n) shifted-slice zip."""
    length = F.size(toks) - (n - 1)
    shifted = [F.slice(toks, i + 1, F.greatest(length, F.lit(0))) for i in range(n)]
    zipped = F.arrays_zip(*shifted)
    return F.when(
        F.size(toks) >= n,
        F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])),
    ).otherwise(F.array().cast("array<string>"))


def max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    array == the count of the array's most frequent element. One linear
    fold (higher-order ``aggregate``), no shuffle."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, zero, merge, lambda acc: acc["best"])


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.round(num.cast("double") / den.cast("double"), 6))


def repetition_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ns: tuple[int, ...] = (2, 3),
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document repetition profile → (id, [keep...], n_tokens, n_lines,
    dup_line_frac, dup_line_char_frac, and per n: g{n}_total, g{n}_distinct,
    top{n}gram_frac, dup{n}gram_frac). Fractions are NULL when the document
    is shorter than n tokens (no n-grams to measure)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda t: t != "")
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    distinct_line_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    cols = [
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep],
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(lines).cast("long").alias("n_lines"),
        _frac(F.size(lines) - F.size(F.array_distinct(lines)), F.size(lines)).alias(
            "dup_line_frac"
        ),
        _frac(line_chars - distinct_line_chars, line_chars).alias("dup_line_char_frac"),
    ]
    for n in ns:
        grams = ngram_array(toks, n)
        total = F.size(grams)
        distinct = F.size(F.array_distinct(grams))
        top = max_run(F.array_sort(grams))
        cols += [
            total.cast("long").alias(f"g{n}_total"),
            distinct.cast("long").alias(f"g{n}_distinct"),
            _frac(top, total).alias(f"top{n}gram_frac"),
            _frac(total - distinct, total).alias(f"dup{n}gram_frac"),
        ]
    return df.select(*cols)
