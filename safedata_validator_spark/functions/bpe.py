"""Byte-level BPE tokenizer with a pinned merges table — tokenizer-accurate
token counting for training-data budgeting (the regex `text.bpe_token_count`
is a cheap approximation; THIS one is the count a trainer sharing the pinned
merges would see, so `sampling.pack_sequences` can pack against real token
budgets).

Algorithm: GPT-2-style byte-level BPE. Pre-tokenize with a fixed regex
(contractions / letter runs / digit runs / punctuation runs / whitespace),
map each pre-token to its UTF-8 bytes, then repeatedly merge the
lowest-rank adjacent symbol pair per the pinned MERGES table
(functions/bpe_vocab.py, generated deterministically by
tools/gen_bpe_merges.py). Token ids: 0-255 = raw bytes, 256+rank = merged
symbols — the standard byte-level id space.

Scale shape: the encoder is Python, so it runs ONLY inside Arrow-batched
pandas UDFs (`mapInPandas`-class plumbing, never row-at-a-time Python UDFs)
with an LRU cache over distinct pre-tokens — natural-language corpora reuse
a tiny distinct-word set, so the cache hit rate dominates (Zipf). The UDF is
a pure projection: no shuffle, trivially parallel over 100 TB, and the
merges table ships to executors as a closure constant (a few KB), not a
join. Reference parity: the reference counts nothing (no tokenizer
analogue); this is an engine addition for the LLM-data pipeline surface.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from safedata_validator_spark.functions.bpe_vocab import MERGES

#: same pre-tokenizer the trainer used (tools/gen_bpe_merges.py)
PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

_RANK: dict[tuple[bytes, bytes], int] = {pair: i for i, pair in enumerate(MERGES)}
#: token id space: 256 raw bytes, then one id per merge rank
_ID: dict[bytes, int] = {bytes([b]): b for b in range(256)}
for _a, _b in MERGES:
    _ID[_a + _b] = len(_ID)

VOCAB_SIZE = len(_ID)


@lru_cache(maxsize=65536)
def _encode_word(word: bytes) -> tuple[int, ...]:
    """BPE-merge one pre-token's bytes; cached — corpora are Zipfian."""
    syms = [bytes([b]) for b in word]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = _RANK.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(_ID[s] for s in syms)


def encode(text: str | None) -> list[int]:
    """Full token-id sequence for *text* (driver-side / test helper; the
    Spark path goes through the pandas UDFs below)."""
    if not text:
        return []
    out: list[int] = []
    for w in PRETOKEN_RE.findall(text):
        out.extend(_encode_word(w.encode("utf-8")))
    return out


def bpe_count(col: Column) -> Column:
    """Exact BPE token count per row (int). Arrow-batched pandas UDF —
    a zero-shuffle projection."""

    @pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        return s.map(lambda t: len(encode(t)), na_action=None).fillna(0).astype("int32")

    return _count(col)


def bpe_tokens(col: Column) -> Column:
    """Exact BPE token-id array per row (array<int>) — the real-token feed
    for sequence packing / inspection. Arrow-batched pandas UDF."""

    @pandas_udf("array<int>")
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(encode, na_action=None)

    return _tok(col)


def token_count_exact(df, id_col: str, text_col: str):
    """Per-document exact token count next to the cheap regex estimate —
    the catalog surface (`token_count_docs`). Both counts are projections;
    comparing them quantifies how far the regex heuristic drifts from the
    tokenizer a trainer would bill against."""
    from safedata_validator_spark.functions import text as tx

    return df.select(
        F.col(id_col),
        bpe_count(F.col(text_col)).alias("n_bpe_tokens"),
        tx.bpe_token_count(F.col(text_col)).alias("n_regex_tokens"),
    )
