"""Byte-level BPE tokenizer (functions/bpe.py): encoder semantics vs the
independent rank-order formulation in tools/purepy_ref.py, the Spark UDF
surface, and the pack_sequences wiring (real token budgets)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from safedata_validator_spark.functions import bpe
from safedata_validator_spark.functions.bpe_vocab import MERGES, N_MERGES

SF = "/root/testdata/sf0.001"


def test_encode_basics():
    assert bpe.encode("") == []
    assert bpe.encode(None) == []
    # every id is in the vocab id space
    ids = bpe.encode("the quick validation engine scans the table")
    assert ids and all(0 <= i < bpe.VOCAB_SIZE for i in ids)
    # trained merges compress common words well below byte count
    text = "the value table scan"
    assert len(bpe.encode(text)) < len(text.encode())
    # determinism
    assert bpe.encode(text) == bpe.encode(text)


def test_encode_matches_independent_formulation():
    import purepy_ref as ref

    cases = [
        "the quick validation engine scans every table",
        "it's   a test!! 12345 conv-00001 turn_idx",
        "key=value a-b http://example.com éèê unicode bytes",
        "xqzv jjkk unmergeable wwyy",
        " leading and trailing ",
    ]
    for t in cases:
        mine = len(bpe.encode(t))
        theirs = sum(
            ref.bpe_word_len(w.encode("utf-8"), MERGES)
            for w in ref.BPE_PRETOKEN_RE.findall(t)
        )
        assert mine == theirs, t


def test_unknown_bytes_fall_back_to_byte_ids():
    # a word with no applicable merges must come out as raw bytes
    ids = bpe.encode("\x01\x02")
    assert ids == [1, 2]


def test_vocab_is_pinned():
    # the pinned dimension: 256 byte ids + one per merge
    assert bpe.VOCAB_SIZE == 256 + N_MERGES
    assert len(MERGES) == N_MERGES


def test_spark_counts_and_plan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    out = bpe.token_count_exact(docs, "doc_id", "text")
    rows = {r["doc_id"]: r for r in out.collect()}
    sample = docs.select("doc_id", "text").collect()
    for r in sample[:10]:
        assert rows[r["doc_id"]]["n_bpe_tokens"] == len(bpe.encode(r["text"]))
    # pure projection: no shuffle in the UDF path
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan or "Python" in plan  # Arrow-batched UDF


def test_pack_sequences_by_bpe_tokens(spark):
    # the real-token budget feed: pack by exact BPE counts
    from safedata_validator_spark.functions.sampling import pack_sequences

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .limit(30)
        .withColumn("n_tok", bpe.bpe_count(F.col("text")))
    )
    packed = pack_sequences(docs, "doc_id", "n_tok", budget=256, part_cols=("source",))
    rows = packed.select("source", "doc_id", "n_tok", "start_offset", "seq_id").collect()
    by_src: dict = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["doc_id"])):
        off = by_src.get(r["source"], 0)
        assert r["start_offset"] == off
        assert r["seq_id"] == off // 256
        by_src[r["source"]] = off + r["n_tok"]


def test_catalog_query_registered(spark):
    from safedata_validator_spark.queries import ORACLES, QUERIES

    assert "token_count_docs" in QUERIES
    assert "token_count_docs" in ORACLES  # golden VALUES oracle
    out = QUERIES["token_count_docs"](spark, SF)
    assert out.columns == ["doc_id", "n_bpe_tokens", "n_regex_tokens"]
    assert out.count() == spark.read.parquet(f"{SF}/documents.parquet").count()


# ------------------------------------------------------------- property-based

from hypothesis import given, settings
from hypothesis import strategies as st

_HYP = settings(max_examples=200, deadline=None, derandomize=True)


@_HYP
@given(st.text(max_size=200))
def test_encode_matches_independent_formulation_random(t):
    """Random-text cross-check of the two BPE formulations (engine:
    lowest-rank-adjacent-pair loop; purepy_ref: rank-order global merges) —
    the equivalence is a theorem about BPE, so hypothesis attacks it."""
    import purepy_ref as ref

    mine = len(bpe.encode(t))
    theirs = sum(
        ref.bpe_word_len(w.encode("utf-8"), MERGES)
        for w in ref.BPE_PRETOKEN_RE.findall(t)
    )
    assert mine == theirs


@_HYP
@given(st.text(max_size=200))
def test_pretokenization_is_lossless(t):
    """Pre-token concatenation must reproduce the input exactly (GPT-2
    property: the regex partitions the string), and token ids round-trip
    through the byte space — so token counts are a true length measure."""
    parts = bpe.PRETOKEN_RE.findall(t)
    assert "".join(parts) == t
