"""Training-pipeline hygiene operators: train/test decontamination
(functions.dedup.decontaminate), PII detection/scrubbing (functions.pii),
and deterministic split/sampling (functions.sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from safedata_validator_spark.functions import pii
from safedata_validator_spark.functions import sampling as sp
from safedata_validator_spark.functions.dedup import decontaminate


# ---------------------------------------------------------------- decontaminate

def _corpora(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different document about spark plans"),
            (3, "quick brown fox jumps over a sleeping cat today"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over nothing at all")],
        ["doc_id", "text"],
    )
    return train, eval_df


def test_decontaminate_flags_overlapping_train_docs(spark):
    train, eval_df = _corpora(spark)
    out = decontaminate(train, eval_df, "doc_id", "text", n=5, min_hits=1)
    rows = {r["id"]: r["n_hits"] for r in out.collect()}
    # doc 1 shares 'the quick brown fox jumps' + 'quick brown fox jumps over';
    # doc 3 shares 'quick brown fox jumps over'; doc 2 shares nothing
    assert rows == {1: 2, 3: 1}


def test_decontaminate_min_hits_and_shuffle_path_agree(spark):
    train, eval_df = _corpora(spark)
    strict = decontaminate(train, eval_df, "doc_id", "text", n=5, min_hits=2)
    assert {r["id"] for r in strict.collect()} == {1}
    shuffled = decontaminate(
        train, eval_df, "doc_id", "text", n=5, broadcast_eval=False
    )
    broadcasted = decontaminate(train, eval_df, "doc_id", "text", n=5)
    assert sorted(map(tuple, shuffled.collect())) == sorted(
        map(tuple, broadcasted.collect())
    )


# --------------------------------------------------------- connected components

def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (transitive, no direct 1-4 edge), island 10-11, and an
    # isolated pair order reversal (20, 12) to exercise normalization
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 12)], ["id_a", "id_b"]
    )
    from safedata_validator_spark.functions.dedup import connected_components, dup_clusters

    cc = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 12, 20: 12}
    clusters = {
        r["component"]: (r["n_members"], r["member_ids"])
        for r in dup_clusters(pairs).collect()
    }
    assert clusters == {1: (4, [1, 2, 3, 4]), 10: (2, [10, 11]), 12: (2, [12, 20])}


def test_connected_components_long_chain_converges(spark):
    # a 40-node path is the worst case for naive min-label propagation
    # (diameter rounds); star contraction must close it within the backstop
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["id_a", "id_b"]
    )
    from safedata_validator_spark.functions.dedup import connected_components

    cc = connected_components(pairs, max_iterations=12).collect()
    assert {r["component"] for r in cc} == {0}
    assert {r["id"] for r in cc} == set(range(41))


def test_connected_components_self_loops_and_dups(spark):
    pairs = spark.createDataFrame(
        [(5, 5), (7, 8), (8, 7), (7, 8)], ["id_a", "id_b"]
    )
    from safedata_validator_spark.functions.dedup import connected_components

    cc = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert cc == {7: 7, 8: 7}


# ------------------------------------------------------------------------- pii

PII_TEXT = (
    "mail alice.smith+x@example.co.uk then 192.168.0.1 "
    "call 555-867-5309 ssn 123-45-6789 card 1234-5678-9012-3456 end"
)


def test_pii_counts_each_class(spark):
    df = spark.createDataFrame([(1, PII_TEXT), (2, "clean text"), (3, None)], ["id", "t"])
    out = {
        r["id"]: r
        for r in df.select(
            "id", *[pii.pii_count(F.col("t"), k).alias(k) for k in pii.PII_PATTERNS]
        ).collect()
    }
    assert {k: out[1][k] for k in pii.PII_PATTERNS} == {
        "email": 1, "card": 1, "ssn": 1, "phone": 1, "ipv4": 1,
    }
    for rid in (2, 3):
        assert all(out[rid][k] == 0 for k in pii.PII_PATTERNS)


def test_scrub_replaces_with_tokens_and_keeps_clean_text(spark):
    df = spark.createDataFrame([(PII_TEXT,), ("clean text stays",)], ["t"])
    got = [r[0] for r in df.select(pii.scrub_pii(F.col("t"))).collect()]
    assert got[0] == (
        "mail <EMAIL> then <IPV4> call <PHONE> ssn <SSN> card <CARD> end"
    )
    assert got[1] == "clean text stays"


def test_pii_audit_chars_redacted_zero_for_clean(spark):
    df = spark.createDataFrame([(1, "no pii here"), (2, PII_TEXT)], ["id", "t"])
    rows = {r["id"]: r for r in pii.pii_audit(df, "id", "t").collect()}
    assert rows[1]["chars_redacted"] == 0
    expected_delta = len(PII_TEXT) - len(
        "mail <EMAIL> then <IPV4> call <PHONE> ssn <SSN> card <CARD> end"
    )
    assert rows[2]["chars_redacted"] == expected_delta


# -------------------------------------------------------------------- sampling

def test_hash_split_deterministic_across_partitioning(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sp.hash_split(df, "doc_id").collect()
    b = sp.hash_split(df.repartition(17), "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hash_split_weights_approximately_hold(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    counts = {
        r["split"]: r["n"]
        for r in sp.hash_split(df, "doc_id", weights={"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] - 8000) < 300
    assert abs(counts["val"] - 1000) < 150
    assert abs(counts["test"] - 1000) < 150


def test_stratified_sample_is_deterministic_subset(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in sp.stratified_sample(df, "doc_id", 0.2).collect()}
    s2 = {r["doc_id"] for r in sp.stratified_sample(df.repartition(9), "doc_id", 0.2).collect()}
    assert s1 == s2
    assert abs(len(s1) - 1000) < 150
    # independent salt: the sample is NOT the low buckets of the split hash
    with pytest.raises(ValueError):
        sp.stratified_sample(df, "doc_id", 1.5)
    with pytest.raises(ValueError):
        sp.split_assign(F.col("doc_id"), {})
