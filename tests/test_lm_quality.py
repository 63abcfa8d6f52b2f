"""LM quality signal (functions/lm_quality.py) vs the independent
pure-Python reference and a full DuckDB SQL oracle, plus band semantics
and plan pins."""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from safedata_validator_spark.functions.dedup import release
from safedata_validator_spark.functions.lm_quality import (
    bigram_cross_entropy,
    perplexity_band,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from purepy_ref import bigram_cross_entropy_ref  # noqa: E402

REF_DOCS = {
    10: "the cat sat on the mat and the dog sat on the rug",
    11: "the cat sat on the mat and the dog ran to the door",
    12: "a quick brown fox jumps over the lazy dog every day",
}


def _collect(spark, docs, ref=None, lam=0.9):
    df = spark.createDataFrame(sorted(docs.items()), ["doc_id", "text"])
    rdf = (
        spark.createDataFrame(sorted(ref.items()), ["doc_id", "text"])
        if ref is not None
        else None
    )
    out = bigram_cross_entropy(df, "doc_id", "text", ref=rdf, lam=lam)
    got = {
        r["id"]: (r["n_tokens"], r["n_bigrams"], r["cross_entropy"], r["perplexity"])
        for r in out.collect()
    }
    release(out)
    return got


def _assert_matches_ref(spark, docs, ref=None, lam=0.9):
    want = bigram_cross_entropy_ref(docs, ref=ref, lam=lam)
    got = _collect(spark, docs, ref=ref, lam=lam)
    assert set(got) == set(want)
    for i in want:
        wn, wb, wh, wp = want[i]
        gn, gb, gh, gp = got[i]
        assert (gn, gb) == (wn, wb), f"doc {i} counts"
        if wh is None:
            assert gh is None and gp is None, f"doc {i} null"
        else:
            assert gh == pytest.approx(wh, abs=1e-5), f"doc {i} entropy"
            assert gp == pytest.approx(wp, rel=1e-5), f"doc {i} perplexity"


def test_reference_model_separates_shaped_from_soup(spark):
    docs = {
        1: "the cat sat on the mat",  # reference-shaped
        2: "zebra quantum flux discombobulated xylophone",  # OOV soup
        3: "one",
        4: "",
    }
    _assert_matches_ref(spark, docs, ref=REF_DOCS)
    got = _collect(spark, docs, ref=REF_DOCS)
    assert got[1][3] < 10 < got[2][3]  # ppl gap: shaped << soup
    assert got[3][2] is None and got[4][2] is None


def test_self_scoring_measures_repetitiveness(spark):
    # self-scoring semantics: a doc whose bigrams dominate the corpus
    # statistics (5 verbatim copies) scores LOW; a doc recombining the
    # SAME words in a novel order has singleton bigrams over common
    # unigrams and scores HIGH — repetitiveness, not absolute quality
    # (the reference-model mode is the quality signal)
    docs = {i: "the cat sat on the mat" for i in range(5)}
    docs[9] = "mat the on sat cat the"
    _assert_matches_ref(spark, docs, ref=None)
    got = _collect(spark, docs)
    assert got[0][3] < got[9][3]


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=20),
        min_size=1,
        max_size=5,
    ),
    refdata=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=2, max_size=20),
        min_size=1,
        max_size=4,
    ),
    lam=st.sampled_from([0.5, 0.9]),
)
def test_lm_matches_purepy_reference(spark, data, refdata, lam):
    docs = {i: " ".join(t) for i, t in enumerate(data)}
    ref = {100 + i: " ".join(t) for i, t in enumerate(refdata)}
    _assert_matches_ref(spark, docs, ref=ref, lam=lam)
    _assert_matches_ref(spark, docs, ref=None, lam=lam)


LM_ORACLE_SQL = """
WITH rnorm AS (
  SELECT doc_id,
         CASE WHEN trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN []
              ELSE string_split(trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g')), ' ')
         END AS toks FROM ref),
runi AS (SELECT u.w, count(*) AS c FROM rnorm, LATERAL unnest(toks) AS u(w) GROUP BY u.w),
rbg AS (SELECT toks[p.i] AS w1, toks[p.i+1] AS w2, count(*) AS c12
        FROM rnorm, LATERAL unnest(range(1, greatest(len(toks), 1))) AS p(i)
        GROUP BY 1, 2),
tot AS (SELECT sum(c) AS n, count(*) AS v FROM runi),
dnorm AS (
  SELECT doc_id,
         CASE WHEN trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN []
              ELSE string_split(trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g')), ' ')
         END AS toks FROM docs),
dbg AS (SELECT doc_id, toks[p.i] AS w1, toks[p.i+1] AS w2
        FROM dnorm, LATERAL unnest(range(1, greatest(len(toks), 1))) AS p(i)),
scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         avg(-log2({lam} * coalesce(rbg.c12 * 1.0 / u1.c, 0.0)
                   + {oml} * (coalesce(u2.c, 0) + 1.0) / (tot.n + tot.v))) AS h
  FROM dbg
  LEFT JOIN rbg ON dbg.w1 = rbg.w1 AND dbg.w2 = rbg.w2
  LEFT JOIN runi u1 ON dbg.w1 = u1.w
  LEFT JOIN runi u2 ON dbg.w2 = u2.w
  CROSS JOIN tot
  GROUP BY doc_id)
SELECT n.doc_id, len(n.toks) AS n_tokens,
       coalesce(s.n_bigrams, 0) AS n_bigrams, s.h AS cross_entropy
FROM dnorm n LEFT JOIN scored s USING (doc_id)
ORDER BY n.doc_id
"""


def test_lm_matches_duckdb_sql_oracle(spark):
    """Full SQL oracle: reference counts by GROUP BY over unnested token
    lists, interpolated probability in the select, avg(-log2 p) per doc —
    exact token text throughout (no hashing)."""
    import duckdb

    docs = {
        1: "the cat sat on the mat",
        2: "zebra quantum flux discombobulated",
        3: "The--CAT!! sat;; on the RUG",
        4: "",
    }
    lam = 0.9
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.execute("CREATE TABLE ref(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", sorted(docs.items()))
    con.executemany("INSERT INTO ref VALUES (?, ?)", sorted(REF_DOCS.items()))
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(LM_ORACLE_SQL.format(lam=lam, oml=1.0 - lam)).fetchall()
    }
    got = _collect(spark, docs, ref=REF_DOCS, lam=lam)
    assert set(got) == set(want)
    for i in want:
        assert (got[i][0], got[i][1]) == (want[i][0], want[i][1])
        if want[i][2] is None:
            assert got[i][2] is None
        else:
            assert got[i][2] == pytest.approx(want[i][2], abs=1e-5)


def test_perplexity_band_middle_keep_rule(spark):
    mid = [(i, "the cat sat on the mat and the dog ran here today") for i in range(5)]
    docs = dict(
        mid
        + [
            # verbatim reference sentence -> lowest perplexity -> low band
            (50, "the cat sat on the mat and the dog sat on the rug"),
            (51, "qq ww ee rr tt yy uu ii oo pp"),  # soup -> high
            (52, "x"),  # no bigrams -> NULL band
        ]
    )
    df = spark.createDataFrame(sorted(docs.items()), ["doc_id", "text"])
    rdf = spark.createDataFrame(sorted(REF_DOCS.items()), ["doc_id", "text"])
    out = perplexity_band(df, "doc_id", "text", 0.2, 0.8, ref=rdf)
    got = {r["id"]: r["band"] for r in out.collect()}
    release(out)
    assert got[50] == "low"
    assert got[51] == "high"
    assert got[52] is None
    assert all(got[i] == "keep" for i, _ in mid)


def test_lm_plan_shape(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "a b d")], ["doc_id", "text"])
    plan = (
        bigram_cross_entropy(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the only cartesian-ish element is the 1-row broadcast totals join
    assert "CartesianProduct" not in plan


def test_lm_rejects_bad_lambda(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            bigram_cross_entropy(df, "doc_id", "text", lam=bad)
