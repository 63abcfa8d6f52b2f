"""Span-level exact-substring dedup (functions/spans.py) vs the
independent pure-Python reference (tools/purepy_ref.duplicated_spans_ref,
exact token tuples — agreement also witnesses hash-collision-freeness on
the corpus), plus plan-shape pins."""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

from safedata_validator_spark.functions.dedup import release
from safedata_validator_spark.functions.spans import (
    duplicated_spans,
    remove_duplicated_spans,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from purepy_ref import duplicated_spans_ref  # noqa: E402


def _spark_spans(spark, docs: dict[int, str], n: int):
    df = spark.createDataFrame(sorted(docs.items()), ["doc_id", "text"])
    out = duplicated_spans(df, "doc_id", "text", n=n)
    got = {
        r["id"]: (
            r["n_tokens"],
            [(s["s"], s["e"]) for s in r["spans"]],
            r["n_dup_tokens"],
        )
        for r in out.collect()
    }
    release(out)
    return got


def _check_against_ref(spark, docs: dict[int, str], n: int):
    toks, spans = duplicated_spans_ref(docs, n=n)
    got = _spark_spans(spark, docs, n)
    assert set(got) == set(docs)
    for i in docs:
        want_tokens = len(toks[i])
        want_spans = spans[i]
        want_dup = sum(e - s + 1 for s, e in want_spans)
        assert got[i] == (want_tokens, want_spans, want_dup), (
            f"doc {i}: got {got[i]}, want {(want_tokens, want_spans, want_dup)}"
        )


BOILER = " ".join(f"b{i}" for i in range(25))


def test_planted_boilerplate_found_and_merged(spark):
    docs = {
        1: "alpha beta " + BOILER + " gamma delta",
        2: "start " + BOILER + " end of doc two",
        3: "totally unique text with many different tokens here indeed",
    }
    got = _spark_spans(spark, docs, n=20)
    # 25 shared tokens = 6 overlapping 20-windows merged to ONE maximal span
    assert got[1] == (29, [(2, 26)], 25)
    assert got[2] == (30, [(1, 25)], 25)
    assert got[3] == (9, [], 0)


def test_exact_duplicate_docs_flag_everything(spark):
    text = " ".join(f"w{i}" for i in range(30))
    got = _spark_spans(spark, {1: text, 2: text}, n=20)
    assert got[1] == (30, [(0, 29)], 30)
    assert got[2] == (30, [(0, 29)], 30)


def test_within_doc_repeat_not_flagged(spark):
    # the same 20-token run twice in ONE doc is repetition, not
    # cross-document duplication (functions/repetition.py's signal)
    run = " ".join(f"r{i}" for i in range(20))
    docs = {1: run + " middle " + run, 2: "something else entirely here"}
    got = _spark_spans(spark, docs, n=20)
    assert got[1][1] == []
    assert got[2][1] == []


def test_short_empty_and_punctuation_docs(spark):
    docs = {
        1: "too short",
        2: "",
        3: None,
        # normalisation folds case/punct: these two share all 4 windows
        4: "The QUICK--brown fox; jumps over the lazy dog!!",
        5: "the quick brown fox jumps over the lazy dog",
    }
    _check_against_ref(spark, {k: v for k, v in docs.items() if v is not None}, n=6)
    got = _spark_spans(spark, docs, n=6)
    assert got[1] == (2, [], 0)
    assert got[2] == (0, [], 0)
    assert got[3] == (0, [], 0)
    assert got[4] == (9, [(0, 8)], 9)
    assert got[5] == (9, [(0, 8)], 9)


def test_remove_duplicated_spans_rebuild(spark):
    docs = {
        1: "alpha beta " + BOILER + " gamma delta",
        2: "start " + BOILER + " end of doc two",
        3: "nothing shared here at all",
    }
    df = spark.createDataFrame(sorted(docs.items()), ["doc_id", "text"])
    out = remove_duplicated_spans(df, "doc_id", "text", n=20)
    got = {r["doc_id"]: r["text_clean"] for r in out.collect()}
    release(out)
    assert got[1] == "alpha beta gamma delta"
    assert got[2] == "start end of doc two"
    assert got[3] == "nothing shared here at all"


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=30),
        min_size=2,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=5),
)
def test_spans_match_purepy_reference(spark, data, n):
    docs = {i: " ".join(toks) for i, toks in enumerate(data)}
    _check_against_ref(spark, docs, n)


def test_plan_shape(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c")], ["doc_id", "text"])
    plan = duplicated_spans(df, "doc_id", "text", n=2)._jdf.queryExecution().executedPlan().toString()
    # span merge/count are Column expressions; detection is hash groupBy +
    # hash join — never Python rows, never a cartesian product
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


SPANS_ORACLE_SQL = """
WITH norm AS (
  SELECT doc_id,
         CASE WHEN trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN []
              ELSE string_split(trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g')), ' ')
         END AS toks
  FROM docs),
wins AS (
  SELECT doc_id, u.pos - 1 AS pos,
         array_to_string(toks[u.pos:u.pos+{n}-1], ' ') AS w
  FROM norm, LATERAL unnest(range(1, greatest(len(toks)-{n}+2, 1))) AS u(pos)),
dup AS (SELECT w FROM wins GROUP BY w HAVING min(doc_id) <> max(doc_id)),
hits AS (SELECT doc_id, pos FROM wins JOIN dup USING (w)),
marks AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= {n}
              THEN 0 ELSE 1 END AS brk
  FROM hits),
isl AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        FROM marks),
merged AS (SELECT doc_id, min(pos) AS s, max(pos)+{n}-1 AS e
           FROM isl GROUP BY doc_id, g),
agg AS (SELECT doc_id,
               list_sort(list(ROW(s, e))) AS spans,
               sum(e - s + 1) AS n_dup
        FROM merged GROUP BY doc_id)
SELECT n.doc_id,
       len(n.toks) AS n_tokens,
       coalesce(a.spans, []) AS spans,
       coalesce(a.n_dup, 0) AS n_dup_tokens
FROM norm n LEFT JOIN agg a USING (doc_id)
ORDER BY n.doc_id
"""


def test_spans_match_duckdb_sql_oracle(spark):
    """Full ANSI-ish SQL oracle (DuckDB): windows by list slicing,
    duplicate windows by HAVING over the window TEXT (no hashing — also
    re-witnesses collision-freeness), span merge by gaps-and-islands."""
    import duckdb

    boiler = " ".join(f"b{i}" for i in range(11))
    docs = {
        1: "alpha beta " + boiler + " gamma " + boiler + " delta",  # two islands
        2: "start " + boiler + " end of doc two",
        3: boiler,  # the whole doc is one duplicated span
        4: "Unique; PUNCT--uated text!! with curious casing",
        5: "unique punct uated text with curious casing",  # normalises equal to 4
        6: "",
    }
    n = 8
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", sorted(docs.items()))
    want = {
        r[0]: (r[1], [tuple(sp) for sp in r[2]], r[3])
        for r in con.sql(SPANS_ORACLE_SQL.format(n=n)).fetchall()
    }
    got = _spark_spans(spark, docs, n)
    # SQL norm counts the empty doc's token list as [] -> 0, same as Spark
    assert got == want


# ------------------------------------------- surgical decontamination

from safedata_validator_spark.functions.spans import (  # noqa: E402
    decontaminated_spans,
    remove_decontaminated_spans,
)
from purepy_ref import decontaminated_spans_ref  # noqa: E402

EVAL_PASSAGE = " ".join(f"eval tok {i}" for i in range(8))  # 24 tokens


def _spark_decon_spans(spark, train, eval_docs, n):
    tdf = spark.createDataFrame(sorted(train.items()), ["doc_id", "text"])
    edf = spark.createDataFrame(sorted(eval_docs.items()), ["doc_id", "text"])
    out = decontaminated_spans(tdf, edf, "doc_id", "text", n=n)
    got = {
        r["id"]: [(s["s"], s["e"]) for s in r["spans"]] for r in out.collect()
    }
    release(out)
    return got


def test_decon_spans_flag_only_leaked_docs(spark):
    train = {
        1: "intro words " + EVAL_PASSAGE + " outro words",
        2: "totally clean document with no leak at all here",
        3: EVAL_PASSAGE,  # the whole doc is the eval passage
    }
    eval_docs = {9: "前" * 0 + EVAL_PASSAGE + " plus more eval only content"}
    got = _spark_decon_spans(spark, train, eval_docs, n=20)
    toks, want = decontaminated_spans_ref(train, eval_docs, n=20)
    assert got == want
    assert set(got) == {1, 3}  # doc 2 (clean) omitted from the output
    assert got[1] == [(2, 25)]
    assert got[3] == [(0, 23)]


def test_remove_decon_spans_excises_leak_keeps_rest(spark):
    train = {
        1: "intro words " + EVAL_PASSAGE + " outro words",
        2: "totally clean document stays as its normalised self",
        3: EVAL_PASSAGE,
    }
    eval_docs = {9: EVAL_PASSAGE}
    tdf = spark.createDataFrame(sorted(train.items()), ["doc_id", "text"])
    edf = spark.createDataFrame(sorted(eval_docs.items()), ["doc_id", "text"])
    out = remove_decontaminated_spans(tdf, edf, "doc_id", "text", n=20)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["text_clean"])
        for r in out.collect()
    }
    release(out)
    assert got[1] == (28, 24, "intro words outro words")
    assert got[2] == (8, 0, "totally clean document stays as its normalised self")
    assert got[3] == (24, 24, "")


@settings(max_examples=10, deadline=None)
@given(
    train=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=25),
        min_size=1,
        max_size=4,
    ),
    evals=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=25),
        min_size=1,
        max_size=3,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_decon_spans_match_purepy(spark, train, evals, n):
    tdocs = {i: " ".join(t) for i, t in enumerate(train)}
    edocs = {100 + i: " ".join(t) for i, t in enumerate(evals)}
    got = _spark_decon_spans(spark, tdocs, edocs, n)
    _, want = decontaminated_spans_ref(tdocs, edocs, n=n)
    assert got == want


def test_decon_plan_broadcasts_eval_side(spark):
    tdf = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    edf = spark.createDataFrame([(9, "a b c e")], ["doc_id", "text"])
    plan = (
        decontaminated_spans(tdf, edf, "doc_id", "text", n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the 100-TB side's window match must ride a broadcast, not a shuffle
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
