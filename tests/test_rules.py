"""Unit tests per compiled rule expression on tiny DataFrames — the analogue
of the reference's log-assertion unit tests (test/test_validators.py,
test/test_field.py): assert on violation rows instead of log text."""

from __future__ import annotations

from pyspark.sql import functions as F

from safedata_validator_spark.engine.validator import ValidationEngine
from safedata_validator_spark.rules.model import ERROR, WARNING, Rule, RuleSet

ENGINE = ValidationEngine()


def _ruleset(*rules, key_cols=None):
    return RuleSet(name="t", rules=list(rules), key_cols=key_cols or ["id"])


def _viols(spark, data, ddl, *rules, key_cols=None):
    df = spark.createDataFrame(data, ddl)
    rs = _ruleset(*rules, key_cols=key_cols)
    return ENGINE.violations(df, rs).collect()


def test_not_blank(spark):
    got = _viols(
        spark,
        [(1, "ok"), (2, None), (3, ""), (4, "   "), (5, "x")],
        "id int, v string",
        Rule("r", "not_blank", column="v"),
    )
    assert sorted(v["entity"] for v in got) == ["id=2", "id=3", "id=4"]
    assert all(v["severity"] == ERROR and v["rule_id"] == "r" for v in got)


def test_not_na_and_excel_error(spark):
    got = _viols(
        spark,
        [(1, "NA"), (2, "na"), (3, "#DIV/0!"), (4, "fine")],
        "id int, v string",
        Rule("na", "not_na", column="v", severity=WARNING),
        Rule("xl", "no_excel_error", column="v"),
    )
    by_rule = {(v["rule_id"], v["entity"]) for v in got}
    assert by_rule == {("na", "id=1"), ("xl", "id=3")}


def test_not_padded(spark):
    got = _viols(
        spark,
        [(1, " x"), (2, "x "), (3, "x"), (4, None), (5, " ")],
        "id int, v string",
        Rule("r", "not_padded", column="v"),
    )
    # ' ' trims to '' ≠ ' ' → padded too (blankness is a separate rule)
    assert sorted(v["entity"] for v in got) == ["id=1", "id=2", "id=5"]


def test_in_levels(spark):
    got = _viols(
        spark,
        [(1, "a"), (2, "b"), (3, "C"), (4, None)],
        "id int, v string",
        Rule("r", "in_levels", column="v", params={"levels": ["a", "b"]}),
    )
    assert sorted(v["entity"] for v in got) == ["id=3", "id=4"]
    got2 = _viols(
        spark,
        [(4, None)],
        "id int, v string",
        Rule("r", "in_levels", column="v", params={"levels": ["a"], "allow_null": True}),
    )
    assert got2 == []


def test_pattern_and_numeric_string(spark):
    got = _viols(
        spark,
        [(1, "a,b"), (2, "ab"), (3, "12.5"), (4, "x2")],
        "id int, v string",
        Rule("punct", "pattern", column="v", params={"regex": "[,;:]", "negate": True}),
        Rule("num", "numeric_string", column="v", severity=WARNING),
    )
    by_rule = {(v["rule_id"], v["entity"]) for v in got}
    assert by_rule == {("punct", "id=1"), ("num", "id=3")}


def test_castable_and_bounds(spark):
    got = _viols(
        spark,
        [(1, "2024-01-01", 5.0), (2, "not a date", 50.0), (3, None, -1.0)],
        "id int, d string, x double",
        Rule("cast", "castable", column="d", params={"to": "date"}),
        Rule("b", "bounds", column="x", params={"lo": 0.0, "hi": 10.0}),
    )
    by_rule = {(v["rule_id"], v["entity"]) for v in got}
    assert by_rule == {("cast", "id=2"), ("b", "id=2"), ("b", "id=3")}


def test_expr_rule(spark):
    got = _viols(
        spark,
        [(1, "tool", "bash"), (2, "user", "bash"), (3, "user", None)],
        "id int, role string, tool string",
        Rule("r", "expr", column="tool",
             params={"sql": "tool IS NULL OR role = 'tool'", "message": "bad tool turn"}),
    )
    assert [v["entity"] for v in got] == ["id=2"]
    assert got[0]["message"] == "bad tool turn"


def test_lint_rejects_unknown(spark):
    df = spark.createDataFrame([(1,)], "id int")
    rs = _ruleset(Rule("r", "no_such_type", column="id"))
    try:
        ENGINE.violations(df, rs)
        raise AssertionError("expected lint failure")
    except ValueError as e:
        assert "no_such_type" in str(e)


def test_verdicts_zero_fill(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], "id int, v string")
    rs = _ruleset(
        Rule("blank", "not_blank", column="v"),
        Rule("na", "not_na", column="v", severity=WARNING),
    )
    res = ENGINE.validate(df, rs, with_stats=False)
    verd = {r["rule_id"]: r for r in res.verdicts.collect()}
    assert verd["blank"]["n_failed"] == 1 and not verd["blank"]["passed"]
    assert verd["na"]["n_failed"] == 0 and verd["na"]["passed"]
    assert verd["na"]["n_rows"] == 2
    assert not res.passed()


def test_format_pattern_presets(spark):
    """Reference Summary regex battery (summary.py:27-31) + R-name grammar
    (validators.py:50-95) as engine rules over a matrix of good/bad values."""
    from safedata_validator_spark.rules import patterns as P
    from safedata_validator_spark.rules.model import RuleSet
    from safedata_validator_spark.engine.validator import ValidationEngine

    rows = [
        # (id, name, email, orcid, doi, rname)
        (1, "Darwin, Charles", "a@b.org", "0000-0002-1825-0097", "https://doi.org/10.1/x", "my.var"),
        (2, "Charles Darwin", "not-an-email", "0000-0002-1825-009", "ftp://doi.org/10.1/x", "_bad"),
        (3, "A, B", "x@y.io", "0000-0002-1825-009X", "http://dx.doi.org/10.2/y", "..1"),
        (4, "no comma here", "a@b", "0000-0002-1825-00971", "https://doi.org/", "for"),
        (5, "L, F", "p@q.co", "0000-0002-1825-0097", "https://doi.org/10.3/z", "x2_ok.name"),
    ]
    df = spark.createDataFrame(
        rows, "id int, name string, email string, orcid string, doi string, rname string"
    )
    rs = RuleSet(
        name="fmt", key_cols=["id"],
        rules=[
            P.name_format_rule("name.fmt", "name"),
            P.email_format_rule("email.fmt", "email"),
            P.orcid_format_rule("orcid.fmt", "orcid"),
            P.doi_format_rule("doi.fmt", "doi"),
            P.r_name_rule("rname.fmt", "rname"),
        ],
    )
    viols = ValidationEngine().violations(df, rs).collect()
    got = {(v["rule_id"], v["entity"]) for v in viols}
    want = {
        ("name.fmt", "id=2"), ("name.fmt", "id=4"),
        ("email.fmt", "id=2"), ("email.fmt", "id=4"),
        ("orcid.fmt", "id=2"), ("orcid.fmt", "id=4"),
        ("doi.fmt", "id=2"), ("doi.fmt", "id=4"),
        ("rname.fmt", "id=2"), ("rname.fmt", "id=3"), ("rname.fmt", "id=4"),
    }
    assert got == want

    # DMS smell: matching the punctuation IS the violation (negated pattern)
    dms = spark.createDataFrame(
        [(1, "51°28'38\"N"), (2, "51.4772")], "id int, coord string"
    )
    rs2 = RuleSet(name="dms", key_cols=["id"],
                  rules=[P.dms_smell_rule("coord.dms", "coord")])
    got2 = {v["entity"] for v in ValidationEngine().violations(dms, rs2).collect()}
    assert got2 == {"id=1"}


def test_validate_empty_input(spark, dims):
    """Zero-row input: a full validate() run yields no violations, an empty
    verdict grid (no scopes), empty stats, and passes."""
    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.rules.presets import transcript_ruleset

    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    res = ValidationEngine().validate(empty, transcript_ruleset(), dims, with_stats=True)
    assert res.violations.count() == 0
    assert res.verdicts.count() == 0
    assert res.stats.count() == 0
    assert res.passed()


def test_validate_null_scope_rows(spark, dims):
    """Rows whose scope expression evaluates to NULL still get verdicts
    (NULL is a scope value like any other — the reference's per-sheet scoping
    has no such case, so this pins the engine's chosen semantics)."""
    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.rules.model import Rule, RuleSet

    df = spark.createDataFrame(
        [("a", 1, "x"), (None, 2, ""), (None, 3, "y")],
        "grp string, id int, v string",
    )
    rs = RuleSet(
        name="t", key_cols=["id"], scope="grp",
        rules=[Rule("v.not_blank", "not_blank", column="v")],
    )
    res = ValidationEngine().validate(df, rs, with_stats=False)
    verd = {(r["scope"], r["rule_id"]): r for r in res.verdicts.collect()}
    assert verd[(None, "v.not_blank")]["n_failed"] == 1
    assert verd[(None, "v.not_blank")]["n_rows"] == 2
    assert verd[("a", "v.not_blank")]["n_failed"] == 0


def test_membership_coerces_mixed_numeric_types(spark):
    """Membership joins compare canonical string renderings: a DOUBLE fact
    value 1.0 must match a dim INT key 1 (Spark's native join coercion
    semantics, preserved through the counts cache — ADVICE r01)."""
    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.rules.model import Rule, RuleSet

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 2, 2.0), ("c", 3, 2.5), ("d", 4, None)],
        "conv_id string, turn_idx int, code double",
    )
    dims = {"codes": spark.createDataFrame([(1,), (2,)], "code int")}
    rs = RuleSet(
        name="coerce", key_cols=["conv_id", "turn_idx"], scope="'all'",
        rules=[Rule("code.ref_integrity", "ref_integrity", column="code",
                    params={"dim": "codes", "dim_key": "code"})],
    )
    viols = ValidationEngine().validate(df, rs, dims, with_stats=False).violations.collect()
    assert [v["value"] for v in viols] == ["2.5"]


def test_membership_coerces_string_dim_keys(spark):
    """A STRING dim key holding a float rendering ('1.0') must accept a
    DOUBLE fact value 1.0 — Spark's native join coercion casts both sides to
    double and matches (ADVICE r02). Non-numeric and exact string keys keep
    plain string semantics."""
    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.rules.model import Rule, RuleSet

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 2, 2.5), ("c", 3, 9.0)],
        "conv_id string, turn_idx int, code double",
    )
    dims = {"codes": spark.createDataFrame([("1.0",), ("2.50",), ("x",)],
                                           "code string")}
    rs = RuleSet(
        name="coerce3", key_cols=["conv_id", "turn_idx"], scope="'all'",
        rules=[Rule("code.ref_integrity", "ref_integrity", column="code",
                    params={"dim": "codes", "dim_key": "code"})],
    )
    viols = ValidationEngine().validate(df, rs, dims, with_stats=False).violations.collect()
    # 1.0 matches '1.0' (integral), 2.5 matches '2.50' (non-integral
    # numeric), 9.0 matches nothing
    assert [v["value"] for v in viols] == ["9"]


def test_membership_string_facts_stay_exact(spark):
    """String fact vs string dim keeps exact string comparison: the numeric
    renderings only WIDEN the accepted set, never reject an exact match."""
    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.rules.model import Rule, RuleSet

    df = spark.createDataFrame(
        [("a", 1, "001"), ("b", 2, "nope")], "conv_id string, turn_idx int, code string"
    )
    dims = {"codes": spark.createDataFrame([("001",)], "code string")}
    rs = RuleSet(
        name="coerce4", key_cols=["conv_id", "turn_idx"], scope="'all'",
        rules=[Rule("code.ref_integrity", "ref_integrity", column="code",
                    params={"dim": "codes", "dim_key": "code"})],
    )
    viols = ValidationEngine().validate(df, rs, dims, with_stats=False).violations.collect()
    assert [v["value"] for v in viols] == ["nope"]


def test_levels_audit_coerces_mixed_numeric_types(spark):
    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.rules.model import Rule, RuleSet

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, 30.5)],
        "conv_id string, turn_idx int, level double",
    )
    dims = {"levels": spark.createDataFrame([(10,), (20,)], "lv int")}
    rs = RuleSet(
        name="coerce2", key_cols=["conv_id", "turn_idx"], scope="'all'",
        rules=[Rule("level.levels_audit", "levels_audit", column="level",
                    params={"dim": "levels", "dim_key": "lv"})],
    )
    viols = ValidationEngine().validate(df, rs, dims, with_stats=False).violations.collect()
    got = {(v["rule_id"], v["value"]) for v in viols}
    # 30.5 undeclared; declared 20 never used; 10.0 matches declared 10
    assert got == {("level.levels_audit", "30.5"), ("level.levels_audit.unused", "20")}
