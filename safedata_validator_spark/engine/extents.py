"""Extent rules: aggregated min/max vs hard/soft bounds.

Reference analogue: the ``Extent`` class (extent.py:22-161) — running min/max
folded across chunks, ERROR outside hard bounds, WARNING outside soft bounds
(extent.py:141-161). In Spark the fold is a single ``agg(min, max)`` — partial
aggregation makes the merge treewise for free — and the bound comparison is an
expression over the one-row-per-scope aggregate. (The reference has an
initialisation bug at field.py:2129, ``self.max = min(data)``; deliberately not
replicated, covered by test_extents.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_validator_spark.engine.common import as_violations
from safedata_validator_spark.rules.model import Rule


def extent_aggs(rules: list[Rule]) -> list:
    """Typed min/max/count aggregate expressions for every column referenced by
    an extent rule — contributed to the validator's shared per-scope
    aggregation (one scan serves extents, profile and verdict row counts)."""
    aggs = []
    for c in sorted({r.column for r in rules}):
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}"), F.count(c).alias(f"__n_{c}")]
    return aggs


def extents_from_agg(agg: DataFrame, rules: list[Rule]) -> list[DataFrame]:
    """Bound predicates over a prebuilt per-scope aggregate carrying
    ``__scope`` plus the ``extent_aggs`` columns."""
    out = []
    for rule in rules:
        c = rule.column
        lo = rule.params.get("lo")
        hi = rule.params.get("hi")
        breach = F.lit(False)
        if lo is not None:
            breach = breach | (F.col(f"__min_{c}") < F.lit(lo))
        if hi is not None:
            breach = breach | (F.col(f"__max_{c}") >= F.lit(hi))
        bad = agg.where(F.col(f"__n_{c}") > 0).where(breach)
        msg = F.concat(
            F.lit(f"{c} extent ["),
            F.col(f"__min_{c}").cast("string"),
            F.lit(", "),
            F.col(f"__max_{c}").cast("string"),
            F.lit(f"] breaches bounds [{lo}, {hi})"),
        )
        entity = F.concat(
            F.lit("scope="), F.coalesce(F.col("__scope").cast("string"), F.lit("∅"))
        )
        value = F.concat(
            F.col(f"__min_{c}").cast("string"), F.lit(".."), F.col(f"__max_{c}").cast("string")
        )
        out.append(as_violations(bad, rule, F.col("__scope"), entity, value, msg))
    return out


def eval_extents_fused(df: DataFrame, rules: list[Rule], ruleset) -> list[DataFrame]:
    """ALL extent rules in ONE agg: min/max of every referenced column in a
    single scan (the fold is associative; partial aggregation merges
    treewise), then each rule's bound predicate filters the one-row-per-scope
    aggregate. The validator routes every extent rule here (and, inside a
    full ``validate`` run, shares the aggregate with the profiler instead)."""
    agg = df.groupBy(F.expr(ruleset.scope).cast("string").alias("__scope")).agg(
        *extent_aggs(rules)
    )
    return extents_from_agg(agg, rules)


def congruence_from_agg(agg: DataFrame, rules: list[Rule]) -> list[DataFrame]:
    """Declared-vs-computed extent congruence over the shared per-scope
    aggregate — the engine form of the reference's final_checks extent audit
    (field.py:283-318):

    * data outside the declared [lo, hi] → violation at rule.severity
      ("values from the data fall outside the extents set in the Summary");
    * both declared and populated-from-data, data within → WARNING advisory
      when ``params['advisory']`` (the reference's "may be deliberate!"
      warning) — off by default so clean runs stay violation-free;
    * nothing declared AND no data → violation at rule.severity (the
      reference's "extent not set from data or provided in summary").

    Unlike the bounds rule (exclusive hi), congruence is inclusive on both
    ends, matching the reference's ``dataset.extent[1] > summary.extent[1]``.
    """
    out = []
    for rule in rules:
        c = rule.column
        lo = rule.params.get("declared_lo")
        hi = rule.params.get("declared_hi")
        advisory = bool(rule.params.get("advisory", False))
        n, mn, mx = F.col(f"__n_{c}"), F.col(f"__min_{c}"), F.col(f"__max_{c}")
        entity = F.concat(
            F.lit("scope="), F.coalesce(F.col("__scope").cast("string"), F.lit("∅"))
        )
        value = F.concat(mn.cast("string"), F.lit(".."), mx.cast("string"))
        declared = lo is not None or hi is not None
        if declared:
            breach = F.lit(False)
            if lo is not None:
                breach = breach | (mn < F.lit(lo))
            if hi is not None:
                breach = breach | (mx > F.lit(hi))
            bad = agg.where((n > 0) & breach)
            msg = F.concat(
                F.lit(f"{c} extent from the data ["),
                value,
                F.lit(f"] falls outside the declared extent [{lo}, {hi}]"),
            )
            out.append(as_violations(bad, rule, F.col("__scope"), entity, value, msg))
            if advisory:
                within = agg.where((n > 0) & ~breach)
                out.append(
                    as_violations(
                        within,
                        rule,
                        F.col("__scope"),
                        entity,
                        value,
                        f"{c} extent is declared but also populated from the data "
                        "- this may be deliberate",
                        severity="WARNING",
                    )
                )
        else:
            unset = agg.where(n == 0)
            out.append(
                as_violations(
                    unset,
                    rule,
                    F.col("__scope"),
                    entity,
                    F.lit(None),
                    f"{c} extent not set from data or declared in the manifest",
                )
            )
    return out


def eval_extent_congruence(df: DataFrame, rule: Rule, ruleset, dims) -> DataFrame:
    """Standalone path (outside a full validate() run): one min/max agg then
    the congruence predicates. params: declared_lo / declared_hi (both
    inclusive; from the run manifest's declared extents), advisory (bool)."""
    from functools import reduce

    agg = df.groupBy(F.expr(ruleset.scope).cast("string").alias("__scope")).agg(
        *extent_aggs([rule])
    )
    parts = congruence_from_agg(agg, [rule])
    return reduce(lambda a, b: a.unionByName(b), parts)


def eval_extent(df: DataFrame, rule: Rule, ruleset, dims) -> DataFrame:
    """params: lo / hi (hard bounds, inclusive-lo / exclusive-hi) — violation
    at rule.severity when the observed extent crosses them. Use two extent
    rules (one ERROR 'hard', one WARNING 'soft') for the reference's two-tier
    bound semantics (extent.py:144-156)."""
    col = rule.column
    lo = rule.params.get("lo")
    hi = rule.params.get("hi")
    scope = F.expr(ruleset.scope)

    agg = df.groupBy(scope.alias("__scope")).agg(
        F.min(col).alias("__min"), F.max(col).alias("__max"), F.count(col).alias("__n")
    )
    breach = F.lit(False)
    if lo is not None:
        breach = breach | (F.col("__min") < F.lit(lo))
    if hi is not None:
        breach = breach | (F.col("__max") >= F.lit(hi))
    bad = agg.where(F.col("__n") > 0).where(breach)
    msg = F.concat(
        F.lit(f"{col} extent ["),
        F.col("__min").cast("string"),
        F.lit(", "),
        F.col("__max").cast("string"),
        F.lit(f"] breaches bounds [{lo}, {hi})"),
    )
    entity = F.concat(
        F.lit("scope="), F.coalesce(F.col("__scope").cast("string"), F.lit("∅"))
    )
    value = F.concat(F.col("__min").cast("string"), F.lit(".."), F.col("__max").cast("string"))
    return as_violations(bad, rule, F.col("__scope"), entity, value, msg)
