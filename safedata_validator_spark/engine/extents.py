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
