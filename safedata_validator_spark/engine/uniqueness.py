"""Composite-key uniqueness — reference HasDuplicates (validators.py:412-445)
and the composite-key checks it powers (field-name uniqueness field.py:577-584,
location dupes locations.py:234-239, taxon dupes taxa.py:1048-1053).

Spark-first: ``groupBy(keys).count() > 1`` — a partial-aggregating shuffle on
the key, no window, no sort. At 10^12 rows this is the cheapest possible shape:
map-side combine collapses each partition's duplicates before the exchange, so
shuffle volume is bounded by distinct keys, not rows. Skewed keys are exactly
the interesting output (they ARE the duplicates), so no salting is needed —
the combiner already collapsed them map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_validator_spark.engine.common import as_violations
from safedata_validator_spark.rules.model import Rule


def unique_from_counts(counts: DataFrame, rule: Rule, group: str, order: str) -> DataFrame:
    """Duplicate-key violations derived from a shared ordering.key_counts
    plan — the validator routes (group, order)-shaped unique_key rules here
    so the shuffle is reused (ReuseExchange) with the sequential rule."""
    dupes = counts.where(F.col("__dup_n") > 1)
    entity = F.concat_ws(
        "/",
        F.concat(F.lit(f"{group}="), F.coalesce(F.col(group).cast("string"), F.lit("∅"))),
        F.concat(F.lit(f"{order}="), F.coalesce(F.col(order).cast("string"), F.lit("∅"))),
    )
    return as_violations(
        dupes,
        rule,
        scope=F.col("__scope"),
        entity=entity,
        value=F.col("__dup_n"),
        message=F.concat(F.lit("duplicate key: "), F.col("__dup_n").cast("string"), F.lit(" occurrences")),
        column=f"{group},{order}",
    )


def eval_unique_key(df: DataFrame, rule: Rule, ruleset, dims) -> DataFrame:
    """params: keys: list[str] (defaults to ruleset.key_cols)."""
    keys = list(rule.params.get("keys", ruleset.key_cols))
    scope = F.expr(ruleset.scope)

    dupes = (
        df.groupBy(*[F.col(k) for k in keys], scope.alias("__scope"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
    )
    entity = F.concat_ws(
        "/", *[F.concat(F.lit(f"{k}="), F.coalesce(F.col(k).cast("string"), F.lit("∅"))) for k in keys]
    )
    return as_violations(
        dupes,
        rule,
        scope=F.col("__scope"),
        entity=entity,
        value=F.col("__n"),
        message=F.concat(F.lit("duplicate key: "), F.col("__n").cast("string"), F.lit(" occurrences")),
        column=",".join(keys),
    )
