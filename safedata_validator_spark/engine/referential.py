"""Referential-integrity rules: membership against dimension tables, alias
resolution, and declared-vs-used level audits.

Reference analogues: unknown-location detection (locations.py:453-461,
key-set build locations.py:69-72), alias resolution with WARNING on use
(locations.py:463-474), used⊆provided double anti-joins for locations/taxa
(field.py:232-267), categorical level audit (field.py:1619-1631), external
file membership (field.py:2206-2238).

Scale design: dimensions are small (gazetteers, tool registries, level sets)
— every membership check is ``distinct()`` on the fact side followed by a
**broadcast** anti/semi join, so the fact table is scanned once, partially
aggregated map-side to its distinct values, and never shuffled against the
dimension. The reference's parent-memoization dict (taxa.py:1223-1275) is
subsumed by the ``distinct()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_validator_spark.engine.common import as_violations
from safedata_validator_spark.rules.model import Rule


def _dim(dims: dict[str, DataFrame], name: str) -> DataFrame:
    try:
        return dims[name]
    except KeyError:
        raise KeyError(f"rule references unknown dimension {name!r}; have {sorted(dims)}") from None


def eval_ref_integrity(df: DataFrame, rule: Rule, ruleset, dims) -> DataFrame:
    """Values of ``rule.column`` must exist in dimension ``dim[dim_key]``.

    params: dim (dimension name), dim_key (column in the dimension),
    alias_dim / alias_key / alias_primary (optional alias table: values that
    match an alias instead of a primary name produce a WARNING violation,
    reference locations.py:463-474), ignore_null (default True).

    Emits one violation per distinct (scope, value) with an occurrence count
    — at 10^12 rows, per-row violation output for a systematically-bad value
    would itself be petabytes; counts + exemplar entity match the reference's
    set-style reporting ("unknown locations found: {...}").
    """
    dim = _dim(dims, rule.params["dim"])
    dim_key = rule.params["dim_key"]
    ignore_null = bool(rule.params.get("ignore_null", True))
    scope = F.expr(ruleset.scope)
    col = rule.column

    fact = df.select(F.col(col).alias("__val"), scope.alias("__scope"))
    if ignore_null:
        fact = fact.where(F.col("__val").isNotNull())
    counted = fact.groupBy("__scope", "__val").agg(F.count(F.lit(1)).alias("__n"))

    unknown = counted.join(
        F.broadcast(dim.select(F.col(dim_key).alias("__val")).distinct()),
        on="__val",
        how="left_anti",
    )

    out = []
    alias_dim_name = rule.params.get("alias_dim")
    if alias_dim_name:
        alias = _dim(dims, alias_dim_name)
        alias_key = rule.params.get("alias_key", "alias")
        alias_primary = rule.params.get("alias_primary", dim_key)
        amap = alias.select(
            F.col(alias_key).alias("__val"), F.col(alias_primary).alias("__primary")
        ).distinct()
        aliased = unknown.join(F.broadcast(amap), on="__val", how="inner")
        unknown = unknown.join(F.broadcast(amap.select("__val")), on="__val", how="left_anti")
        alias_rule = Rule(
            rule_id=rule.rule_id + ".alias",
            rule_type=rule.rule_type,
            column=rule.column,
            severity="WARNING",
            params=rule.params,
        )
        out.append(
            as_violations(
                aliased,
                alias_rule,
                F.col("__scope"),
                F.concat(F.lit(f"{col}="), F.col("__val")),
                F.col("__val"),
                F.concat(
                    F.lit("alias used for "),
                    F.col("__primary"),
                    F.lit(" ("),
                    F.col("__n").cast("string"),
                    F.lit(" rows)"),
                ),
            )
        )

    out.append(
        as_violations(
            unknown,
            rule,
            F.col("__scope"),
            F.concat(F.lit(f"{col}="), F.coalesce(F.col("__val").cast("string"), F.lit("∅"))),
            F.col("__val"),
            F.concat(
                F.lit(f"{col} not in dimension {rule.params['dim']} ("),
                F.col("__n").cast("string"),
                F.lit(" rows)"),
            ),
        )
    )
    res = out[0]
    for extra in out[1:]:
        res = res.unionByName(extra)
    return res


def eval_levels_audit(df: DataFrame, rule: Rule, ruleset, dims) -> DataFrame:
    """Set-vs-set audit of a categorical column against declared levels —
    BOTH directions, like the reference (field.py:1619-1631): values outside
    the declared set are ERRORs; declared levels never used are WARNINGs
    (per scope). params: levels: list[str] OR dim/dim_key; unused_severity.
    """
    scope = F.expr(ruleset.scope)
    col = rule.column
    spark = df.sparkSession

    if "levels" in rule.params:
        levels_df = spark.createDataFrame(
            [(str(v),) for v in rule.params["levels"]], f"{col}_level string"
        )
    else:
        levels_df = (
            _dim(dims, rule.params["dim"])
            .select(F.col(rule.params["dim_key"]).cast("string").alias(f"{col}_level"))
            .distinct()
        )

    used = (
        df.select(F.col(col).cast("string").alias("__val"), scope.alias("__scope"))
        .where(F.col("__val").isNotNull())
        .groupBy("__scope", "__val")
        .agg(F.count(F.lit(1)).alias("__n"))
    )

    undeclared = used.join(
        F.broadcast(levels_df.withColumnRenamed(f"{col}_level", "__val")), "__val", "left_anti"
    )
    undeclared_v = as_violations(
        undeclared,
        rule,
        F.col("__scope"),
        F.concat(F.lit(f"{col}="), F.col("__val")),
        F.col("__val"),
        F.concat(F.lit("undeclared level ("), F.col("__n").cast("string"), F.lit(" rows)")),
    )

    # scopes derived from the aggregated side — no second scan of the fact
    # table (a scope whose column is entirely NULL has nothing to audit)
    scopes = used.select("__scope").distinct()
    declared_per_scope = scopes.crossJoin(F.broadcast(levels_df)).select(
        "__scope", F.col(f"{col}_level").alias("__val")
    )
    unused = declared_per_scope.join(used.select("__scope", "__val"), ["__scope", "__val"], "left_anti")
    unused_rule = Rule(
        rule_id=rule.rule_id + ".unused",
        rule_type=rule.rule_type,
        column=col,
        severity=rule.params.get("unused_severity", "WARNING"),
        params=rule.params,
    )
    unused_v = as_violations(
        unused,
        unused_rule,
        F.col("__scope"),
        F.concat(F.lit(f"{col}="), F.col("__val")),
        F.col("__val"),
        F.lit("declared level never used"),
    )
    return undeclared_v.unionByName(unused_v)
