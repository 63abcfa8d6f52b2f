"""Referential-integrity rules: membership against dimension tables, alias
resolution, and declared-vs-used level audits.

Reference analogues: unknown-location detection (locations.py:453-461,
key-set build locations.py:69-72), alias resolution with WARNING on use
(locations.py:463-474), used⊆provided double anti-joins for locations/taxa
(field.py:232-267), categorical level audit (field.py:1619-1631), external
file membership (field.py:2206-2238).

Scale design: dimensions are small (gazetteers, tool registries, level sets)
— every membership check is a count per distinct value on the fact side
followed by a **broadcast** anti/semi join, so the fact table is partially
aggregated map-side to its distinct values and never shuffled against the
dimension. The reference's parent-memoization dict (taxa.py:1223-1275) is
subsumed by the aggregation.

Inside a full ``validate`` run, ALL categorical rules (level audits +
referential membership, any number of columns) share ONE fact pass: values
are stacked into (column, value) rows, counted per scope in a single
aggregation (``categorical_counts``), and the tiny result is cached — each
rule then derives its violations from the cached counts with broadcast
joins only. Standalone ``eval_*`` entry points build a single-column counts
plan themselves.
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


def canon_str(col, dtype):
    """Canonical string rendering for membership comparison. Fact values and
    dim keys meet in the counts cache as STRINGS, so mixed numeric types must
    render identically: an integral-valued float/double/decimal renders
    without its fractional suffix (DOUBLE 1.0 → '1', matching dim INT 1 the
    way Spark's native join coercion would). Non-integral and out-of-long
    values keep their plain rendering; try_cast keeps ANSI mode happy."""
    from pyspark.sql.types import DecimalType, DoubleType, FloatType

    if isinstance(dtype, (DoubleType, FloatType, DecimalType)):
        as_long = col.try_cast("bigint")
        return F.when(
            col.isNotNull()
            & as_long.isNotNull()
            & (col == as_long.cast(dtype.simpleString())),
            as_long.cast("string"),
        ).otherwise(col.cast("string"))
    return col.cast("string")


def _canon_col(df: DataFrame, column: str):
    return canon_str(F.col(column), df.schema[column].dataType)


def canon_dim_key(dim: DataFrame, key: str) -> DataFrame:
    """Distinct dimension keys in the same canonical rendering → (__val)."""
    return dim.select(_canon_col(dim, key).alias("__val")).distinct()


def canon_dim_key_membership(dim: DataFrame, key: str) -> DataFrame:
    """Dim keys for the MEMBERSHIP anti-join: the canonical rendering PLUS,
    for string-typed keys, a numeric canonicalization of numeric-looking
    values ('1.0' → '1', '1.50' → '1.5'). Spark's native join coercion casts
    both sides to double when a numeric fact meets a string dim — a DOUBLE
    fact 1.0 must match a STRING dim key '1.0', which the plain string
    rendering misses (ADVICE r02). Extra renderings only ever widen the
    accepted set, so this stays out of the levels-audit path (where a
    never-used extra rendering would be a false 'declared level never used'
    warning)."""
    from pyspark.sql.types import DoubleType, StringType

    raw = canon_dim_key(dim, key)
    if not isinstance(dim.schema[key].dataType, StringType):
        return raw
    as_num = canon_str(F.col(key).try_cast("double"), DoubleType())
    numeric = (
        dim.select(as_num.alias("__val"))
        .where(F.col("__val").isNotNull())
        .distinct()
    )
    return raw.unionByName(numeric).distinct()


def categorical_counts(df: DataFrame, scope_expr: str, columns: list[str]) -> DataFrame:
    """ONE scan serving every categorical rule: stack the audited columns into
    (column-name, value) rows and count per scope. Output volume is bounded by
    sum of per-column distinct cardinalities × scopes — tiny for categorical
    columns — so the validator caches it and every audit below becomes a
    broadcast join over cached rows, never a new fact pass. Values render via
    ``canon_str`` so numeric fact columns compare correctly with numeric dim
    keys of a different width."""
    cols = sorted(set(columns))
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("__col"), _canon_col(df, c).alias("__val"))
            for c in cols
        ]
    )
    return (
        df.select(
            F.expr(scope_expr).cast("string").alias("__scope"),
            F.explode(pairs).alias("__p"),
        )
        .select("__scope", F.col("__p.__col").alias("__col"), F.col("__p.__val").alias("__val"))
        .groupBy("__scope", "__col", "__val")
        .agg(F.count(F.lit(1)).alias("__n"))
    )


def column_counts(df: DataFrame, scope_expr: str, column: str) -> DataFrame:
    """Single-column counts in the ``categorical_counts`` shape (standalone
    rule evaluation — no stack needed)."""
    return (
        df.select(
            F.expr(scope_expr).cast("string").alias("__scope"),
            F.lit(column).alias("__col"),
            _canon_col(df, column).alias("__val"),
        )
        .groupBy("__scope", "__col", "__val")
        .agg(F.count(F.lit(1)).alias("__n"))
    )


def ref_integrity_from_counts(counts: DataFrame, rule: Rule, dims: dict) -> DataFrame:
    """Membership of ``rule.column`` values (pre-counted per scope) in
    dimension ``dim[dim_key]``; optional alias table produces WARNINGs
    (reference locations.py:463-474). ``counts`` must carry the rule's column
    only (the validator slices the shared cache by ``__col``).

    Emits one violation per distinct (scope, value) with an occurrence count
    — at 10^12 rows, per-row violation output for a systematically-bad value
    would itself be petabytes; counts + exemplar entity match the reference's
    set-style reporting ("unknown locations found: {...}").
    """
    dim = _dim(dims, rule.params["dim"])
    dim_key = rule.params["dim_key"]
    ignore_null = bool(rule.params.get("ignore_null", True))
    col = rule.column

    counted = counts.where(F.col("__val").isNotNull()) if ignore_null else counts
    unknown = counted.join(
        F.broadcast(canon_dim_key_membership(dim, dim_key)),
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
            _canon_col(alias, alias_key).alias("__val"),
            _canon_col(alias, alias_primary).alias("__primary"),
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
            F.concat(F.lit(f"{col}="), F.coalesce(F.col("__val"), F.lit("∅"))),
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


def levels_audit_from_counts(counts: DataFrame, rule: Rule, dims: dict) -> DataFrame:
    """Set-vs-set audit of pre-counted categorical values against declared
    levels — BOTH directions, like the reference (field.py:1619-1631): values
    outside the declared set are ERRORs; declared levels never used are
    WARNINGs (per scope). params: levels: list[str] OR dim/dim_key;
    unused_severity."""
    col = rule.column
    spark = counts.sparkSession

    if "levels" in rule.params:
        levels_df = spark.createDataFrame(
            [(str(v),) for v in rule.params["levels"]], "__level string"
        )
    else:
        levels_df = (
            canon_dim_key(_dim(dims, rule.params["dim"]), rule.params["dim_key"])
            .withColumnRenamed("__val", "__level")
        )

    used = counts.where(F.col("__val").isNotNull())

    undeclared = used.join(
        F.broadcast(levels_df.withColumnRenamed("__level", "__val")), "__val", "left_anti"
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
        "__scope", F.col("__level").alias("__val")
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


def eval_ref_integrity(df: DataFrame, rule: Rule, ruleset, dims) -> DataFrame:
    """Standalone entry point (registry): one fact pass for this rule only."""
    counts = column_counts(df, ruleset.scope, rule.column)
    return ref_integrity_from_counts(counts, rule, dims)


def eval_levels_audit(df: DataFrame, rule: Rule, ruleset, dims) -> DataFrame:
    """Standalone entry point (registry): one fact pass for this rule only."""
    counts = column_counts(df, ruleset.scope, rule.column)
    return levels_audit_from_counts(counts, rule, dims)
