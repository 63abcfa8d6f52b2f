"""ValidationEngine — orchestrates rule compilation and evaluation.

Execution shape (cf. SURVEY §3.1 "Spark lifecycle equivalent"):

1. driver lints the rule set (fail fast, analogue of descriptor validation);
2. ALL row-level rules fuse into ONE projection over the fact scan — each
   compiled predicate contributes a conditional violation struct and the
   non-null structs are exploded out; Catalyst sees a single pass, columns
   not referenced by any rule are pruned from the parquet/Iceberg read;
3. plan-level rules (uniqueness, ordering, referential, extents, drift,
   hierarchy) each produce their violations from aggregation/join shapes
   chosen for 10^12-row scale (see their modules);
4. violations union into one DataFrame; verdicts are a groupBy over it,
   zero-filled against the declared rule list (a rule with no violations
   must still report passed=true — the reference's pass verdict is exactly
   "zero ERROR count", field.py:324-342).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from safedata_validator_spark.engine import checkpoint as ckpt
from safedata_validator_spark.engine.common import empty_violations, entity_col
from safedata_validator_spark.engine.profiler import profile
from safedata_validator_spark.rules.compilers import compile_row_rule
from safedata_validator_spark.rules.model import ERROR, Rule, RuleSet
from safedata_validator_spark.rules import registry


@dataclass
class RunResult:
    """Outputs of one validation run. ``violations``/``verdicts`` are the two
    result tables (SURVEY §1.1 'Validation report'); ``stats`` is the
    single-scan column profile."""

    violations: DataFrame
    verdicts: DataFrame
    stats: DataFrame | None
    ruleset_hash: str

    def passed(self) -> bool:
        """Run-level verdict: zero ERROR-severity failures
        (reference field.py:324-342)."""
        return (
            self.violations.where(F.col("severity") == ERROR).limit(1).count() == 0
        )


class ValidationEngine:
    def __init__(self, fail_on_lint: bool = True):
        self.fail_on_lint = fail_on_lint

    # -- row-rule fusion ---------------------------------------------------
    def _row_violations(self, df: DataFrame, ruleset: RuleSet, row_rules: list[Rule]) -> DataFrame:
        checks = [compile_row_rule(r) for r in row_rules]
        structs = [
            F.when(
                chk.predicate,
                F.struct(
                    F.lit(chk.rule.rule_id).alias("rule_id"),
                    F.lit(chk.rule.severity).alias("severity"),
                    F.lit(chk.rule.column or "").alias("column"),
                    chk.value.cast("string").alias("value"),
                    F.lit(chk.message).alias("message"),
                ),
            )
            for chk in checks
        ]
        fused = df.select(
            F.expr(ruleset.scope).cast("string").alias("__scope"),
            entity_col(ruleset.key_cols).alias("__entity"),
            F.array_compact(F.array(*structs)).alias("__v"),
        ).where(F.size("__v") > 0)
        return fused.select(
            "__scope", "__entity", F.explode("__v").alias("v")
        ).select(
            F.col("v.rule_id").alias("rule_id"),
            F.col("v.severity").alias("severity"),
            F.col("__scope").alias("scope"),
            F.col("__entity").alias("entity"),
            F.col("v.column").alias("column"),
            F.col("v.value").alias("value"),
            F.col("v.message").alias("message"),
        )

    # -- full evaluation ---------------------------------------------------
    def violations(self, df: DataFrame, ruleset: RuleSet, dims: dict[str, DataFrame] | None = None) -> DataFrame:
        dims = dims or {}
        problems = registry.lint_ruleset(ruleset, df.columns)
        if problems and self.fail_on_lint:
            raise ValueError("ruleset lint failed:\n  " + "\n  ".join(problems))

        row_rules = [r for r in ruleset.rules if r.rule_type in registry.ROW_COMPILERS]
        plan_rules = [r for r in ruleset.rules if r.rule_type in registry.PLAN_EVALUATORS]

        parts: list[DataFrame] = []
        if row_rules:
            parts.append(self._row_violations(df, ruleset, row_rules))
        for rule in plan_rules:
            parts.append(registry.PLAN_EVALUATORS[rule.rule_type](df, rule, ruleset, dims))
        if not parts:
            return empty_violations(df.sparkSession)
        return reduce(lambda a, b: a.unionByName(b), parts)

    def verdicts(self, df: DataFrame, ruleset: RuleSet, violations: DataFrame) -> DataFrame:
        """(scope, rule_id, severity, n_rows, n_failed, passed) — one row per
        declared rule per scope (zero-filled), plus rows for derived rule ids
        (e.g. '.alias', '.unused') that only exist when violations occur."""
        spark = df.sparkSession
        counts = violations.groupBy("scope", "rule_id", "severity").agg(
            F.count(F.lit(1)).alias("n_failed")
        )
        scope_rows = df.groupBy(F.expr(ruleset.scope).cast("string").alias("scope")).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        declared = spark.createDataFrame(
            [(r.rule_id, r.severity) for r in ruleset.rules], "rule_id string, severity string"
        )
        grid = scope_rows.crossJoin(F.broadcast(declared)).unionByName(
            scope_rows.join(counts.select("scope", "rule_id", "severity"), "scope").select(
                "scope", "n_rows", "rule_id", "severity"
            )
        ).distinct()
        return (
            grid.join(counts, ["scope", "rule_id", "severity"], "left")
            .withColumn("n_failed", F.coalesce("n_failed", F.lit(0)))
            .withColumn("passed", (F.col("severity") != ERROR) | (F.col("n_failed") == 0))
            .select("scope", "rule_id", "severity", "n_rows", "n_failed", "passed")
        )

    def validate(
        self,
        df: DataFrame,
        ruleset: RuleSet,
        dims: dict[str, DataFrame] | None = None,
        with_stats: bool = True,
        approx_distinct: bool = True,
    ) -> RunResult:
        viols = self.violations(df, ruleset, dims)
        verd = self.verdicts(df, ruleset, viols)
        stats = (
            profile(df, scope=ruleset.scope, approx_distinct=approx_distinct)
            if with_stats
            else None
        )
        return RunResult(viols, verd, stats, ruleset.content_hash())

    # -- resumable runs ------------------------------------------------------
    def validate_resumable(
        self,
        df: DataFrame,
        ruleset: RuleSet,
        manifest: ckpt.CheckpointManifest,
        dims: dict[str, DataFrame] | None = None,
        snapshot_id: str = "",
        with_stats: bool = False,
    ) -> tuple[RunResult | None, list[str]]:
        """Validate only partitions (scope values) not yet recorded in the
        manifest under this rule-set hash; record completed partitions with
        metrics. Returns (result-or-None-if-nothing-pending, pending list)."""
        spark = df.sparkSession
        rhash = ruleset.content_hash()
        pending = ckpt.pending_partitions(df, ruleset.scope, manifest, rhash)
        if not pending:
            return None, []
        sub = df.where(F.expr(ruleset.scope).cast("string").isin(pending))
        result = self.validate(sub, ruleset, dims, with_stats=with_stats)
        entries = ckpt.manifest_entries(spark, result.verdicts, rhash, snapshot_id)
        manifest.record(entries)
        return result, pending
