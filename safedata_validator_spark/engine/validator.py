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
        parts.extend(self._plan_violations(df, ruleset, plan_rules, dims))
        if not parts:
            return empty_violations(df.sparkSession)
        return reduce(lambda a, b: a.unionByName(b), parts)

    def _plan_violations(
        self, df: DataFrame, ruleset: RuleSet, plan_rules: list[Rule], dims: dict
    ) -> list[DataFrame]:
        """Evaluate plan-level rules with cross-rule fusion. Rules that share
        a relational shape share ONE pass over the data:

        * monotone + transition_grammar with the same (group, order,
          block_size) share one adjacent-pairs plan (one bounded window + one
          boundary stitch for all of them);
        * sequential + unique_key over (group, order) share one level-1
          key-count aggregation (the identical exchange is executed once via
          Spark's ReuseExchange);
        * ALL extent rules fold into one min/max agg.

        At 10^12 rows the scan/shuffle count, not expression work, dominates
        cost — this is the engine's equivalent of the reference's single-pass
        multi-statistic design (field.py:1361-1415), applied across rules.
        """
        from collections import defaultdict

        from safedata_validator_spark.engine import extents, ordering, uniqueness

        parts: list[DataFrame] = []
        handled: set[int] = set()

        # -- adjacency fusion ------------------------------------------------
        adj = [r for r in plan_rules if r.rule_type in ("monotone", "transition_grammar")]
        by_key: dict[tuple, list[Rule]] = defaultdict(list)
        for r in adj:
            by_key[ordering.rule_pair_key(r, ruleset)].append(r)
        for (group, order, method, block_size), rules in by_key.items():
            values = sorted({r.column for r in rules})
            pairs = ordering.build_pairs(df, ruleset, group, order, values, block_size, method)
            for r in rules:
                fn = (
                    ordering.monotone_from_pairs
                    if r.rule_type == "monotone"
                    else ordering.grammar_from_pairs
                )
                parts.append(fn(pairs, r, group, order))
                handled.add(id(r))

        # -- sequential + unique_key fusion -----------------------------------
        seq_rules = [r for r in plan_rules if r.rule_type == "sequential"]
        uniq_rules = [r for r in plan_rules if r.rule_type == "unique_key"]
        for sr in seq_rules:
            group = sr.params.get("group", ruleset.key_cols[0])
            order = sr.params.get("order", sr.column or "turn_idx")
            counts = ordering.key_counts(df, group, order, ruleset.scope)
            parts.append(ordering.sequential_from_counts(counts, sr, group, order))
            if sr.params.get("examples"):
                parts.append(ordering.sequential_examples(df, counts, sr, ruleset, group, order))
            handled.add(id(sr))
            for ur in uniq_rules:
                if id(ur) not in handled and list(ur.params.get("keys", ruleset.key_cols)) == [group, order]:
                    parts.append(uniqueness.unique_from_counts(counts, ur, group, order))
                    handled.add(id(ur))

        # -- extent fusion -----------------------------------------------------
        extent_rules = [r for r in plan_rules if r.rule_type == "extent"]
        if extent_rules:
            parts.extend(extents.eval_extents_fused(df, extent_rules, ruleset))
            handled.update(id(r) for r in extent_rules)

        # -- everything else through the registry ------------------------------
        for rule in plan_rules:
            if id(rule) not in handled:
                parts.append(registry.PLAN_EVALUATORS[rule.rule_type](df, rule, ruleset, dims))
        return parts

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
