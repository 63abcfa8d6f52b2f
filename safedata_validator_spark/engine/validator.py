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

from dataclasses import dataclass, field as dc_field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_validator_spark.engine import checkpoint as ckpt
from safedata_validator_spark.engine.common import empty_violations, entity_col
from safedata_validator_spark.rules.compilers import compile_row_rule
from safedata_validator_spark.rules.model import ERROR, Rule, RuleSet
from safedata_validator_spark.rules import registry


@dataclass
class RunResult:
    """Outputs of one validation run. ``violations``/``verdicts`` are the two
    result tables (SURVEY §1.1 'Validation report'); ``stats`` is the
    single-scan column profile. ``cached`` holds the run's shared per-scope
    aggregates (tiny: one row per scope / distinct categorical value) —
    persisted so violations, verdicts and stats all derive from ONE fact
    pass; call ``unpersist()`` when done with the result DataFrames."""

    violations: DataFrame
    verdicts: DataFrame
    stats: DataFrame | None
    ruleset_hash: str
    cached: list[DataFrame] = dc_field(default_factory=list)

    def passed(self) -> bool:
        """Run-level verdict: zero ERROR-severity failures
        (reference field.py:324-342)."""
        return (
            self.violations.where(F.col("severity") == ERROR).limit(1).count() == 0
        )

    def unpersist(self) -> None:
        # blocking: async eviction races the next run's persist() of the
        # identical plan (bench runs validate twice) into spurious
        # 'already cached' warnings
        for df in self.cached:
            df.unpersist(blocking=True)


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
        # Shape note (measured this round, A/B at 4M turns): keep the
        # where(size(__v) > 0) + explode formulation. The pushed-down size
        # filter does inline the whole struct array into a Filter below the
        # projection, but that filter runs INSIDE whole-stage codegen over
        # all rows, and the projection + generate above it then compute
        # entity/__v for the (rare) surviving rows only. The tempting
        # "evaluate once" rewrite — explode_outer + IsNotNull on the
        # generated attribute — disables codegen for the Generate (outer
        # generates don't codegen), so the whole battery evaluates
        # interpreted: flagship 12-13 s → 22-34 s. Reverted.
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
    def _split_rules(self, df: DataFrame, ruleset: RuleSet) -> tuple[list[Rule], list[Rule]]:
        problems = registry.lint_ruleset(ruleset, df.columns)
        if problems and self.fail_on_lint:
            raise ValueError("ruleset lint failed:\n  " + "\n  ".join(problems))
        row_rules = [r for r in ruleset.rules if r.rule_type in registry.ROW_COMPILERS]
        plan_rules = [r for r in ruleset.rules if r.rule_type in registry.PLAN_EVALUATORS]
        return row_rules, plan_rules

    def violations(
        self,
        df: DataFrame,
        ruleset: RuleSet,
        dims: dict[str, DataFrame] | None = None,
        shared: dict[str, DataFrame] | None = None,
    ) -> DataFrame:
        dims = dims or {}
        row_rules, plan_rules = self._split_rules(df, ruleset)

        parts: list[DataFrame] = []
        if row_rules:
            parts.append(self._row_violations(df, ruleset, row_rules))
        parts.extend(self._plan_violations(df, ruleset, plan_rules, dims, shared))
        if not parts:
            return empty_violations(df.sparkSession)
        return reduce(lambda a, b: a.unionByName(b), parts)

    def _plan_violations(
        self,
        df: DataFrame,
        ruleset: RuleSet,
        plan_rules: list[Rule],
        dims: dict,
        shared: dict[str, DataFrame] | None = None,
    ) -> list[DataFrame]:
        """Evaluate plan-level rules with cross-rule fusion. Rules that share
        a relational shape share ONE pass over the data:

        * monotone + transition_grammar with the same (group, order,
          block_size) evaluate in ONE projection over one adjacent-pairs
          plan (one bounded window + one boundary stitch for all of them);
        * sequential + unique_key over (group, order) share the
          conversation-level hash-sum screen (fast path, inside validate())
          or one key-count aggregation (standalone / method='exact'), the
          key-granularity work running only over flagged conversations;
        * ALL extent rules fold into the shared per-scope aggregate (inside
          validate()) or one min/max agg (standalone);
        * ALL level audits + referential membership checks derive from one
          stacked categorical-counts pass (inside validate()).

        At 10^12 rows the scan/shuffle count, not expression work, dominates
        cost — this is the engine's equivalent of the reference's single-pass
        multi-statistic design (field.py:1361-1415), applied across rules.
        """
        from collections import defaultdict

        from safedata_validator_spark.engine import extents, ordering, referential, uniqueness

        shared = shared or {}
        parts: list[DataFrame] = []
        handled: set[int] = set()

        # -- adjacency fusion ------------------------------------------------
        # ALL adjacency rules sharing (group, order) evaluate in ONE projection
        # over ONE pairs plan — a single consumer guarantees the self-join runs
        # once (separate consumers defeat ReuseExchange under column pruning)
        adj = [r for r in plan_rules if r.rule_type in ("monotone", "transition_grammar")]
        by_key: dict[tuple, list[Rule]] = defaultdict(list)
        for r in adj:
            by_key[ordering.rule_pair_key(r, ruleset)].append(r)
        for (group, order, method, block_size), rules in by_key.items():
            values = sorted({r.column for r in rules})
            pairs = ordering.build_pairs(df, ruleset, group, order, values, block_size, method)
            parts.append(ordering.fused_pairs_violations(pairs, rules, group, order))
            handled.update(id(r) for r in rules)

        # -- sequential + unique_key fusion -----------------------------------
        # Fast path (inside validate(), where the shared per-scope aggregate
        # supplies the global max order value): ONE conversation-level
        # aggregation + hash-sum check decides which conversations are clean
        # — 5-6× cheaper at 40M turns than aggregating per key — and only the
        # flagged conversations are re-aggregated at key level (the exact
        # drilldown that produces byte-identical violation rows, including
        # the duplicate-key report). Clean data therefore never pays the
        # key-granularity shuffle. method='exact' on the rule forces the
        # key-level path (e.g. adversarial inputs engineered against the
        # public hash seeds).
        seq_rules = [r for r in plan_rules if r.rule_type == "sequential"]
        uniq_rules = [r for r in plan_rules if r.rule_type == "unique_key"]
        order_max: dict[str, int] = shared.get("order_max") or {}
        for sr in seq_rules:
            group = sr.params.get("group", ruleset.key_cols[0])
            order = sr.params.get("order", sr.column or "turn_idx")
            start = int(sr.params.get("start", 1))
            omax = order_max.get(order)
            fast = (
                sr.params.get("method", "auto") != "exact"
                and start == 1
                and omax is not None
                and 1 <= omax <= ordering.SEQ_HASH_CAP
            )
            if fast:
                bad_groups = ordering.flagged_sequence_groups(
                    df, group, order, ruleset.scope, omax
                )
                sub = df.join(
                    bad_groups.withColumnRenamed(group, "__badg"),
                    F.col(group).eqNullSafe(F.col("__badg")),
                    "left_semi",
                )
                counts = ordering.key_counts(sub, group, order, ruleset.scope)
            else:
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
        # inside a full validate() run the min/max fold rides the shared
        # per-scope aggregate (scope_agg) — zero extra fact passes; the
        # declared-vs-computed congruence rules read the SAME aggregate
        extent_rules = [r for r in plan_rules if r.rule_type == "extent"]
        congr_rules = [r for r in plan_rules if r.rule_type == "extent_congruence"]
        if extent_rules or congr_rules:
            scope_agg = shared.get("scope_agg")
            if scope_agg is None:
                scope_agg = df.groupBy(
                    F.expr(ruleset.scope).cast("string").alias("__scope")
                ).agg(*extents.extent_aggs(extent_rules + congr_rules))
            if extent_rules:
                parts.extend(extents.extents_from_agg(scope_agg, extent_rules))
            if congr_rules:
                parts.extend(extents.congruence_from_agg(scope_agg, congr_rules))
            handled.update(id(r) for r in extent_rules + congr_rules)

        # -- categorical fusion ------------------------------------------------
        # level audits + referential membership over ANY number of columns
        # derive from one cached stacked-counts pass (see referential module)
        cat_counts = shared.get("cat_counts")
        if cat_counts is not None:
            for rule in plan_rules:
                if id(rule) in handled:
                    continue
                if rule.rule_type == "levels_audit":
                    sliced = cat_counts.where(F.col("__col") == rule.column).drop("__col")
                    parts.append(referential.levels_audit_from_counts(sliced, rule, dims))
                    handled.add(id(rule))
                elif rule.rule_type == "ref_integrity":
                    sliced = cat_counts.where(F.col("__col") == rule.column).drop("__col")
                    parts.append(referential.ref_integrity_from_counts(sliced, rule, dims))
                    handled.add(id(rule))

        # -- everything else through the registry ------------------------------
        for rule in plan_rules:
            if id(rule) not in handled:
                parts.append(registry.PLAN_EVALUATORS[rule.rule_type](df, rule, ruleset, dims))
        return parts

    def verdicts(
        self,
        df: DataFrame,
        ruleset: RuleSet,
        violations: DataFrame,
        scope_rows: DataFrame | None = None,
    ) -> DataFrame:
        """(scope, rule_id, severity, n_rows, n_failed, passed) — one row per
        declared rule per scope (zero-filled), plus rows for derived rule ids
        (e.g. '.alias', '.unused') that only exist when violations occur.
        ``scope_rows`` (scope, n_rows) may be supplied from the run's shared
        per-scope aggregate to avoid a dedicated fact pass."""
        spark = df.sparkSession
        counts = violations.groupBy("scope", "rule_id", "severity").agg(
            F.count(F.lit(1)).alias("n_failed")
        )
        if scope_rows is None:
            scope_rows = df.groupBy(F.expr(ruleset.scope).cast("string").alias("scope")).agg(
                F.count(F.lit(1)).alias("n_rows")
            )
        declared = spark.createDataFrame(
            [(r.rule_id, r.severity) for r in ruleset.rules], "rule_id string, severity string"
        )
        # ONE reference to the violations subtree: the declared grid
        # full-outer-joins the observed counts (derived rule ids such as
        # '.alias'/'.unused' enter through the counts side), then row counts
        # attach from the (driver-local) scope_rows. The previous
        # grid-union-then-join shape embedded the violations plan twice,
        # doubling every fact scan when violations was not persisted.
        # Scope joins are NULL-SAFE: a scope expression may evaluate to NULL
        # and NULL is a verdict partition like any other.
        grid = scope_rows.select("scope").crossJoin(F.broadcast(declared))
        g, c = grid.alias("g"), counts.alias("c")
        merged = g.join(
            c,
            F.col("g.scope").eqNullSafe(F.col("c.scope"))
            & (F.col("g.rule_id") == F.col("c.rule_id"))
            & (F.col("g.severity") == F.col("c.severity")),
            "full_outer",
        ).select(
            F.coalesce(F.col("g.scope"), F.col("c.scope")).alias("scope"),
            F.coalesce(F.col("g.rule_id"), F.col("c.rule_id")).alias("rule_id"),
            F.coalesce(F.col("g.severity"), F.col("c.severity")).alias("severity"),
            F.col("c.n_failed").alias("n_failed"),
        )
        sr = scope_rows.withColumnRenamed("scope", "__sr_scope")
        return (
            merged.join(
                sr, F.col("scope").eqNullSafe(F.col("__sr_scope")), "left"
            )
            .withColumn("n_failed", F.coalesce("n_failed", F.lit(0)))
            .withColumn("passed", (F.col("severity") != ERROR) | (F.col("n_failed") == 0))
            .select("scope", "rule_id", "severity", "n_rows", "n_failed", "passed")
        )

    #: Shared aggregates larger than this many rows stay distributed
    #: (persisted) instead of being collected to the driver.
    localize_cap = 500_000
    #: ...and a byte-denominated ceiling alongside it: the scope aggregate
    #: carries per-column sketch columns (quantile arrays, counters), so a
    #: row cap alone under-protects the driver for wide schemas.
    localize_bytes_cap = 256 * 1024 * 1024

    @staticmethod
    def _est_row_width(schema) -> int:
        """Rough serialized bytes per row from the schema — enough to turn
        the byte ceiling into a row cap (sketch arrays dominate)."""
        from pyspark.sql import types as T

        width = 0
        for f in schema.fields:
            t = f.dataType
            if isinstance(t, T.ArrayType):
                width += 8 * 32
            elif isinstance(t, (T.MapType, T.BinaryType)):
                width += 1024
            elif isinstance(t, T.StringType):
                width += 64
            else:
                width += 16
        return max(width, 64)

    def _localize(self, agg: DataFrame) -> tuple[DataFrame, bool, list | None]:
        """Materialize a (by-design tiny) aggregate as a driver-local table so
        every downstream consumer reads rows, never the build plan. Falls back
        to a persisted distributed plan when the aggregate exceeds the row or
        byte cap. The plan is persisted BEFORE the probing collect, so the
        fallback's first consumer reuses the already-computed partitions
        instead of recomputing the whole aggregation. Also returns the
        collected rows on the local path so callers that need driver-side
        values (the sequential fast path's order maxima) read them directly
        instead of re-collect()ing the local table — which runs one more
        (pointless) local job per consumer."""
        cap = min(
            self.localize_cap,
            max(1, self.localize_bytes_cap // self._est_row_width(agg.schema)),
        )
        plan = agg.persist()
        rows = plan.limit(cap + 1).collect()
        if len(rows) > cap:
            return plan, False, None
        plan.unpersist()
        return agg.sparkSession.createDataFrame(rows, agg.schema), True, rows

    def validate(
        self,
        df: DataFrame,
        ruleset: RuleSet,
        dims: dict[str, DataFrame] | None = None,
        with_stats: bool = True,
        approx_distinct: bool = True,
        profile_columns: list[str] | None = None,
    ) -> RunResult:
        """Full run with cross-output pass fusion. Fact passes, total:

        1. fused row-rule scan (the only pass touching heavy text columns);
        2. ONE per-scope aggregation = profiler sketches + extent min/max +
           verdict row counts (persisted: rows = #scopes);
        3. ONE stacked categorical-counts pass for every levels_audit /
           ref_integrity column (persisted: rows ≈ Σ distinct values);
        4. key-count shuffle shared by sequential + unique_key;
        5-6. adjacency self-join (both sides), ALL adjacency rules fused.

        Everything else is broadcast joins / re-aggregation over the tiny
        shared aggregates — nothing re-reads the fact table.

        The shared aggregates are computed EAGERLY (two small jobs at call
        time) and re-injected as driver-local tables: their size is bounded
        by #scopes and Σ distinct categorical-column values — both bounded
        by design (verdict partitions; level/membership domains) — and a
        local table guarantees every downstream consumer reads the computed
        rows instead of replaying the fact scan inside broadcast-subquery
        jobs, which do not share adaptive query stages with the main action.
        Should a categorical column turn out high-cardinality, the aggregate
        falls back to a persisted distributed plan (``localize_cap`` rows).
        """
        from safedata_validator_spark.engine import extents as ext
        from safedata_validator_spark.engine import referential
        from safedata_validator_spark.engine.profiler import (
            default_profile_columns,
            profile_aggs,
            profile_long,
        )

        dims = dims or {}
        row_rules, plan_rules = self._split_rules(df, ruleset)

        extent_rules = [
            r for r in plan_rules if r.rule_type in ("extent", "extent_congruence")
        ]
        cat_cols = sorted(
            {
                r.column
                for r in plan_rules
                if r.rule_type in ("levels_audit", "ref_integrity") and r.column
            }
        )
        # stats default to plan-rule-referenced + typed columns — free-text
        # columns with only row rules carry no sketch worth their bandwidth
        # (see default_profile_columns); pass profile_columns to override
        if not with_stats:
            prof_cols = []
        elif profile_columns is not None:
            prof_cols = list(profile_columns)
        else:
            prof_cols = default_profile_columns(df, ruleset)

        seq_orders = sorted(
            {
                r.params.get("order", r.column or "turn_idx")
                for r in plan_rules
                if r.rule_type == "sequential"
            }
            & set(df.columns)
        )

        aggs = [F.count(F.lit(1)).alias("__n_rows")]
        if prof_cols:
            aggs += profile_aggs(df, prof_cols, approx_distinct=approx_distinct)
        if extent_rules:
            aggs += ext.extent_aggs(extent_rules)
        # global max of each sequential order column rides the same pass —
        # it gates + sizes the hash-sum fast path (see _plan_violations)
        aggs += [F.max(F.col(o).cast("long")).alias(f"__seqmax_{o}") for o in seq_orders]
        scope_agg_plan = df.groupBy(
            F.expr(ruleset.scope).cast("string").alias("__scope")
        ).agg(*aggs)

        # the two eager aggregates run as CONCURRENT Spark actions — their
        # driver planning and stage tails overlap (each alone under-utilises
        # the executors), shaving the serial prologue of every run
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            scope_fut = pool.submit(self._localize, scope_agg_plan)
            cat_fut = (
                pool.submit(
                    self._localize,
                    referential.categorical_counts(df, ruleset.scope, cat_cols),
                )
                if cat_cols
                else None
            )
            # overlap: the fused row-rule scan consumes nothing from the
            # shared aggregates, so its (py4j-bound) plan construction runs
            # on the main thread WHILE the two aggregate jobs execute —
            # py4j is connection-per-thread, so driver-side building and
            # JVM job execution proceed concurrently
            early_parts: list[DataFrame] = []
            if row_rules:
                early_parts.append(self._row_violations(df, ruleset, row_rules))
            scope_agg, was_local, scope_rows_local = scope_fut.result()
            cached = [] if was_local else [scope_agg]
            shared: dict[str, DataFrame] = {"scope_agg": scope_agg}
            if was_local and seq_orders:
                # read the maxima from the ALREADY-collected rows — a
                # .collect() on the local table would run one more job
                shared["order_max"] = {
                    o: max(
                        (r[f"__seqmax_{o}"] for r in scope_rows_local
                         if r[f"__seqmax_{o}"] is not None),
                        default=None,
                    )
                    for o in seq_orders
                }
            if cat_fut is not None:
                cat_counts, cat_local, _ = cat_fut.result()
                shared["cat_counts"] = cat_counts
                if not cat_local:
                    cached.append(cat_counts)

        parts: list[DataFrame] = list(early_parts)
        parts.extend(self._plan_violations(df, ruleset, plan_rules, dims, shared))
        viols = (
            reduce(lambda a, b: a.unionByName(b), parts)
            if parts
            else empty_violations(df.sparkSession)
        )

        scope_rows = scope_agg.select(
            F.col("__scope").alias("scope"), F.col("__n_rows").alias("n_rows")
        )
        verd = self.verdicts(df, ruleset, viols, scope_rows=scope_rows)
        stats = profile_long(scope_agg, prof_cols) if with_stats else None
        return RunResult(viols, verd, stats, ruleset.content_hash(), cached=cached)

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
