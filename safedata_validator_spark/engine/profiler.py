"""Single-scan per-column statistics profiler.

Reference analogue: every ``BaseField`` accumulates n_rows / n_na / n_blank /
n_excel_error plus per-type min/max across chunks in one pass
(field.py:1361-1415, counters field.py:1010-1016, extent fold
field.py:1821-1831 / 2120-2131). The north rule upgrades this to "a single
scan per partition producing per-column stat sketches (count / null /
distinct via HyperLogLog, min/max, numeric moments, t-digest quantiles)
merged treewise".

Spark-first realisation: ALL metrics for ALL columns are compiled into ONE
``groupBy(scope).agg(...)`` — Catalyst computes them in a single pass with
map-side partial aggregation, which *is* the treewise sketch merge
(HyperLogLog++ for approx distinct, Greenwald-Khanna/KLL for
percentile_approx are associative sketches). The wide one-row-per-scope
result is then unpivoted driver-free into a long (scope, column, metric...)
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, NUMERIC_TYPES)


def default_profile_columns(df: DataFrame, ruleset) -> list[str]:
    """Default stats-profile column selection: every numeric / temporal /
    boolean column, plus string columns referenced by PLAN-level rules
    (levels_audit, ref_integrity, sequential/monotone groups, drift, …).

    Free-text string columns referenced only by ROW rules (blank/NA/pattern
    checks) are excluded: row rules evaluate inside the fused row scan and
    need no sketches, while an HLL over full text bodies re-reads the
    heaviest column a second time for a distinct-count nobody consumes — at
    10^12 turns this is the largest avoidable share of per-turn memory
    bandwidth (round-1 north-rule finding). Pass explicit columns to
    ``validate(profile_columns=...)`` to profile text anyway."""
    from safedata_validator_spark.rules import registry

    typed = {
        f.name
        for f in df.schema.fields
        if _is_numeric(f.dataType)
        or isinstance(f.dataType, (T.TimestampType, T.DateType, T.BooleanType))
    }
    plan_cols: set[str] = set()
    for r in ruleset.rules:
        if r.rule_type not in registry.PLAN_EVALUATORS:
            continue
        if r.column:
            plan_cols.add(r.column)
        for key in ("group", "order"):
            v = r.params.get(key)
            if isinstance(v, str):
                plan_cols.add(v)
        for k in r.params.get("keys", []) or []:
            if isinstance(k, str):
                plan_cols.add(k)
    keep = typed | plan_cols
    return [c for c in df.columns if c in keep]


def profile_aggs(
    df: DataFrame,
    columns: list[str],
    approx_distinct: bool = True,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    na_sentinel: str = "NA",
    relative_error: float = 0.01,
    string_minmax: bool = False,
) -> list:
    """The per-column aggregate expressions behind ``profile`` — exposed so the
    validator can fold them into ONE shared per-scope aggregation together with
    extent min/max and the verdict row count (the north rule's 'single scan per
    partition producing per-column stat sketches').

    ``string_minmax`` defaults OFF: alphabetic min/max of a free-text column
    is analytically meaningless and at 10^12 rows its per-row string
    comparisons are a real cost — the reference likewise folds extents for
    numeric/temporal fields only (field.py:1821-1831, 2120-2131) and keeps
    just the counter battery for text (field.py:1361-1415). Distinct-count
    HLL sketches stay on for every column (the north rule asks for them)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in columns:
        dt = fields[c]
        col = F.col(c)
        is_str = isinstance(dt, T.StringType)
        is_num = _is_numeric(dt)

        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__n_null"))
        if is_str:
            aggs.append(
                F.sum(F.when(col.isNotNull() & (F.trim(col) == ""), 1).otherwise(0)).alias(
                    f"{c}__n_blank"
                )
            )
            aggs.append(F.sum(F.when(col == na_sentinel, 1).otherwise(0)).alias(f"{c}__n_na"))
        else:
            aggs.append(F.lit(0).cast("long").alias(f"{c}__n_blank"))
            aggs.append(F.lit(0).cast("long").alias(f"{c}__n_na"))
        if isinstance(dt, T.TimestampType):
            # date-vs-datetime discrimination (reference 'all midnight'
            # detection, field.py:2099-2118): zero non-midnight values means
            # the column is really a date
            nonmid = (F.hour(col) != 0) | (F.minute(col) != 0) | (F.second(col) != 0)
            aggs.append(F.sum(F.when(nonmid, 1).otherwise(0)).alias(f"{c}__n_nonmidnight"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"{c}__n_nonmidnight"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}__n_distinct"))
        else:
            aggs.append(F.count_distinct(col).alias(f"{c}__n_distinct"))
        if is_str and not string_minmax:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max"))
        else:
            aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
        if is_num:
            # relative_error 0.01 (sketch accuracy 100): the Greenwald-Khanna
            # build cost grows with accuracy and measured ~4s per numeric
            # column per 4M rows at accuracy 1000 — the dominant term of the
            # shared per-scope aggregate. 1%-relative quantiles are the
            # standard profiling grade; pass a smaller relative_error where
            # a rule genuinely needs tighter percentiles.
            aggs.append(F.avg(col.cast("double")).alias(f"{c}__mean"))
            aggs.append(F.stddev_samp(col.cast("double")).alias(f"{c}__stddev"))
            aggs.append(
                F.percentile_approx(
                    col.cast("double"), F.array(*[F.lit(q) for q in quantiles]), int(1.0 / relative_error)
                ).alias(f"{c}__quantiles")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mean"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__stddev"))
            aggs.append(F.lit(None).cast("array<double>").alias(f"{c}__quantiles"))
    return aggs


def profile_long(wide: DataFrame, columns: list[str]) -> DataFrame:
    """Unpivot the wide one-row-per-scope aggregate (column names as produced
    by ``profile_aggs``, scope column ``__scope``) into the long
    (scope, column, metric...) profile shape — driver-free explode."""
    per_col_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__n_null").alias("n_null"),
                F.col(f"{c}__n_blank").alias("n_blank"),
                F.col(f"{c}__n_na").alias("n_na"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
                F.col(f"{c}__mean").alias("mean"),
                F.col(f"{c}__stddev").alias("stddev"),
                F.col(f"{c}__quantiles").alias("quantiles"),
                F.col(f"{c}__n_nonmidnight").alias("n_nonmidnight"),
            )
            for c in columns
        ]
    )
    return wide.select(
        F.col("__scope").alias("scope"), F.explode(per_col_structs).alias("s")
    ).select("scope", "s.*")


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    scope: str = "'all'",
    approx_distinct: bool = True,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    na_sentinel: str = "NA",
    relative_error: float = 0.01,
    string_minmax: bool = False,
) -> DataFrame:
    """One-scan profile → long DataFrame:

    (scope, column, n, n_null, n_blank, n_na, n_distinct,
     min_value, max_value, mean, stddev, quantiles array<double>)

    ``n_blank``/``n_na`` apply to string columns (reference blank/NA counters,
    field.py:1435-1442); ``mean``/``stddev``/``quantiles`` to numeric columns;
    timestamps profile min/max (temporal extents, field.py:2120-2131).
    ``approx_distinct=False`` switches HLL to exact count_distinct — used by
    the DuckDB-oracle correctness gate; production keeps the sketch.
    """
    columns = columns or list(df.columns)
    aggs = profile_aggs(
        df, columns, approx_distinct, quantiles, na_sentinel, relative_error, string_minmax
    )
    wide = df.groupBy(F.expr(scope).cast("string").alias("__scope")).agg(*aggs)
    return profile_long(wide, columns)
