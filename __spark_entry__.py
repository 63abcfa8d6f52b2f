"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: reshape the sf0.001 events stream into the
transcript schema (conv_id, turn_idx, role, text, tool, ts) and run the full
validation engine over it, returning the verdicts DataFrame.

``queries()`` / ``oracle_sql()`` — the operator catalog from SURVEY.md §2
(implemented in safedata_validator_spark.queries) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.rules.model import ERROR, WARNING, Rule, RuleSet

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transcripts = ev.select(
        F.format_string("user-%05d", F.col("user_id")).alias("conv_id"),
        F.row_number().over(w).alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "error", F.lit("bash")).alias("tool"),
        F.col("ts"),
    )
    ruleset = RuleSet(
        name="events-as-transcripts",
        key_cols=["conv_id", "turn_idx"],
        rules=[
            Rule("text.not_blank", "not_blank", column="text", severity=ERROR),
            Rule("role.in_levels", "in_levels", column="role", severity=ERROR,
                 params={"levels": ["click", "view", "purchase", "signup", "error"]}),
            Rule("key.unique", "unique_key", severity=ERROR,
                 params={"keys": ["conv_id", "turn_idx"]}),
            Rule("turn_idx.sequential", "sequential", column="turn_idx", severity=ERROR,
                 params={"group": "conv_id", "order": "turn_idx"}),
            Rule("ts.monotone", "monotone", column="ts", severity=ERROR,
                 params={"group": "conv_id", "order": "turn_idx"}),
            Rule("ts.extent_hard", "extent", column="ts", severity=WARNING,
                 params={"lo": "2020-01-01 00:00:00", "hi": "2031-01-01 00:00:00"}),
        ],
    )
    res = ValidationEngine().validate(transcripts, ruleset, with_stats=False)
    return res.verdicts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from safedata_validator_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from safedata_validator_spark.queries import ORACLES

    return dict(ORACLES)
