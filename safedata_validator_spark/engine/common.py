"""Shared violation-row construction helpers.

Violations are data, not log lines (the reference's verdict mechanism is a
counting log handler, logger.py:68-107; here it is a DataFrame with a fixed
schema so counting, scoping and persistence are relational).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from safedata_validator_spark.rules.model import Rule

#: Canonical violations schema (column order matters for unions).
VIOLATION_COLS = ["rule_id", "severity", "scope", "entity", "column", "value", "message"]

VIOLATION_DDL = (
    "rule_id string, severity string, scope string, entity string, "
    "column string, value string, message string"
)


def entity_col(key_cols: list[str]) -> Column:
    """Stable row identity for violation reporting: 'k1=v1/k2=v2'."""
    parts = []
    for k in key_cols:
        parts.append(F.concat(F.lit(f"{k}="), F.coalesce(F.col(k).cast("string"), F.lit("∅"))))
    return F.concat_ws("/", *parts)


def as_violations(
    df: DataFrame,
    rule: Rule,
    scope: Column,
    entity: Column,
    value: Column,
    message: Column | str,
    column: str | None = None,
    severity: str | None = None,
) -> DataFrame:
    """Project an arbitrary violating-rows DataFrame into the canonical shape.
    ``severity`` overrides the rule's own level for derived advisory rows
    (e.g. extent congruence's both-populated WARNING)."""
    msg = F.lit(message) if isinstance(message, str) else message
    return df.select(
        F.lit(rule.rule_id).alias("rule_id"),
        F.lit(severity if severity is not None else rule.severity).alias("severity"),
        scope.cast("string").alias("scope"),
        entity.cast("string").alias("entity"),
        F.lit(column if column is not None else rule.column).alias("column"),
        value.cast("string").alias("value"),
        msg.alias("message"),
    )


def empty_violations(spark) -> DataFrame:
    return spark.createDataFrame([], VIOLATION_DDL)
