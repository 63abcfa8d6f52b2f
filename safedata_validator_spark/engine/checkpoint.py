"""Resumable validation runs: a per-partition checkpoint/lineage manifest.

No reference analogue (the reference's "resume" is rerunning the file); this
is the north-rule requirement: "resumable from an Iceberg checkpoint/manifest
recording per-partition lineage (snapshot-id, rule-set hash, metrics)". On a
cluster the manifest lives as an Iceberg table keyed by
(partition, ruleset_hash); in this sandbox (no Iceberg jars, see
sources.tables.ICEBERG_AVAILABLE) the same manifest is an append-only parquet
directory — the schema and resume semantics are identical.

Resume = anti-join of the input's partition values against manifest entries
with a matching ruleset hash: only pending partitions are scanned (partition
pruning applies because the filter is on the partition expression).
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DDL = (
    "partition string, ruleset_hash string, snapshot_id string, "
    "n_rows long, n_violations long, n_errors long, passed boolean, "
    "completed_at double, run_id string"
)


@dataclass
class CheckpointManifest:
    path: str

    def read(self, spark: SparkSession) -> DataFrame:
        if not os.path.exists(self.path):
            return spark.createDataFrame([], MANIFEST_DDL)
        return spark.read.schema(MANIFEST_DDL).parquet(self.path)

    def completed(self, spark: SparkSession, ruleset_hash: str) -> DataFrame:
        """Partitions already validated under this exact rule set."""
        return (
            self.read(spark)
            .where(F.col("ruleset_hash") == ruleset_hash)
            .select("partition")
            .distinct()
        )

    def record(self, entries: DataFrame) -> None:
        entries.write.mode("append").parquet(self.path)


def pending_partitions(
    df: DataFrame,
    scope: str,
    manifest: CheckpointManifest,
    ruleset_hash: str,
) -> list[str]:
    """Distinct partition values of ``df`` not yet in the manifest. Partition
    lists are O(thousands) — driver-side is the right place for them (this is
    metadata, the same scale as an Iceberg partition listing)."""
    spark = df.sparkSession
    have = manifest.completed(spark, ruleset_hash)
    want = df.select(F.expr(scope).cast("string").alias("partition")).distinct()
    rows = want.join(have, "partition", "left_anti").collect()
    return sorted(r["partition"] for r in rows)


def manifest_entries(
    spark: SparkSession,
    verdicts: DataFrame,
    ruleset_hash: str,
    snapshot_id: str,
    run_id: str | None = None,
) -> DataFrame:
    """Fold a verdicts DataFrame into one manifest row per partition."""
    run_id = run_id or uuid.uuid4().hex[:12]
    now = time.time()
    per_part = verdicts.groupBy(F.col("scope").alias("partition")).agg(
        F.max("n_rows").alias("n_rows"),
        F.sum("n_failed").alias("n_violations"),
        F.sum(F.when(F.col("severity") == "ERROR", F.col("n_failed")).otherwise(0)).alias("n_errors"),
        (F.sum(F.when(~F.col("passed"), 1).otherwise(0)) == 0).alias("passed"),
    )
    return per_part.select(
        "partition",
        F.lit(ruleset_hash).alias("ruleset_hash"),
        F.lit(snapshot_id).alias("snapshot_id"),
        "n_rows",
        "n_violations",
        "n_errors",
        "passed",
        F.lit(now).alias("completed_at"),
        F.lit(run_id).alias("run_id"),
    )
