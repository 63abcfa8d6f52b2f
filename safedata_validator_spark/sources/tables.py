"""Table sources/sinks: Iceberg-first with a parquet fallback.

The production deployment (north rule) reads Iceberg tables; the sandbox has
no Iceberg runtime jars, so the loader degrades to parquet paths with the
same call shape. Dimension loaders mirror the reference's resource loading
(gazetteer GeoJSON resources.py:312-351, alias CSV resources.py:353-395,
project CSV resources.py:419-468, SQLite taxon dims taxa.py:313-316) as small
DataFrames destined for broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def load_table(
    spark: SparkSession, ref: str, snapshot_id: str | None = None, schema: str | None = None
) -> DataFrame:
    """Load a fact/dimension table.

    ``ref`` forms:
      * ``iceberg:catalog.db.table`` — Iceberg catalog table (supports
        time travel via ``snapshot_id``; needs the Iceberg runtime jar);
      * ``parquet:/path`` or a bare path — parquet directory/file;
      * ``csv:/path`` — header CSV (pass ``schema`` DDL to avoid all-string
        inference — the untyped-cell analogue of the reference's Excel reads,
        where try_cast/castable rules then own dynamic typing);
      * ``json:/path`` — JSON-lines.
    """
    if ref.startswith("iceberg:"):
        name = ref.split(":", 1)[1]
        reader = spark.read.format("iceberg")
        if snapshot_id:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.load(name)
    if ref.startswith("csv:"):
        reader = spark.read.option("header", True)
        reader = reader.schema(schema) if schema else reader.option("inferSchema", True)
        return reader.csv(ref.split(":", 1)[1])
    if ref.startswith("json:"):
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        return reader.json(ref.split(":", 1)[1])
    path = ref.split(":", 1)[1] if ref.startswith("parquet:") else ref
    return spark.read.parquet(path)


def current_snapshot_id(spark: SparkSession, ref: str) -> str:
    """Lineage id recorded in the checkpoint manifest. For Iceberg tables the
    real snapshot id; for parquet a content-stable stand-in (sorted file list
    hash) so resume still invalidates when the input changes."""
    if ref.startswith("iceberg:"):
        name = ref.split(":", 1)[1]
        row = spark.sql(f"SELECT snapshot_id FROM {name}.snapshots ORDER BY committed_at DESC LIMIT 1").first()
        return str(row["snapshot_id"]) if row else ""
    import hashlib
    import os

    path = ref.split(":", 1)[1] if ref.startswith("parquet:") else ref
    names = []
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            names.extend(
                f"{os.path.join(root, f)}:{os.path.getsize(os.path.join(root, f))}"
                for f in files
                if not f.startswith("_")
            )
    elif os.path.exists(path):
        names.append(f"{path}:{os.path.getsize(path)}")
    return hashlib.sha256("\n".join(sorted(names)).encode()).hexdigest()[:16]


def load_csv_dim(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Alias/levels CSV dimension (reference alias CSV resources.py:353-395)."""
    reader = spark.read.option("header", True)
    if schema:
        reader = reader.schema(schema)
    return reader.csv(path)


def load_json_dim(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Gazetteer-style JSON dimension (reference GeoJSON resources.py:312-351)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def write_results(df: DataFrame, ref: str, mode: str = "append") -> None:
    """Persist violations/verdicts/stats. Iceberg table or parquet dir."""
    if ref.startswith("iceberg:"):
        df.writeTo(ref.split(":", 1)[1]).append()
        return
    path = ref.split(":", 1)[1] if ref.startswith("parquet:") else ref
    df.write.mode(mode).parquet(path)
