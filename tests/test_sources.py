"""Sources: table refs, snapshot ids (resume lineage), dimension loaders."""

from __future__ import annotations

import json

import pytest

from safedata_validator_spark.sources import tables


def test_load_table_parquet_refs(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(5).write.parquet(p)
    assert tables.load_table(spark, p).count() == 5
    assert tables.load_table(spark, f"parquet:{p}").count() == 5


def test_snapshot_id_tracks_content(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(5).write.parquet(p)
    s1 = tables.current_snapshot_id(spark, p)
    s2 = tables.current_snapshot_id(spark, p)
    assert s1 == s2 and len(s1) == 16
    spark.range(7).write.mode("overwrite").parquet(p)
    assert tables.current_snapshot_id(spark, p) != s1


def test_csv_and_json_dims(spark, tmp_path):
    csv = tmp_path / "alias.csv"
    csv.write_text("alias,tool\nshell,bash\nrg,grep\n")
    got = tables.load_csv_dim(spark, str(csv), "alias string, tool string").collect()
    assert {(r["alias"], r["tool"]) for r in got} == {("shell", "bash"), ("rg", "grep")}

    js = tmp_path / "gazetteer.json"
    js.write_text("\n".join(json.dumps({"tool": t, "category": c}) for t, c in [("bash", "shell"), ("web", "net")]))
    got = tables.load_json_dim(spark, str(js)).collect()
    assert {r["tool"] for r in got} == {"bash", "web"}


def test_write_results_roundtrip(spark, tmp_path):
    out = str(tmp_path / "viol")
    df = spark.createDataFrame([("r1", "ERROR")], "rule_id string, severity string")
    tables.write_results(df, out, mode="overwrite")
    assert spark.read.parquet(out).count() == 1


def test_iceberg_availability_probe(spark):
    # the Iceberg-first path degrades explicitly, not silently: the probe
    # answers by classpath inspection, never by try/except on a read
    assert tables.iceberg_available(spark) in (True, False)


def test_load_table_csv_and_json_refs(spark, tmp_path):
    """csv:/json: fact refs — the file-ingest analogue of the reference's
    Excel reads; explicit schema DDL wins over inference for CSV."""
    from safedata_validator_spark.sources import tables

    df = spark.createDataFrame(
        [("c1", 1, "hello"), ("c1", 2, "world")], "conv_id string, turn_idx int, text string"
    )
    csv_dir = str(tmp_path / "t.csv")
    json_dir = str(tmp_path / "t.json")
    df.write.option("header", True).csv(csv_dir)
    df.write.json(json_dir)

    got_csv = tables.load_table(
        spark, f"csv:{csv_dir}", schema="conv_id string, turn_idx int, text string"
    )
    assert got_csv.schema.simpleString() == df.schema.simpleString()
    assert got_csv.count() == 2

    got_json = tables.load_table(
        spark, f"json:{json_dir}", schema="conv_id string, turn_idx int, text string"
    )
    assert {r["turn_idx"] for r in got_json.collect()} == {1, 2}


def _iceberg_jar_on_classpath() -> bool:
    """Cheap jar probe usable in a skipif (no JVM needed): the Iceberg Spark
    runtime jar in pyspark's jars dir or $SPARK_ICEBERG_JAR."""
    import glob
    import os

    import pyspark

    jar_dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_ICEBERG_JAR"):
        return os.path.exists(os.environ["SPARK_ICEBERG_JAR"])
    return any(
        glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar")) for d in jar_dirs
    )


@pytest.mark.skipif(
    not _iceberg_jar_on_classpath(),
    reason="iceberg-spark-runtime jar not on the classpath (sandbox has no "
    "network; drop the jar into pyspark/jars or set SPARK_ICEBERG_JAR to run)",
)
def test_iceberg_snapshot_roundtrip(tmp_path):
    """LIVE Iceberg gate (VERDICT r02 §next 5): create a local
    Hadoop-catalog table, commit two snapshots, and read the FIRST via
    load_table(snapshot_id=...) — time travel must see one row, the
    current read two; current_snapshot_id must return the newest id."""
    from pyspark.sql import SparkSession

    from safedata_validator_spark.sources import tables

    builder = (
        SparkSession.builder.master("local[2]")
        .appName("sdv-iceberg-gate")
        .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.it.type", "hadoop")
        .config("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    )
    jar = __import__("os").environ.get("SPARK_ICEBERG_JAR")
    if jar:
        builder = builder.config("spark.jars", jar)
    sp = builder.getOrCreate()
    try:
        assert tables.iceberg_available(sp)
        sp.sql("CREATE TABLE it.db.t (id BIGINT, v STRING) USING iceberg")
        sp.sql("INSERT INTO it.db.t VALUES (1, 'a')")
        first = sp.sql(
            "SELECT snapshot_id FROM it.db.t.snapshots ORDER BY committed_at"
        ).first()["snapshot_id"]
        sp.sql("INSERT INTO it.db.t VALUES (2, 'b')")
        old = tables.load_table(sp, "iceberg:it.db.t", snapshot_id=str(first))
        assert old.count() == 1
        cur = tables.load_table(sp, "iceberg:it.db.t")
        assert cur.count() == 2
        newest = tables.current_snapshot_id(sp, "iceberg:it.db.t")
        assert newest and newest != str(first)
    finally:
        sp.sql("DROP TABLE IF EXISTS it.db.t PURGE")
        sp.stop()
