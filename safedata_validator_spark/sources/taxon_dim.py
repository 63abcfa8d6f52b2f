"""Taxon dimension-build jobs — the Spark-first analogue of the reference's
taxondb pipeline (taxondb.py:227-405 build_local_gbif, taxondb.py:471+
build_local_ncbi): ingest a raw backbone dump into the ``(node_id, parent_id,
name, rank, status)`` nodes dimension plus its ancestor-closure parquet.

Where the reference streams rows into SQLite and serves per-row point queries
at validation time, this build runs ONCE per dimension snapshot: a columnar
scan, a projection, and the path-doubling closure fixpoint
(engine.hierarchy.build_closure — O(log depth) shuffles). Validation-time
lookups are then plain broadcast joins (SURVEY §7.3.5: the per-row recursive
SQL walk is the one reference pattern that would be catastrophic at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from safedata_validator_spark.engine.hierarchy import build_closure

#: GBIF backbone simple.txt column order (reference taxondb.py:280-311
#: file_schema) — the raw dump carries 30 tab-separated fields.
GBIF_SIMPLE_COLUMNS = [
    "id", "parent_key", "basionym_key", "is_synonym", "status", "rank",
    "nom_status", "constituent_key", "origin", "source_taxon_key",
    "kingdom_key", "phylum_key", "class_key", "order_key", "family_key",
    "genus_key", "species_key", "name_id", "scientific_name",
    "canonical_name", "genus_or_above", "specific_epithet",
    "infra_specific_epithet", "notho_type", "authorship", "year",
    "bracket_authorship", "bracket_year", "name_published_in", "issues",
]


def gbif_nodes_from_simple(spark: SparkSession, simple_path: str) -> DataFrame:
    """GBIF simple.txt(.gz) TSV dump → nodes dimension
    (node_id, parent_id, name, rank, status, canon_id).

    ``canon_id`` precomputes the reference's canon chase (taxa.py:478-486):
    a non-accepted usage's ``parent_key`` points at its accepted taxon, so
    the chase becomes a plain column — validation never follows pointers.
    ``\\N`` is GBIF's NULL marker."""
    schema = ", ".join(f"{c} string" for c in GBIF_SIMPLE_COLUMNS)
    raw = spark.read.csv(simple_path, sep="\t", schema=schema, nullValue="\\N")
    status = F.lower(F.col("status"))
    return raw.select(
        F.col("id").cast("long").alias("node_id"),
        F.col("parent_key").cast("long").alias("parent_id"),
        F.col("canonical_name").alias("name"),
        F.lower(F.col("rank")).alias("rank"),
        status.alias("status"),
        F.when(status == "accepted", F.col("id").cast("long"))
        .otherwise(F.col("parent_key").cast("long"))
        .alias("canon_id"),
    ).where(F.col("node_id").isNotNull())


def ncbi_nodes_from_dumps(
    spark: SparkSession, nodes_path: str, names_path: str
) -> DataFrame:
    """NCBI taxdump nodes.dmp + names.dmp → nodes dimension
    (node_id, parent_id, name, rank, status).

    Replicates the reference's names/nodes join (taxa.py:587-647) at build
    time: one scientific name per tax_id (name_class filter); the root's
    self-parent (tax_id 1 → 1) becomes NULL so the closure terminates.
    NCBI has no synonym statuses in nodes — every row is 'accepted'."""
    # .dmp fields are "\t|\t"-separated with a trailing "\t|"
    def read_dmp(path: str, cols: list[str]) -> DataFrame:
        raw = spark.read.text(path)
        parts = F.split(F.regexp_replace(F.col("value"), r"\t\|$", ""), r"\t\|\t")
        return raw.select(
            *[F.element_at(parts, i + 1).alias(c) for i, c in enumerate(cols)]
        )

    nodes = read_dmp(nodes_path, ["tax_id", "parent_tax_id", "rank"]).select(
        F.col("tax_id").cast("long").alias("node_id"),
        F.when(F.col("parent_tax_id").cast("long") == F.col("tax_id").cast("long"), None)
        .otherwise(F.col("parent_tax_id").cast("long"))
        .alias("parent_id"),
        F.lower(F.col("rank")).alias("rank"),
    )
    names = (
        read_dmp(names_path, ["tax_id", "name_txt", "unique_name", "name_class"])
        .where(F.col("name_class") == "scientific name")
        .select(F.col("tax_id").cast("long").alias("node_id"), F.col("name_txt").alias("name"))
    )
    return nodes.join(names, "node_id", "left").select(
        "node_id", "parent_id", "name", "rank", F.lit("accepted").alias("status")
    )


def write_dimension(nodes: DataFrame, out_dir: str) -> dict[str, str]:
    """Write the nodes dimension and its ancestor closure as parquet —
    the artefacts every validation run broadcast-joins against. The closure
    is built over canonical placement only (synonyms have no subtree)."""
    paths = {
        "nodes": os.path.join(out_dir, "nodes.parquet"),
        "closure": os.path.join(out_dir, "closure.parquet"),
    }
    nodes.write.mode("overwrite").parquet(paths["nodes"])
    spark = nodes.sparkSession
    persisted = spark.read.parquet(paths["nodes"])
    tree = persisted.where(
        (F.col("status") == "accepted") if "canon_id" in persisted.columns else F.lit(True)
    ).select("node_id", "parent_id")
    build_closure(tree).write.mode("overwrite").parquet(paths["closure"])
    return paths
