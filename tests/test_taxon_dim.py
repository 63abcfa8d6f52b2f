"""Dimension-build jobs (sources.taxon_dim) — the taxondb analogue, tested
with truncated fixtures mirroring the reference's truncators
(test/fixtures/gbif_backbone_truncator.py / ncbi_database_truncator.py):
a hand-cut Animalia→Vulpes lineage plus a synonym, in the raw dump formats.
"""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from safedata_validator_spark.sources import taxon_dim

#: (id, parent_key, is_synonym, status, rank, canonical_name) — the
#: remaining GBIF simple.txt fields are irrelevant to the build and ride
#: along as NULL/padding.
GBIF_ROWS = [
    (1, None, False, "ACCEPTED", "KINGDOM", "Animalia"),
    (44, 1, False, "ACCEPTED", "PHYLUM", "Chordata"),
    (359, 44, False, "ACCEPTED", "CLASS", "Mammalia"),
    (732, 359, False, "ACCEPTED", "ORDER", "Carnivora"),
    (9701, 732, False, "ACCEPTED", "FAMILY", "Canidae"),
    (5219243, 9701, False, "ACCEPTED", "GENUS", "Vulpes"),
    (5219252, 5219243, False, "ACCEPTED", "SPECIES", "Vulpes vulpes"),
    # synonym: parent_key points at the ACCEPTED usage (the canon chase)
    (8207201, 5219252, True, "SYNONYM", "SPECIES", "Canis vulpes"),
    # homonym at a different rank for the preferred-match window
    (999001, 9701, False, "DOUBTFUL", "GENUS", "Vulpes"),
]


def _gbif_line(row) -> str:
    id_, parent, is_syn, status, rank, name = row
    fields = dict.fromkeys(taxon_dim.GBIF_SIMPLE_COLUMNS, "\\N")
    fields.update(
        id=str(id_),
        parent_key="\\N" if parent is None else str(parent),
        is_synonym=str(is_syn).lower(),
        status=status,
        rank=rank,
        scientific_name=name,
        canonical_name=name,
    )
    return "\t".join(fields[c] for c in taxon_dim.GBIF_SIMPLE_COLUMNS)


@pytest.fixture(scope="module")
def gbif_dim_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gbif")
    dump = tmp / "simple.txt.gz"
    with gzip.open(dump, "wt") as f:
        f.write("\n".join(_gbif_line(r) for r in GBIF_ROWS) + "\n")
    nodes = taxon_dim.gbif_nodes_from_simple(spark, str(dump))
    paths = taxon_dim.write_dimension(nodes, str(tmp / "dim"))
    return paths


def test_gbif_build_nodes_shape(spark, gbif_dim_dir):
    nodes = spark.read.parquet(gbif_dim_dir["nodes"])
    assert set(nodes.columns) == {"node_id", "parent_id", "name", "rank", "status", "canon_id"}
    rows = {r["node_id"]: r for r in nodes.collect()}
    assert len(rows) == len(GBIF_ROWS)
    assert rows[1]["parent_id"] is None and rows[1]["rank"] == "kingdom"
    # canon chase precomputed: synonym's canon_id is the accepted usage
    assert rows[8207201]["status"] == "synonym"
    assert rows[8207201]["canon_id"] == 5219252
    assert rows[5219252]["canon_id"] == 5219252


def test_gbif_build_closure_walks_to_root(spark, gbif_dim_dir):
    closure = spark.read.parquet(gbif_dim_dir["closure"])
    anc = {
        r["ancestor_id"]: r["depth"]
        for r in closure.where(
            (F.col("node_id") == 5219252) & (F.col("depth") > 0)
        ).collect()
    }
    # full lineage species→kingdom, correct depths
    assert anc == {5219243: 1, 9701: 2, 732: 3, 359: 4, 44: 5, 1: 6}
    # synonyms carry no subtree: the synonym id appears in no closure edge
    assert closure.where(
        (F.col("node_id") == 8207201) & (F.col("depth") > 0)
    ).count() == 0


def test_built_dim_feeds_name_resolution(spark, gbif_dim_dir):
    """The built dimension drops straight into the engine's J6 resolution
    path (resolve_names): accepted match, synonym detection, the
    status-priority window on the homonym, and a miss."""
    from safedata_validator_spark.engine.hierarchy import resolve_names

    nodes = spark.read.parquet(gbif_dim_dir["nodes"])
    user = spark.createDataFrame(
        [
            ("Vulpes vulpes", "species"),
            ("Canis vulpes", "species"),
            ("Vulpes", "genus"),
            ("Dracula hypothetica", "species"),
        ],
        "name string, rank string",
    )
    out = {r["name"]: r for r in resolve_names(user, nodes).collect()}
    assert out["Vulpes vulpes"]["match_status"] == "found"
    assert out["Canis vulpes"]["match_status"] == "synonym"
    # accepted beats doubtful in the preferred-match window
    assert out["Vulpes"]["match_status"] == "found"
    assert out["Vulpes"]["node_id"] == 5219243
    assert out["Dracula hypothetica"]["match_status"] == "missing"


NCBI_NODES = [
    (1, 1, "no rank"),        # root self-parent → NULL parent in the build
    (2, 131567, "superkingdom"),
    (131567, 1, "no rank"),
    (561, 543, "genus"),
    (543, 2, "family"),
    (562, 561, "species"),
]
NCBI_NAMES = [
    (1, "root", "", "scientific name"),
    (2, "Bacteria", "Bacteria <bacteria>", "scientific name"),
    (2, "eubacteria", "", "genbank common name"),  # non-scientific: dropped
    (131567, "cellular organisms", "", "scientific name"),
    (561, "Escherichia", "", "scientific name"),
    (543, "Enterobacteriaceae", "", "scientific name"),
    (562, "Escherichia coli", "", "scientific name"),
]


def test_ncbi_build_from_dmp(spark, tmp_path):
    nodes_dmp = tmp_path / "nodes.dmp"
    names_dmp = tmp_path / "names.dmp"
    nodes_dmp.write_text(
        "".join(f"{i}\t|\t{p}\t|\t{r}\t|\n" for i, p, r in NCBI_NODES)
    )
    names_dmp.write_text(
        "".join(f"{i}\t|\t{n}\t|\t{u}\t|\t{c}\t|\n" for i, n, u, c in NCBI_NAMES)
    )
    dim = taxon_dim.ncbi_nodes_from_dumps(spark, str(nodes_dmp), str(names_dmp))
    rows = {r["node_id"]: r for r in dim.collect()}
    assert len(rows) == len(NCBI_NODES)  # one scientific name each
    assert rows[1]["parent_id"] is None  # root self-loop broken
    assert rows[562]["name"] == "Escherichia coli" and rows[562]["rank"] == "species"
    paths = taxon_dim.write_dimension(dim, str(tmp_path / "dim"))
    closure = spark.read.parquet(paths["closure"])
    anc = {
        r["ancestor_id"]: r["depth"]
        for r in closure.where((F.col("node_id") == 562) & (F.col("depth") > 0)).collect()
    }
    # E. coli walks genus→family→superkingdom→cellular organisms→root
    assert anc == {561: 1, 543: 2, 2: 3, 131567: 4, 1: 5}
