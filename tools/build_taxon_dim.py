"""Build the taxon nodes dimension + ancestor-closure parquet from a raw
backbone dump — the spark-submit analogue of the reference's taxondb CLI
(taxondb.py:227-405 GBIF, :471+ NCBI).

Usage:
    python tools/build_taxon_dim.py gbif <simple.txt[.gz]> <out_dir>
    python tools/build_taxon_dim.py ncbi <nodes.dmp> <names.dmp> <out_dir>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    from safedata_validator_spark.session import build_session
    from safedata_validator_spark.sources import taxon_dim

    if len(argv) < 3 or argv[0] not in ("gbif", "ncbi"):
        print(__doc__)
        return 2
    spark = build_session(app_name="build-taxon-dim")
    if argv[0] == "gbif":
        nodes = taxon_dim.gbif_nodes_from_simple(spark, argv[1])
        out = argv[2]
    else:
        nodes = taxon_dim.ncbi_nodes_from_dumps(spark, argv[1], argv[2])
        out = argv[3]
    paths = taxon_dim.write_dimension(nodes, out)
    n = spark.read.parquet(paths["nodes"]).count()
    c = spark.read.parquet(paths["closure"]).count()
    print(f"wrote {paths['nodes']} ({n} nodes), {paths['closure']} ({c} closure rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
