"""Scaling-efficiency evidence for connected-component duplicate clustering
(functions.dedup.connected_components): the alternating large-star /
small-star contraction on a synthetic duplicate graph at several
parallelism levels — same protocol as bench_scaling_dedup.py (fresh JVM
per level, interleaved repeats, within-window ratios, same-instant
hardware ceilings).

Graph shape mirrors a real dedup pair set: N_EDGES edges forming mostly
small dense clusters (size-10 cliquish chains — the overwhelming majority
of near-dup groups) PLUS one 100k-node path (the adversarial
diameter case star contraction exists for: naive min-label propagation
would need 100k rounds; contraction closes it in O(log² n)).

Results JSON on stdout; merge into BENCH/BASELINE.md by hand (this script
never rewrites the hand-curated multi-window section).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_EDGES = int(os.environ.get("SDV_BENCH_EDGES", 10_000_000))
#: nodes in the adversarial long-path component (0 = pure size-10-chain
#: graph, the dedup-shaped case: ~3 contraction rounds instead of ~17)
PATH_NODES = int(os.environ.get("SDV_BENCH_PATH_NODES", 100_000))
LEVELS = tuple(
    int(x) for x in os.environ.get("SDV_BENCH_LEVELS", "1,2,4,8").split(",")
)
PAIRS = tuple(
    tuple(int(x) for x in pair.split("-"))
    for pair in os.environ.get("SDV_BENCH_PAIRS", "1-4,2-8").split(",")
    if pair and all(int(x) in LEVELS for x in pair.split("-"))
)
REPEATS = int(os.environ.get("SDV_BENCH_REPEATS", 2))

WORKER = r"""
import json, sys, time
n_edges, cores, path_nodes = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
from pyspark.sql import functions as F
from safedata_validator_spark.session import build_session
from safedata_validator_spark.functions.dedup import connected_components

parts = max(32, n_edges // 500_000)
spark = build_session(app_name=f"sdv-cc-scale-{cores}",
                      master=f"local[{cores}]", shuffle_partitions=parts)

# deterministic edge table, materialized ONCE and reused by every level:
# size-10 chain clusters over the id space, plus one 100k-node path wired
# through ids offset by 10^12 (disjoint from the cluster ids)
src = f"/tmp/sdv_bench_cc_edges_{n_edges}_p{path_nodes}_c64"
df = None
try:
    cached = spark.read.parquet(src)
    if cached.count() == n_edges:
        df = cached
except Exception:
    pass
if df is None:
    base = (
        spark.range(n_edges - path_nodes)
        .select(
            F.col("id").alias("id_a"),
            F.when(F.col("id") % 10 != 9, F.col("id") + 1)
             .otherwise(F.col("id") - 9).alias("id_b"),
        )
    )
    if path_nodes:
        path = spark.range(path_nodes).select(
            (F.col("id") + F.lit(10**12)).alias("id_a"),
            (F.col("id") + F.lit(10**12) + 1).alias("id_b"),
        )
        base = base.unionByName(path)
    base.repartition(64).write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)

stats = {}
def run_cc(d):
    out = connected_components(d, stats=stats)
    out.write.mode("overwrite").format("noop").save()

def jobs_so_far():
    try:
        return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    except Exception:
        return -1

# warm-up slice: codegen + checkpoint machinery
run_cc(df.limit(100_000))

j0 = jobs_so_far()
t0 = time.perf_counter()
run_cc(df)
dt = time.perf_counter() - t0
print(json.dumps({"cores": cores, "cc_sec": dt, "edges_per_sec": n_edges / dt,
                  "rounds": stats.get("rounds"), "spark_jobs": jobs_so_far() - j0}))
"""


def run_at(cores: int) -> dict:
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(N_EDGES), str(cores), str(PATH_NODES)],
        capture_output=True, text=True, env=env, timeout=7200,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    from bench_scaling import cpu_ceiling, mem_ceiling

    ceilings = {
        (lo, hi): (cpu_ceiling(lo, hi), mem_ceiling(lo, hi)) for lo, hi in PAIRS
    }
    rounds = []
    for rep in range(REPEATS):
        rd = []
        for c in LEVELS:
            r = run_at(c)
            print(f"# round {rep} local[{c}]: {json.dumps(r)}", file=sys.stderr, flush=True)
            rd.append(r)
        rounds.append(rd)
    best = {c: min(rd[i]["cc_sec"] for rd in rounds) for i, c in enumerate(LEVELS)}
    by_round = [{r["cores"]: r for r in rd} for rd in rounds]
    effs = {
        (lo, hi): max(
            (rd[lo]["cc_sec"] / rd[hi]["cc_sec"]) / (hi / lo) for rd in by_round
        )
        for lo, hi in PAIRS
    }
    print(json.dumps({
        "n_edges": N_EDGES,
        "path_nodes": PATH_NODES,
        "levels": {str(c): round(best[c], 2) for c in LEVELS},
        "edges_per_sec": {str(c): round(N_EDGES / best[c], 1) for c in LEVELS},
        "scaling_efficiency": {f"{lo}->{hi}": round(e, 3) for (lo, hi), e in effs.items()},
        "ceilings": {
            f"{lo}->{hi}": {"cpu": round(cc, 3), "membw": round(mc, 3)}
            for (lo, hi), (cc, mc) in ceilings.items()
        },
        "target": 0.8,
        "all_runs": rounds,
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
