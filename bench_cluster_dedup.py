"""Multi-JVM N→4N scaling for the MinHash-LSH dedup job: 1 vs 4 ONE-core
executor JVMs on a local standalone cluster.

Why this experiment exists (round 5): the in-box local[1]→local[4] pair for
minhash at 10M docs reads 0.65–0.73 raw across three windows even with
spill eliminated and clean same-instant hardware probes
(BENCH/dedup_window_10M_r05*.json) — but a single JVM running 4 task
threads shares ONE heap, ONE GC, ONE codegen cache, which is not how a
real cluster adds executors. This harness runs the identical job and input
with executor COUNT as the scaling axis (``spark.cores.max`` = number of
1-core executor JVMs, each with its own fixed-size heap — the per-executor
resources a real cluster holds constant while N grows): real serialized
shuffle blocks between processes, separate heaps, separate GC. Read
against bench_scaling_dedup.py's single-JVM windows, it splits the
residual into "single-JVM artifact" vs "shared-socket bandwidth" — the
only two candidates left after the spill/shuffle-byte accounting.

Protocol mirrors bench_cluster.py (flagship multi-JVM study): one
materialized parquet table read by every level, fresh driver JVM per run,
codegen warm-up slice before timing, same-instant hardware ceilings
(fixed work per process, no Spark). Lessons inherited from that study:
``spark.locality.wait=0s`` (on one host every executor is equally local;
the default 3s chases cached blocks onto one executor) and NO
AlwaysPreTouch at 8g heaps (four pre-touched 8g heaps re-trigger this
microVM's big-heap pathology — BENCH/cluster_2core_windowA/B JSONs).

JSON-only output (no BASELINE.md merge) — windows are appended to the
report by hand with their reading.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

import pyspark

N_DOCS = int(os.environ.get("SDV_BENCH_DOCS", 10_000_000))
#: levels = executor COUNTS (each executor = EXEC_CORES cores)
LEVELS = tuple(int(x) for x in os.environ.get("SDV_BENCH_LEVELS", "1,4").split(","))
PAIRS = tuple(
    tuple(int(x) for x in pair.split("-"))
    for pair in os.environ.get("SDV_BENCH_PAIRS", "1-4").split(",")
    if pair and all(int(x) in LEVELS for x in pair.split("-"))
)
REPEATS = int(os.environ.get("SDV_BENCH_REPEATS", 1))
EXEC_CORES = int(os.environ.get("SDV_BENCH_EXEC_CORES", 1))
#: 8g per 1-core executor = the memory-proportional model the single-JVM
#: memprop windows use (SDV_BENCH_MEM_PER_CORE=8): going N→4N executors
#: multiplies total executor memory by 4 because each new executor brings
#: its own heap. At 8g/core the 10M-doc minhash job spills zero bytes.
EXEC_MEM = os.environ.get("SDV_BENCH_EXEC_MEM", "8g")
JOB = os.environ.get("SDV_BENCH_JOB", "minhash")

SPARK_HOME = os.path.dirname(pyspark.__file__)
MASTER_URL = "spark://127.0.0.1:7077"
LOG_DIR = "/tmp/sdv_cluster_dedup_logs"

WORKER = r"""
import json, os, sys, time
n_docs, n_exec, exec_cores = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
exec_mem, job_name = sys.argv[4], sys.argv[5]
os.environ["PYSPARK_PYTHON"] = sys.executable
from safedata_validator_spark.session import build_session
from safedata_validator_spark.data.synth import documents_scaled
from safedata_validator_spark.functions import dedup as dd

# identical volume-based partitioning at every level (bench_scaling_dedup)
parts = max(32, n_docs // 50_000)
spill_dir = None
extra = {"spark.executor.cores": str(exec_cores),
         "spark.executor.memory": exec_mem,
         "spark.locality.wait": "0s",
         "spark.cores.max": str(n_exec * exec_cores)}
if os.environ.get("SDV_BENCH_SPILL") == "1":
    import tempfile
    spill_dir = tempfile.mkdtemp(prefix=f"sdv_evlog_x{n_exec}_")
    extra.update({"spark.eventLog.enabled": "true",
                  "spark.eventLog.compress": "false",
                  "spark.eventLog.dir": f"file://{spill_dir}"})
spark = build_session(app_name=f"sdv-cluster-dedup-{n_exec}x{exec_cores}",
                      master="spark://127.0.0.1:7077",
                      shuffle_partitions=parts, extra_conf=extra)
import hashlib, inspect
gen_tag = hashlib.sha256(inspect.getsource(documents_scaled).encode()).hexdigest()[:8]
src = f"/tmp/sdv_bench_docs_{n_docs}_{gen_tag}_c64"
df = None
try:
    cached = spark.read.parquet(src)
    if cached.count() == n_docs:
        df = cached
except Exception:
    pass
if df is None:
    documents_scaled(spark, n_docs).repartition(64, "doc_id").write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)

def noop(frame):
    frame.write.mode("overwrite").format("noop").save()

def run_minhash(d):
    out = dd.minhash_lsh_dedup(d, "doc_id", "text", threshold=0.5, max_df=10_000,
                               adaptive_cut=True)
    noop(out)
    dd.release(out)

jobs = {"minhash": run_minhash}
fn = jobs[job_name]
fn(df.limit(50_000))  # codegen warm-up, fixed per-JVM cost
t0 = time.perf_counter()
fn(df)
dt = time.perf_counter() - t0
rec = {"executors": n_exec, "exec_cores": exec_cores,
       f"{job_name}_sec": dt, f"{job_name}_docs_per_sec": n_docs / dt}
if spill_dir is not None:
    spark.stop()
    import glob
    mem = disk = shw = 0
    paths = [p for p in glob.glob(spill_dir + "/**", recursive=True)
             if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                m = ev.get("Task Metrics") or {}
                mem += m.get("Memory Bytes Spilled", 0)
                disk += m.get("Disk Bytes Spilled", 0)
                shw += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0)
    rec["memory_spill_bytes"] = mem
    rec["disk_spill_bytes"] = disk
    rec["shuffle_write_bytes"] = shw
print(json.dumps(rec))
"""


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        return s.connect_ex(("127.0.0.1", port)) == 0


def start_cluster(n_workers: int) -> list[subprocess.Popen]:
    os.makedirs(LOG_DIR, exist_ok=True)
    env = dict(os.environ, SPARK_HOME=SPARK_HOME, SPARK_NO_DAEMONIZE="1",
               SPARK_LOG_DIR=LOG_DIR)
    procs = []
    spark_class = os.path.join(SPARK_HOME, "bin", "spark-class")
    with open(os.path.join(LOG_DIR, "master.log"), "w") as log:
        procs.append(subprocess.Popen(
            [spark_class, "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8099"],
            stdout=log, stderr=subprocess.STDOUT, env=env))
    for _ in range(60):
        if _port_open(7077):
            break
        time.sleep(1)
    else:
        raise RuntimeError("master did not bind :7077")
    for i in range(n_workers):
        with open(os.path.join(LOG_DIR, f"worker_{i}.log"), "w") as log:
            procs.append(subprocess.Popen(
                [spark_class, "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                 "--cores", str(EXEC_CORES), "--memory", "20g",
                 "--webui-port", str(8100 + i),
                 "--work-dir", f"/tmp/sdv_cluster_dedup_worker_{i}"],
                stdout=log, stderr=subprocess.STDOUT, env=env))
    time.sleep(12)
    return procs


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()


def run_at(n_exec: int) -> dict:
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(N_DOCS), str(n_exec), str(EXEC_CORES),
         EXEC_MEM, JOB],
        capture_output=True, text=True, env=env, timeout=7200,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    from bench_scaling import cpu_ceiling, mem_ceiling

    pairs = list(PAIRS)
    ceilings = {
        (lo, hi): (
            cpu_ceiling(lo * EXEC_CORES, hi * EXEC_CORES),
            mem_ceiling(lo * EXEC_CORES, hi * EXEC_CORES),
        )
        for lo, hi in pairs
    }
    procs = start_cluster(max(LEVELS))
    try:
        rounds = []
        for rep in range(REPEATS):
            rd = []
            for n_exec in LEVELS:
                r = run_at(n_exec)
                print(f"# round {rep} executors={n_exec}: {json.dumps(r)}",
                      file=sys.stderr, flush=True)
                rd.append(r)
            rounds.append(rd)
    finally:
        stop_cluster(procs)
    key = f"{JOB}_sec"
    best = {
        n: min((rd[i][key] for rd in rounds)) for i, n in enumerate(LEVELS)
    }
    by_round = [{r["executors"]: r for r in rd} for rd in rounds]
    effs = {
        (lo, hi): max((rd[lo][key] / rd[hi][key]) / (hi / lo) for rd in by_round)
        for lo, hi in pairs
    }
    print(json.dumps({
        "n_docs": N_DOCS,
        "job": JOB,
        "exec_cores": EXEC_CORES,
        "exec_mem": EXEC_MEM,
        "levels_executors": {str(n): round(best[n], 2) for n in LEVELS},
        "docs_per_sec": {str(n): round(N_DOCS / best[n], 1) for n in LEVELS},
        "scaling_efficiency": {
            f"{lo}->{hi}": round(e, 3) for (lo, hi), e in effs.items()
        },
        "ceilings": {
            f"{lo}->{hi}": {"cpu": round(cc, 3), "membw": round(mc, 3)}
            for (lo, hi), (cc, mc) in ceilings.items()
        },
        "target": 0.8,
        "all_runs": rounds,
    }))


if __name__ == "__main__":
    main()
