"""Multi-JVM 8→32 scaling evidence (VERDICT r02 §next 4): the same
validation job on IDENTICAL input, but across PROCESS boundaries — a local
standalone cluster (1 master + 4 worker JVMs × 8 cores each on this box)
instead of one big local[n] JVM. ``spark.cores.max`` selects how many
8-core executors the job gets (8 → one executor JVM, 32 → four), so the
8→32 pair crosses executor-process boundaries exactly as adding cluster
nodes does — real serialized shuffle blocks between JVMs, separate heaps,
separate GC, separate codegen caches.

What this isolates: the single-JVM local[n] study (bench_scaling.py)
cannot distinguish "the memory system saturates" from single-JVM artifacts
(GC pressure on one heap, scheduler contention, codegen cache contention).
Running the identical pair with four separate 8-core executor JVMs rules
the single-JVM artifacts in or out; the same-instant memory-bandwidth
ceiling (fixed streaming work per process, no Spark) is still quoted,
because four processes on one socket share the same memory controllers —
the one resource a REAL 4-node cluster multiplies and this box cannot.

Protocol mirrors bench_scaling.py: one materialized parquet table read by
every level, fresh driver JVM per run, warm-up slice before timing,
interleaved repeats with ratios taken within a round, ceilings measured at
the same instant. Results merge into BENCH/BASELINE.md under the
'## Multi-JVM' marker.

Usage: python bench_cluster.py   (starts/stops its own master+workers)
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

import pyspark

N_TURNS = int(os.environ.get("SDV_BENCH_TURNS", 40_000_000))
LEVELS = tuple(int(x) for x in os.environ.get("SDV_BENCH_LEVELS", "8,32").split(","))
PAIRS = (
    tuple(
        tuple(int(x) for x in pair.split("-"))
        for pair in os.environ.get("SDV_BENCH_PAIRS", "8-32").split(",")
        if pair and all(int(x) in LEVELS for x in pair.split("-"))
    )
)
REPEATS = int(os.environ.get("SDV_BENCH_REPEATS", 2))
#: cores per worker/executor JVM. The default 8 keeps the original 8→32
#: protocol (1 vs 4 eight-core executors, crossing the socket's bandwidth
#: saturation point). SDV_BENCH_EXEC_CORES=2 with LEVELS=2,8 instead
#: measures 1 vs 4 TWO-core executors — the same N→4N executor-count axis
#: in the UNSATURATED regime (8 total cores sit below this box's ~8-core
#: memory-system knee), the closest this sandbox gets to adding real
#: cluster nodes that each bring their own memory controllers.
EXEC_CORES = int(os.environ.get("SDV_BENCH_EXEC_CORES", 8))
#: write/refresh the BENCH/BASELINE.md section (only the default 8-core
#: protocol merges; ad-hoc executor widths report JSON-only so the
#: hand-merged section is not clobbered)
WRITE_MD = os.environ.get("SDV_BENCH_MD", "1") == "1" and EXEC_CORES == 8
#: heap per executor JVM. Keep 4g: a direct same-window A/B (round 5,
#: BENCH/cluster_2core_*.json) measured the 4×2-core level at 133 s with
#: 4g heaps vs 288 s with 8g — four 8g AlwaysPreTouch'd heaps re-trigger
#: this microVM's big-heap pathology (the 10g window's 0.08 ratio, r2)
#: even though the touch cost itself lands before the timed window. The
#: earlier heap-starvation reading (70%+ GC at both levels) was a storm
#: artifact: the GC-heavy window also showed a 1.9× same-level swing and
#: a 2.0× host stream-probe drift, and the calm-window A/B refuted it.
EXEC_MEM = os.environ.get("SDV_BENCH_EXEC_MEM", "4g")
SPARK_HOME = os.path.dirname(pyspark.__file__)
MASTER_URL = "spark://127.0.0.1:7077"
LOG_DIR = "/tmp/sdv_cluster_logs"

WORKER = r"""
import json, os, sys, time
n_turns, cores, exec_cores = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
exec_mem = sys.argv[4]
os.environ["PYSPARK_PYTHON"] = sys.executable
from safedata_validator_spark.session import build_session
from safedata_validator_spark.data.synth import dims, transcripts_scaled
from safedata_validator_spark.engine.validator import ValidationEngine
from safedata_validator_spark.rules.presets import transcript_ruleset

parts = max(cores, n_turns // 1_000_000)
# fixed-width executors: cores.max picks HOW MANY executor JVMs the job
# receives (exec_cores → 1, 4*exec_cores → 4) — the N→4N axis is executor
# count, exactly the north rule's wording
spark = build_session(app_name=f"sdv-cluster-{cores}",
                      master="spark://127.0.0.1:7077",
                      shuffle_partitions=parts,
                      extra_conf={"spark.executor.cores": str(exec_cores),
                                  # modest heaps + pre-touch: this microVM
                                  # faults memory lazily, and 4 big lazily-
                                  # faulted executor heaps slowed the
                                  # identical job ~3x (first measurement
                                  # window used 10g: 8->32 came out 0.08);
                                  # AlwaysPreTouch moves the fault cost to
                                  # JVM start, outside the timed window
                                  "spark.executor.memory": exec_mem,
                                  "spark.executor.extraJavaOptions": "-XX:+AlwaysPreTouch",
                                  # on one host every executor is equally
                                  # "local"; the default 3s locality wait
                                  # instead chases cached blocks onto the
                                  # one executor that materialized them
                                  # (observed: a 9-task stage scheduled
                                  # 9/9 on executor 0 while 3 executors
                                  # idled). With 0s the same stages spread
                                  # evenly (round-5 logs: 2-4 tasks per
                                  # executor); wall time is within window
                                  # noise of the 3s runs — placement was a
                                  # symptom, the binding cost is the
                                  # inter-JVM shuffle itself (see BASELINE
                                  # Multi-JVM appendix).
                                  "spark.locality.wait": "0s",
                                  "spark.cores.max": str(cores)})
import hashlib, inspect
gen_tag = hashlib.sha256(inspect.getsource(transcripts_scaled).encode()).hexdigest()[:8]
src = f"/tmp/sdv_bench_transcripts_{n_turns}_{gen_tag}_c64"
try:
    df = spark.read.parquet(src)
except Exception:
    transcripts_scaled(spark, n_turns).repartition(64, "conv_id").sortWithinPartitions("conv_id", "turn_idx").write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)
engine, rs, d = ValidationEngine(), transcript_ruleset(), dims(spark)
warm = engine.validate(df.limit(50_000), rs, d, with_stats=True)
for frame in (warm.violations, warm.verdicts, warm.stats):
    frame.write.mode("overwrite").format("noop").save()
warm.unpersist()
t0 = time.perf_counter()
res = engine.validate(df, rs, d, with_stats=True)
res.violations.persist()
res.violations.write.mode("overwrite").format("noop").save()
res.verdicts.write.mode("overwrite").format("noop").save()
res.stats.write.mode("overwrite").format("noop").save()
dt = time.perf_counter() - t0
print(json.dumps({"cores": cores, "sec": dt, "turns_per_sec": n_turns / dt}))
"""

MARKER = "## Multi-JVM 8→32 — standalone cluster on one box"
HISTORY = "## Measurement history"


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        return s.connect_ex(("127.0.0.1", port)) == 0


def start_cluster(n_workers: int = 4) -> list[subprocess.Popen]:
    os.makedirs(LOG_DIR, exist_ok=True)
    env = dict(
        os.environ,
        SPARK_HOME=SPARK_HOME,
        SPARK_NO_DAEMONIZE="1",
        SPARK_LOG_DIR=LOG_DIR,
    )
    procs = []
    spark_class = os.path.join(SPARK_HOME, "bin", "spark-class")
    with open(os.path.join(LOG_DIR, "master.log"), "w") as log:
        procs.append(
            subprocess.Popen(
                [spark_class, "org.apache.spark.deploy.master.Master",
                 "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8099"],
                stdout=log, stderr=subprocess.STDOUT, env=env,
            )
        )
    for _ in range(60):
        if _port_open(7077):
            break
        time.sleep(1)
    else:
        raise RuntimeError("master did not bind :7077")
    for i in range(n_workers):
        with open(os.path.join(LOG_DIR, f"worker_{i}.log"), "w") as log:
            procs.append(
                subprocess.Popen(
                    [spark_class, "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                     "--cores", str(EXEC_CORES), "--memory", "20g",
                     "--webui-port", str(8100 + i),
                     "--work-dir", f"/tmp/sdv_worker_{i}"],
                    stdout=log, stderr=subprocess.STDOUT, env=env,
                )
            )
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


def run_at(cores: int) -> dict:
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(N_TURNS), str(cores), str(EXEC_CORES),
         EXEC_MEM],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    from bench_scaling import cpu_ceiling, mem_ceiling

    procs = start_cluster()
    try:
        pairs = list(PAIRS)
        ceilings = {
            (lo, hi): (cpu_ceiling(lo, hi), mem_ceiling(lo, hi)) for lo, hi in pairs
        }
        rounds = []
        for rep in range(REPEATS):
            rd = []
            for c in LEVELS:
                r = run_at(c)
                print(f"# round {rep} cores.max={c}: {json.dumps(r)}",
                      file=sys.stderr, flush=True)
                rd.append(r)
            rounds.append(rd)
    finally:
        stop_cluster(procs)

    best = {
        c: min((rd[i] for rd in rounds), key=lambda r: r["sec"])
        for i, c in enumerate(LEVELS)
    }
    by_round = [{r["cores"]: r["sec"] for r in rd} for rd in rounds]
    effs = {
        (lo, hi): max((rd[lo] / rd[hi]) / (hi / lo) for rd in by_round)
        for lo, hi in pairs
    }
    result = {
        "n_turns": N_TURNS,
        "mode": f"standalone cluster, 4 workers x {EXEC_CORES} cores, "
                f"executor JVMs = cores.max/{EXEC_CORES}",
        "exec_cores": EXEC_CORES,
        "exec_mem": EXEC_MEM,
        "executors": {str(c): c // EXEC_CORES for c in LEVELS},
        "levels": {str(c): best[c] for c in LEVELS},
        "scaling_efficiency": {f"{lo}->{hi}": round(e, 3) for (lo, hi), e in effs.items()},
        "ceilings": {
            f"{lo}->{hi}": {"cpu": round(cc, 3), "membw": round(mc, 3)}
            for (lo, hi), (cc, mc) in ceilings.items()
        },
        "all_runs": rounds,
    }
    print(json.dumps(result))

    if not WRITE_MD:
        return

    lvl_rows = "\n".join(
        f"| {c // 8} executor JVM(s) × 8 cores | {best[c]['sec']:.2f} "
        f"| {best[c]['turns_per_sec']:,.0f} |"
        for c in LEVELS
    )
    eff_rows = "\n".join(
        f"| {lo}→{hi} (N→4N executors) | **{effs[(lo, hi)]:.3f}** "
        f"| {ceilings[(lo, hi)][0]:.2f} | {ceilings[(lo, hi)][1]:.2f} "
        f"| {min(effs[(lo, hi)] / min(ceilings[(lo, hi)][1], 1.0), 1.0):.3f} |"
        for lo, hi in pairs
    )
    md = f"""{MARKER}

The literal 8→32 pair re-measured ACROSS PROCESS BOUNDARIES: a local
standalone cluster (1 master + 4 worker JVMs × 8 cores), with
``spark.cores.max`` selecting 1 vs 4 executor JVMs of 8 cores each for the
identical {N_TURNS:,}-turn validate job (same parquet table, same rule
set, fresh driver per run, min of {REPEATS} interleaved repeats, ratios
within a round). Executor-to-executor shuffle here is real serialized
block transfer between JVMs — separate heaps, GC, and codegen caches —
so a single-JVM artifact (shared-heap GC, scheduler or codegen contention)
would show up as a DIFFERENT 8→32 ratio than local[8]→local[32].

| executors | wall sec | validated turns/sec |
|---|---|---|
{lvl_rows}

| scale-up | efficiency | CPU ceiling (same instant) | mem-bw ceiling | ceiling-normalized |
|---|---|---|---|---|
{eff_rows}

Reading: the four executor JVMs still share ONE socket's memory
controllers — the same-instant streaming ceiling above is the hardware
bound either way. A multi-JVM ratio that lands at the single-JVM ratio
(≈ the bandwidth ceiling) is a measurement-backed exclusion of
single-JVM artifacts: the limiter is the shared memory system, which a
real 4-node cluster multiplies.
"""
    path = "BENCH/BASELINE.md"
    os.makedirs("BENCH", exist_ok=True)
    try:
        with open(path) as fh:
            old = fh.read()
    except FileNotFoundError:
        old = ""
    if MARKER in old:
        head, rest = old.split(MARKER, 1)
        tail = rest[rest.index(HISTORY):] if HISTORY in rest else ""
    elif HISTORY in old:
        head, tail = old[: old.index(HISTORY)], old[old.index(HISTORY):]
    else:
        head, tail = old, ""
    with open(path, "w") as fh:
        fh.write(head.rstrip() + "\n\n" + md + ("\n" + tail if tail else ""))


if __name__ == "__main__":
    main()
