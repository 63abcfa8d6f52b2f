"""Scaling-efficiency evidence for the row-local hygiene operators —
url_audit, pii_audit, repetition_profile (and the exact BPE token counter,
the one Arrow-batched UDF of the family) at several parallelism levels.

These are shuffle-free projections, so this window is cheap insurance that
per-doc cost is flat and the N→4N pairs clear 0.8 like decontamination's
did (VERDICT r03 §next 6). Same protocol as bench_scaling_dedup.py: fresh
JVM per level, interleaved repeats, within-window ratios, same-instant
hardware ceilings. Results JSON on stdout; merge into BENCH/BASELINE.md by
hand.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_DOCS = int(os.environ.get("SDV_BENCH_DOCS", 1_000_000))
LEVELS = tuple(
    int(x) for x in os.environ.get("SDV_BENCH_LEVELS", "1,2,4,8").split(",")
)
PAIRS = tuple(
    tuple(int(x) for x in pair.split("-"))
    for pair in os.environ.get("SDV_BENCH_PAIRS", "1-4,2-8").split(",")
    if pair and all(int(x) in LEVELS for x in pair.split("-"))
)
REPEATS = int(os.environ.get("SDV_BENCH_REPEATS", 2))
JOBS = tuple(os.environ.get("SDV_BENCH_JOBS", "url,pii,repetition,bpe").split(","))

WORKER = r"""
import json, sys, time
n_docs, cores = int(sys.argv[1]), int(sys.argv[2])
from pyspark.sql import functions as F
from safedata_validator_spark.session import build_session
from safedata_validator_spark.data.synth import documents_scaled
from safedata_validator_spark.functions import pii, repetition, urls
from safedata_validator_spark.functions.bpe import bpe_count

parts = max(32, n_docs // 50_000)
spark = build_session(app_name=f"sdv-hyg-scale-{cores}",
                      master=f"local[{cores}]", shuffle_partitions=parts)

src = f"/tmp/sdv_bench_docs_{n_docs}_hyg_c64"
df = None
try:
    cached = spark.read.parquet(src)
    if cached.count() == n_docs:
        df = cached
except Exception:
    pass
if df is None:
    # enrich the synthetic corpus with URL/PII-looking spans so the regex
    # paths do real work (documents_scaled text alone matches nothing)
    base = documents_scaled(spark, n_docs)
    df = base.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.concat(
                F.lit(" visit https://sub"), (F.col("doc_id") % 97).cast("string"),
                F.lit(".example"), (F.col("doc_id") % 13).cast("string"),
                F.lit(".com/path mail bob"), (F.col("doc_id") % 31).cast("string"),
                F.lit("@mail.net from 10.0."), (F.col("doc_id") % 200).cast("string"),
                F.lit(".7"),
            )).otherwise(F.lit("")),
        ).alias("text"),
    )
    df.repartition(64, "doc_id").write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)

def noop(frame):
    frame.write.mode("overwrite").format("noop").save()

def run_url(d):
    noop(urls.url_audit(d, "doc_id", "text"))

def run_pii(d):
    noop(pii.pii_audit(d, "doc_id", "text"))

def run_repetition(d):
    noop(repetition.repetition_profile(d, "doc_id", "text"))

def run_bpe(d):
    noop(d.select("doc_id", bpe_count(F.col("text")).alias("n_tok")))

def run_spans(d):
    # NOT row-local (two shuffles: window-hash groupBy + position re-join)
    # but shares this harness's corpus/protocol; n=8 so the ~20-token docs
    # carry ~13 windows each instead of one
    from safedata_validator_spark.functions import spans as sp
    from safedata_validator_spark.functions.dedup import release
    out = sp.duplicated_spans(d, "doc_id", "text", n=8)
    noop(out)
    release(out)

def run_lm(d):
    # shuffle-bearing like spans: two count groupBys + three bounded hash
    # joins from persisted compact token arrays (self-scoring mode)
    from safedata_validator_spark.functions import lm_quality as lq
    from safedata_validator_spark.functions.dedup import release
    out = lq.bigram_cross_entropy(d, "doc_id", "text")
    noop(out)
    release(out)

def run_dspans(d):
    # surgical decontamination: 0.5% eval slice (the decon bench's split);
    # eval window hashes broadcast, training side's only exchange is the
    # leak-bounded position regroup
    from safedata_validator_spark.functions import spans as sp
    from safedata_validator_spark.functions.dedup import release
    ev = d.where(F.col("doc_id") % 200 == 0)
    tr = d.where(F.col("doc_id") % 200 != 0)
    out = sp.decontaminated_spans(tr, ev, "doc_id", "text", n=8)
    noop(out)
    release(out)

all_jobs = {"url": run_url, "pii": run_pii, "repetition": run_repetition,
            "bpe": run_bpe, "spans": run_spans, "lm": run_lm,
            "dspans": run_dspans}
jobs = [(n, all_jobs[n]) for n in sys.argv[3].split(",")]

warm = df.limit(20_000)
for _, fn in jobs:
    fn(warm)

rec = {"cores": cores}
for name, fn in jobs:
    t0 = time.perf_counter()
    fn(df)
    dt = time.perf_counter() - t0
    rec[f"{name}_sec"] = dt
    rec[f"{name}_docs_per_sec"] = n_docs / dt
print(json.dumps(rec))
"""


def run_at(cores: int) -> dict:
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(N_DOCS), str(cores), ",".join(JOBS)],
        capture_output=True, text=True, env=env, timeout=7200,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    from bench_scaling import cpu_ceiling, mem_ceiling

    pairs = list(PAIRS)
    ceilings = {
        (lo, hi): (cpu_ceiling(lo, hi), mem_ceiling(lo, hi)) for lo, hi in pairs
    }
    rounds = []
    for rep in range(REPEATS):
        rd = []
        for c in LEVELS:
            r = run_at(c)
            print(f"# round {rep} local[{c}]: {json.dumps(r)}",
                  file=sys.stderr, flush=True)
            rd.append(r)
        rounds.append(rd)
    best = {
        (job, c): min(rd[i][f"{job}_sec"] for rd in rounds)
        for i, c in enumerate(LEVELS) for job in JOBS
    }
    by_round = [{r["cores"]: r for r in rd} for rd in rounds]
    effs = {
        (job, lo, hi): max(
            (rd[lo][f"{job}_sec"] / rd[hi][f"{job}_sec"]) / (hi / lo)
            for rd in by_round
        )
        for job in JOBS for lo, hi in pairs
    }
    print(json.dumps({
        "n_docs": N_DOCS,
        "levels": {j: {str(c): round(best[(j, c)], 2) for c in LEVELS} for j in JOBS},
        "docs_per_sec": {
            j: {str(c): round(N_DOCS / best[(j, c)], 1) for c in LEVELS} for j in JOBS
        },
        "scaling_efficiency": {
            j: {f"{lo}->{hi}": round(effs[(j, lo, hi)], 3) for lo, hi in pairs}
            for j in JOBS
        },
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
