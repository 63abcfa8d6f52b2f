"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the transcript
validation engine at a scale proportional to the sf. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}.

Materialisation uses the noop sink (full computation, no output cost).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    "profile_lineitem",
    "sequential_lineitem",
    "unique_key_orders",
    "ref_integrity_events",
    "monotone_events",
    "grammar_events",
    "drift_psi_lineitem",
    "pricing_summary",
    "top_revenue_orders",
    "dedup_ngram_jaccard",
    "curate_corpus",
    "minhash_lsh_docs",
    "simhash_docs",
    "embedding_topk",
    "lsh_ann_topk",
]

#: round-3 curation/hygiene operators, timed separately from HEADLINE so the
#: headline_suite_sec metric keeps its round-over-round composition
CURATION = [
    "decontaminate_docs",
    "dedup_clusters_docs",
    "repetition_docs",
    "mixture_resample_docs",
    "pack_sequences_docs",
    "corpus_split_docs",
    "pii_audit_docs",
]

#: transcript-validation bench size per scale factor (turns)
TURNS_PER_SF = 40_000_000  # sf0.1 → 4M turns, sf1 → 40M


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def host_probe(procs: int) -> dict:
    """Same-instant hardware probes (the drift-normalization protocol from
    bench_scaling.py, reduced to ABSOLUTE wall times): a register-bound spin
    and a 100MB-streaming sum, both at the bench's own parallelism. The
    shared host drifts up to ~2.4x between windows; quoting these alongside
    every bench run lets two rounds' numbers be compared on the same scale
    (normalize by stream_sec — Spark scan/shuffle work is bandwidth-bound)."""
    import multiprocessing as mp

    from bench_scaling import _spin, _stream

    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(_spin, [30_000_000] * procs)
    spin = time.perf_counter() - t0
    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(_stream, range(procs))
    stream = time.perf_counter() - t0
    return {"procs": procs, "spin_sec": round(spin, 3), "stream_sec": round(stream, 3)}


def run(spark, sf_dir: str, sf: float) -> dict:
    from safedata_validator_spark.data.synth import dims, transcripts_scaled
    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.queries import BENCH_QUERIES as QUERIES
    from safedata_validator_spark.rules.presets import transcript_ruleset

    # JVM/codegen warm-up so the first timed query isn't charged for it.
    # The dedup/doc pipelines get their own warm pass over a tiny slice:
    # their generated classes (normalize/shingle/signature codegen) are
    # disjoint from the relational queries', and with self-contained cache
    # release (round 3) no timed query inherits a predecessor's warm cache
    # — so without this, the first dedup timing would measure the compiler
    # (same rationale as the validate warm-up below; compile cost is fixed
    # per JVM and amortizes to nothing at production scale)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    materialize(QUERIES["pricing_summary"](spark, sf_dir))
    from safedata_validator_spark.functions import dedup as _dd

    docs_slice = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    for warm_fn in (
        lambda d: _dd.minhash_lsh_dedup(d, "doc_id", "text", max_df=20),
        lambda d: _dd.ngram_jaccard_pairs(d, "doc_id", "text", max_df=20),
        lambda d: _dd.simhash_near_pairs(d, "doc_id", "text"),
    ):
        w = warm_fn(docs_slice)
        materialize(w)
        _dd.release(w)

    timings: dict[str, float] = {}

    # The flagship metric runs FIRST: after 14 other queries the single
    # shared JVM carries enough heap fragmentation / broadcast garbage to
    # inflate a large job ~2-3× — measured, not hypothetical. The input is a
    # materialized parquet table (written once, untimed, deterministic) so
    # the timed job exercises the production scan path — columnar IO with
    # per-pass column pruning — exactly as it would against Iceberg.
    n_turns = max(int(TURNS_PER_SF * sf), 100_000)
    # cache key includes a generator-source hash: a changed generator in a
    # later round must never silently benchmark stale cached data
    import hashlib
    import inspect

    gen_tag = hashlib.sha256(
        inspect.getsource(transcripts_scaled).encode()
    ).hexdigest()[:8]
    # _c64: 64 files hash-partitioned by conv_id, conversations sorted
    # contiguously within each — the representative production layout (many
    # even files AND write-clustering, so RLE compression works); the
    # generator's own 4-file layout capped the scan at ~8 skewed splits
    src = os.environ.get(
        "SPARK_GRAFT_TRANSCRIPTS", f"/tmp/sdv_bench_transcripts_{n_turns}_{gen_tag}_c64"
    )
    # 'read succeeds' is not enough cache validation: a partially written
    # directory from a crashed prior run reads fine with missing rows —
    # verify the row count and regenerate on mismatch
    df = None
    try:
        cached = spark.read.parquet(src)
        if cached.count() == n_turns:
            df = cached
    except Exception:
        pass
    if df is None:
        transcripts_scaled(spark, n_turns).repartition(64, "conv_id").sortWithinPartitions("conv_id", "turn_idx").write.mode("overwrite").parquet(src)
        df = spark.read.parquet(src)
    # scan-split sizing by data volume (see session.tune_scan_splits): the
    # default 128 MB split + 4 MB open cost planned the 75 MB in-suite
    # flagship table as THREE scan splits — the fused single-scan rule
    # evaluation runs inside the scan stage, so it capped at 3-way
    # parallelism on a 32-core level. At sf0.1 the 4 MB floor binds
    # (~19-33 splits); at production volume the 128 MB ceiling restores
    # native behavior. Applied before any timed query; re-read below so
    # the flagship scan picks up the new split plan.
    from safedata_validator_spark.session import tune_scan_splits

    tune_scan_splits(spark, sf_dir, src)
    df = spark.read.parquet(src)
    engine = ValidationEngine()
    rs = transcript_ruleset()
    d = dims(spark)
    # warm the validate plans' whole-stage codegen on a tiny slice: the
    # generated classes are keyed by source, so the timed run reuses them.
    # Compile time (~5-10 s here) is a fixed JVM cost a production-scale job
    # amortizes to nothing — charging it to a 25 s benchmark job would
    # measure the compiler, not the engine.
    warm = engine.validate(df.limit(50_000), rs, d, with_stats=True)
    materialize(warm.violations)
    materialize(warm.verdicts)
    materialize(warm.stats)
    warm.unpersist()  # RunResult.unpersist is blocking
    # the shared host's background load drifts ±40% between minutes; the
    # flagship metric runs twice and reports the min (the standard
    # noisy-host protocol, same as bench_scaling's interleaved repeats)
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = engine.validate(df, rs, d, with_stats=True)
        res.violations.persist()
        materialize(res.violations)  # verdicts reuse the cached violations
        materialize(res.verdicts)
        materialize(res.stats)
        dt = min(dt, time.perf_counter() - t0)
        res.violations.unpersist(blocking=True)
        res.unpersist()
        spark.catalog.clearCache()
    timings["transcript_validate"] = round(dt, 3)

    from safedata_validator_spark.functions.dedup import release

    for name in HEADLINE:
        t0 = time.perf_counter()
        q = QUERIES[name](spark, sf_dir)
        materialize(q)
        timings[name] = round(time.perf_counter() - t0, 3)
        # dedup/curation pipelines hand their persisted shingle tables back
        # for caller-controlled release — free them so repeated runs in this
        # long-lived session don't accumulate cached blocks
        release(q)

    # round-3 curation/hygiene operators, timed SEPARATELY so the headline
    # metric stays comparable round-over-round (same 16-query composition)
    curation: dict[str, float] = {}
    for name in CURATION:
        t0 = time.perf_counter()
        q = QUERIES[name](spark, sf_dir)
        materialize(q)
        curation[name] = round(time.perf_counter() - t0, 3)
        release(q)

    return {
        "timings": timings,
        "curation": curation,
        "n_turns": n_turns,
        "validate_sec": dt,
    }


#: a measurement window is declared CONTENDED when the 100MB-streaming
#: probe's wall time drifts by more than this factor between the before and
#: after probes — the r4 contaminated window showed 6.6× (2.48 s → 16.34 s)
#: while clean windows stay within ~1.2×. Spark scan/shuffle work is
#: bandwidth-bound, so a drifting stream probe means the suite timings mix
#: two different machines' worth of memory bandwidth.
CONTENTION_RATIO = float(os.environ.get("SDV_BENCH_CONTENTION_RATIO", "1.5"))
#: bounded retries: rerun the whole suite at most this many times total
#: while the window keeps coming back contended, then stamp it honestly
MAX_ATTEMPTS = int(os.environ.get("SDV_BENCH_MAX_ATTEMPTS", "2"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.1

    from safedata_validator_spark.session import build_session

    spark = build_session(
        app_name="sdv-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # contention-aware protocol (VERDICT r04 §wrong 2): probe host memory
    # bandwidth before and after the suite; if the window drifted, the
    # numbers are not the engine's — rerun (bounded), else stamp the JSON
    # "window": "contended" so a bad artifact can never masquerade as a
    # code regression. The best (least-drifted) attempt is reported.
    attempts = []
    best = None
    for attempt in range(1, MAX_ATTEMPTS + 1):
        probe_before = host_probe(int(cpus))
        out = run(spark, sf_dir, sf)
        probe_after = host_probe(int(cpus))
        a, b = probe_before["stream_sec"], probe_after["stream_sec"]
        drift = round(max(a, b) / max(min(a, b), 1e-9), 3)
        rec = {
            "out": out,
            "probe_before": probe_before,
            "probe_after": probe_after,
            "drift": drift,
        }
        attempts.append(
            {"attempt": attempt, "stream_before": a, "stream_after": b, "drift": drift}
        )
        if best is None or drift < best["drift"]:
            best = rec
        if drift <= CONTENTION_RATIO:
            break
        print(
            f"bench window contended (stream probe drift {drift}x > "
            f"{CONTENTION_RATIO}x), attempt {attempt}/{MAX_ATTEMPTS}",
            file=sys.stderr,
        )
    out = best["out"]
    window = "clean" if best["drift"] <= CONTENTION_RATIO else "contended"
    total = round(sum(out["timings"].values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": out["timings"],
                "curation_queries": out["curation"],
                "curation_suite_sec": round(sum(out["curation"].values()), 3),
                "sf": sf,
                "turns_per_sec": round(out["n_turns"] / out["validate_sec"], 1),
                "validated_turns": out["n_turns"],
                "cpus": int(cpus),
                "host_probe_before": best["probe_before"],
                "host_probe_after": best["probe_after"],
                "window": window,
                "probe_drift_ratio": best["drift"],
                "contention_ratio_threshold": CONTENTION_RATIO,
                "attempts": attempts,
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
