"""Flagship (transcript_validate) isolation bench — mirrors bench.py's
flagship block exactly (same cached transcripts table, same
tune_scan_splits, same warm pass, same 3-materialization protocol) with
optional event logging, so optimization rounds can decompose the 40M/4M-turn
validation run without touching the frozen bench.py.

Usage:
    SDV_EVLOG=/tmp/evlog_flagship python bench_flagship.py
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys
import time


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    repeats = int(os.environ.get("SDV_REPEATS", "2"))
    evlog = os.environ.get("SDV_EVLOG")
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.1

    from safedata_validator_spark.session import build_session, tune_scan_splits

    extra = {}
    if evlog:
        os.makedirs(evlog, exist_ok=True)
        extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": evlog}
    spark = build_session(
        app_name="sdv-bench-flagship",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra,
    )

    from safedata_validator_spark.data.synth import dims, transcripts_scaled
    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.rules.presets import transcript_ruleset

    n_turns = max(int(40_000_000 * sf), 100_000)
    gen_tag = hashlib.sha256(
        inspect.getsource(transcripts_scaled).encode()
    ).hexdigest()[:8]
    src = os.environ.get(
        "SPARK_GRAFT_TRANSCRIPTS", f"/tmp/sdv_bench_transcripts_{n_turns}_{gen_tag}_c64"
    )
    df = None
    try:
        cached = spark.read.parquet(src)
        if cached.count() == n_turns:
            df = cached
    except Exception:
        pass
    if df is None:
        transcripts_scaled(spark, n_turns).repartition(64, "conv_id").sortWithinPartitions(
            "conv_id", "turn_idx"
        ).write.mode("overwrite").parquet(src)
        df = spark.read.parquet(src)
    tune_scan_splits(spark, sf_dir, src)
    df = spark.read.parquet(src)
    engine = ValidationEngine()
    rs = transcript_ruleset()
    d = dims(spark)
    warm = engine.validate(df.limit(50_000), rs, d, with_stats=True)
    materialize(warm.violations)
    materialize(warm.verdicts)
    materialize(warm.stats)
    warm.unpersist()

    samples = []
    for i in range(repeats):
        spark.sparkContext.setJobDescription(f"flagship run {i}")
        t0 = time.perf_counter()
        res = engine.validate(df, rs, d, with_stats=True)
        res.violations.persist()
        materialize(res.violations)
        materialize(res.verdicts)
        materialize(res.stats)
        samples.append(round(time.perf_counter() - t0, 3))
        res.violations.unpersist(blocking=True)
        res.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(f"flagship run {i}: {samples[-1]}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "flagship_validate_sec",
                "value": min(samples),
                "samples": samples,
                "n_turns": n_turns,
                "turns_per_sec": round(n_turns / min(samples), 1),
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
