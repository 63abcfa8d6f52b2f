"""Per-query isolation bench (guide §1.4): times each headline/curation
query alone with the noop sink, labels jobs, records per-job wall times via
a Spark listener replacement — event logs — and can dump
``.explain("formatted")`` plans. bench.py stays the FROZEN driver artifact;
this file exists so optimization rounds can cite isolated numbers.

Usage:
    python bench_extra.py [query ...]          # time queries (default: all)
    SDV_PLANS_DIR=plans/r06 SDV_PLAN_SUFFIX=_before python bench_extra.py
    SDV_EVLOG=/tmp/evlog python bench_extra.py minhash_lsh_docs
"""

from __future__ import annotations

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
    plans_dir = os.environ.get("SDV_PLANS_DIR")
    plan_suffix = os.environ.get("SDV_PLAN_SUFFIX", "")

    from safedata_validator_spark.session import build_session

    extra = {}
    if evlog:
        os.makedirs(evlog, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evlog,
        }
    spark = build_session(
        app_name="sdv-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra,
    )

    from safedata_validator_spark.functions import dedup as _dd
    from safedata_validator_spark.queries import BENCH_QUERIES as QUERIES

    names = sys.argv[1:] or (
        [
            "profile_lineitem", "sequential_lineitem", "unique_key_orders",
            "ref_integrity_events", "monotone_events", "grammar_events",
            "drift_psi_lineitem", "pricing_summary", "top_revenue_orders",
            "dedup_ngram_jaccard", "curate_corpus", "minhash_lsh_docs",
            "simhash_docs", "embedding_topk", "lsh_ann_topk",
            "decontaminate_docs", "dedup_clusters_docs", "repetition_docs",
            "mixture_resample_docs", "pack_sequences_docs",
            "corpus_split_docs", "pii_audit_docs",
        ]
    )

    # warm-up: same protocol as bench.py (codegen compile is a fixed JVM
    # cost; charging it to the first query measures the compiler)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    materialize(QUERIES["pricing_summary"](spark, sf_dir))
    docs_slice = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    for warm_fn in (
        lambda d: _dd.minhash_lsh_dedup(d, "doc_id", "text", max_df=20),
        lambda d: _dd.ngram_jaccard_pairs(d, "doc_id", "text", max_df=20),
        lambda d: _dd.simhash_near_pairs(d, "doc_id", "text"),
    ):
        w = warm_fn(docs_slice)
        materialize(w)
        _dd.release(w)

    timings: dict[str, list[float]] = {}
    for name in names:
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            q = QUERIES[name](spark, sf_dir)
            plan = q._sc._jvm.PythonSQLUtils.explainString(
                q._jdf.queryExecution(), "formatted"
            )
            with open(f"{plans_dir}/{name}{plan_suffix}.txt", "w") as fh:
                fh.write(plan)
            _dd.release(q)
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            q = QUERIES[name](spark, sf_dir)
            materialize(q)
            samples.append(round(time.perf_counter() - t0, 3))
            _dd.release(q)
            spark.sparkContext.setJobDescription(None)
        timings[name] = samples
        print(f"{name}: {samples}", file=sys.stderr)

    out = {
        "metric": "bench_extra_per_query_sec",
        "queries_min": {k: min(v) for k, v in timings.items()},
        "samples": timings,
        "sf_dir": sf_dir,
        "cpus": int(cpus),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
