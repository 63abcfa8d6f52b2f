"""Driver-contract query catalog: one entry per operator family from
SURVEY.md §2, each expressed Spark-first over the testdata tables, with a
DuckDB-runnable ANSI-SQL oracle producing identical columns.

Determinism rules used throughout (so Spark and DuckDB value-hashes match):
* money aggregates go through DECIMAL(18,2) partial sums (exact, order-free)
  and are finalised as DOUBLE;
* means/stddevs are computed from exact decimal sums + counts in double,
  never via order-dependent streaming aggregates;
* every window order has a unique tie-break key;
* floats that cross engines are round()ed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from safedata_validator_spark.functions import dedup as dd
from safedata_validator_spark.functions import similarity as sim
from safedata_validator_spark.functions import text as tx
from safedata_validator_spark.golden_oracles import GOLDEN_ORACLES


#: (sf_dir, table) → inferred schema. Spark 4 runs one footer-read job per
#: schema-less parquet read; caching the schema makes every load after the
#: first touch job-free (a production deployment gets this for free from the
#: Iceberg/metastore catalog — the schema never comes from data files).
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}

#: (sf_dir, table) → (planned scan splits, total file bytes): feeds the
#: small-input parallelism guard below without re-planning per call.
_SPLIT_CACHE: dict[tuple[str, str], tuple[int, int]] = {}

#: Tables below this size skip the guard: their downstream role is a
#: broadcast/dimension side where an extra exchange buys nothing.
_SPREAD_MIN_BYTES = 128 * 1024


def _t(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    key = (sf_dir, name)
    path = f"{sf_dir}/{name}.parquet"
    if key not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    df = spark.read.schema(_SCHEMA_CACHE[key]).parquet(path)
    if not spread:
        return df
    # Small-input scan-parallelism guard (opt guide §2.5, "input skew: one
    # huge unsplittable file ... repartition immediately after the read"):
    # a compact table whose planned scan yields fewer splits than the
    # session's parallelism serializes every downstream row-local
    # computation — normalize/shingle/regex projections measured as
    # SINGLE-task 1.6-4.6 s jobs on a 32-core level — onto a handful of
    # cores. One round-robin exchange of the (small) input restores full
    # parallelism; at production volume the scan plans >= cores splits at
    # any sane maxPartitionBytes and the guard is a no-op, so nothing here
    # is tuned to the sandbox. OPT-IN (``spread=True``) per query: only
    # paths whose pre-exchange work is compute-dense (text regex/shingle
    # projections, wide aggregations, vector scoring) benefit; a light
    # query's first shuffle already spreads it, so the extra exchange
    # would be pure cost — and order-sensitive double aggregations
    # (lm_quality's occurrence-stream avg) must keep their byte-identical
    # plan lineage.
    n = spark.sparkContext.defaultParallelism
    if key not in _SPLIT_CACHE:
        import os as _os

        total = 0
        if _os.path.isdir(path):
            for root, _dirs, files in _os.walk(path):
                total += sum(
                    _os.path.getsize(_os.path.join(root, f))
                    for f in files
                    if not f.startswith(("_", "."))
                )
        else:
            total = _os.path.getsize(path)
        _SPLIT_CACHE[key] = (df.rdd.getNumPartitions(), total)
    n_splits, total = _SPLIT_CACHE[key]
    if n_splits < n and total >= _SPREAD_MIN_BYTES:
        # hash-repartition on the leading (key) column, not round-robin:
        # a keyless repartition(n) pays SPARK-23207's per-row full-row
        # sort on the (single-task) map side — measured 1.4 s serialized
        # on the text table — while hash partitioning is one murmur3 per
        # row, deterministic under retries, and every spread table leads
        # with a high-cardinality id column that spreads evenly.
        df = df.repartition(n, F.col(df.columns[0]))
    return df


DEC = "decimal(18,2)"

# --------------------------------------------------------------------------
# 1. Single-scan column profile (SURVEY §2.4 A1/A2, north-rule stat sketches)
# --------------------------------------------------------------------------

def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column stats in ONE scan: count/nulls/distinct/min/max/mean/stddev.
    Decimal partial sums make mean/stddev order-independent (exact)."""
    li = _t(spark, sf_dir, "lineitem", spread=True)

    def stats(c: str):
        x = F.col(c)
        xd = x.cast(DEC)
        n = F.count(x)
        s1 = F.sum(xd)
        s2 = F.sum((xd * xd).cast("decimal(38,4)"))
        mean = (s1.cast("double") / n)
        var = (s2.cast("double") - s1.cast("double") * s1.cast("double") / n) / (n - 1)
        return F.struct(
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - n).alias("n_null"),
            F.count_distinct(x).alias("n_distinct"),
            F.min(x).cast("double").alias("min_value"),
            F.max(x).cast("double").alias("max_value"),
            F.round(mean, 6).alias("mean_value"),
            F.round(F.sqrt(var), 6).alias("stddev_value"),
        )

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    wide = li.agg(*[stats(c).alias(f"__s_{c}") for c in cols])
    return (
        wide.select(F.explode(F.array(*[F.col(f"__s_{c}") for c in cols])).alias("s"))
        .select("s.*")
    )


SQL_PROFILE_LINEITEM = """
WITH s AS (
  SELECT
    unnest(['l_quantity','l_extendedprice','l_discount']) AS column_name,
    unnest([count(l_quantity), count(l_extendedprice), count(l_discount)]) AS n,
    unnest([count(DISTINCT l_quantity), count(DISTINCT l_extendedprice), count(DISTINCT l_discount)]) AS nd,
    unnest([min(l_quantity), min(l_extendedprice), min(l_discount)]) AS mn,
    unnest([max(l_quantity), max(l_extendedprice), max(l_discount)]) AS mx,
    unnest([sum(CAST(l_quantity AS DECIMAL(18,2))), sum(CAST(l_extendedprice AS DECIMAL(18,2))), sum(CAST(l_discount AS DECIMAL(18,2)))]) AS s1,
    unnest([sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))),
            sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))),
            sum(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4)))]) AS s2,
    count(*) AS n_rows
  FROM lineitem
)
SELECT column_name,
       n_rows,
       n_rows - n AS n_null,
       nd AS n_distinct,
       CAST(mn AS DOUBLE) AS min_value,
       CAST(mx AS DOUBLE) AS max_value,
       round(CAST(s1 AS DOUBLE) / n, 6) AS mean_value,
       round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)), 6) AS stddev_value
FROM s
"""

# --------------------------------------------------------------------------
# 2. Composite-key uniqueness (A3/A4; reference HasDuplicates)
# --------------------------------------------------------------------------

def q_unique_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
        .select("o_custkey", "o_orderdate", "n_dups")
    )


SQL_UNIQUE_KEY_ORDERS = """
SELECT o_custkey, o_orderdate, count(*) AS n_dups
FROM orders GROUP BY o_custkey, o_orderdate HAVING count(*) > 1
"""

# --------------------------------------------------------------------------
# 3. Sequential numbering per group (W1; reference field.py:722-746) —
#    agg-only, no window: {1..n} ⟺ min=1 ∧ max=n ∧ distinct=n
# --------------------------------------------------------------------------

def q_sequential_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the count_distinct Expand doubles the row volume through the
    # partial aggregation, which otherwise runs on the table's 3 scan
    # splits (A/B: 0.78 s -> 0.42-0.67 s warm)
    li = _t(spark, sf_dir, "lineitem", spread=True)
    agg = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("l_linenumber").alias("min_ln"),
        F.max("l_linenumber").alias("max_ln"),
        F.count_distinct("l_linenumber").alias("nd_ln"),
    )
    return agg.select(
        "l_orderkey",
        "n_lines",
        "min_ln",
        "max_ln",
        (
            (F.col("min_ln") == 1)
            & (F.col("max_ln") == F.col("n_lines"))
            & (F.col("nd_ln") == F.col("n_lines"))
        ).alias("is_consecutive"),
    )


SQL_SEQUENTIAL_LINEITEM = """
SELECT l_orderkey,
       count(*) AS n_lines,
       min(l_linenumber) AS min_ln,
       max(l_linenumber) AS max_ln,
       (min(l_linenumber) = 1 AND max(l_linenumber) = count(*)
        AND count(DISTINCT l_linenumber) = count(*)) AS is_consecutive
FROM lineitem GROUP BY l_orderkey
"""

# --------------------------------------------------------------------------
# 4. Referential integrity, both directions (J1/J4; anti-joins)
# --------------------------------------------------------------------------

def q_ref_integrity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    orphans = ev.select(F.col("user_id")).join(
        F.broadcast(cust.select(F.col("c_custkey").alias("user_id"))), "user_id", "left_anti"
    )
    unused = cust.select("c_custkey").join(
        ev.select(F.col("user_id").alias("c_custkey")).distinct(), "c_custkey", "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_orphan_events")).crossJoin(
        unused.agg(F.count(F.lit(1)).alias("n_unused_customers"))
    )


SQL_REF_INTEGRITY_EVENTS = """
SELECT
  (SELECT count(*) FROM events e WHERE NOT EXISTS
     (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS n_orphan_events,
  (SELECT count(*) FROM customer c WHERE NOT EXISTS
     (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)) AS n_unused_customers
"""

# --------------------------------------------------------------------------
# 5. Monotonicity per group (W-family; lag windows, unique tie-break)
# --------------------------------------------------------------------------

def q_monotone_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "value", F.lag("value").over(w).alias("prev_value")
    )
    return (
        lagged.groupBy("user_id")
        .agg(
            F.count("prev_value").alias("n_pairs"),
            F.sum(F.when(F.col("value") < F.col("prev_value"), 1).otherwise(0)).alias("n_decreases"),
        )
        .where(F.col("n_decreases") > 0)
        .select("user_id", "n_pairs", "n_decreases")
    )


SQL_MONOTONE_EVENTS = """
WITH lagged AS (
  SELECT user_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
  FROM events
)
SELECT user_id, count(prev_value) AS n_pairs,
       CAST(sum(CASE WHEN value < prev_value THEN 1 ELSE 0 END) AS BIGINT) AS n_decreases
FROM lagged GROUP BY user_id HAVING sum(CASE WHEN value < prev_value THEN 1 ELSE 0 END) > 0
"""

# --------------------------------------------------------------------------
# 6. Transition grammar (W4): adjacent event_type pairs per user
# --------------------------------------------------------------------------

def q_grammar_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    return (
        pairs.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


SQL_GRAMMAR_EVENTS = """
WITH lagged AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
FROM lagged WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
"""

# --------------------------------------------------------------------------
# 7. Categorical level audit, both directions (A6; double anti-join)
# --------------------------------------------------------------------------

DECLARED_EVENT_TYPES = ["click", "view", "purchase", "signup", "login"]


def q_levels_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    declared = spark.createDataFrame([(v,) for v in DECLARED_EVENT_TYPES], "event_type string")
    used = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))
    undeclared = used.join(F.broadcast(declared), "event_type", "left_anti").select(
        "event_type", F.lit("undeclared").alias("problem"), "n_rows"
    )
    unused = declared.join(used.select("event_type"), "event_type", "left_anti").select(
        "event_type", F.lit("unused").alias("problem"), F.lit(0).cast("long").alias("n_rows")
    )
    return undeclared.unionByName(unused)


SQL_LEVELS_AUDIT_EVENTS = """
WITH declared AS (SELECT unnest(['click','view','purchase','signup','login']) AS event_type),
     used AS (SELECT event_type, count(*) AS n_rows FROM events GROUP BY event_type)
SELECT u.event_type, 'undeclared' AS problem, u.n_rows
FROM used u WHERE u.event_type NOT IN (SELECT event_type FROM declared)
UNION ALL
SELECT d.event_type, 'unused' AS problem, CAST(0 AS BIGINT) AS n_rows
FROM declared d WHERE d.event_type NOT IN (SELECT event_type FROM used)
"""

# --------------------------------------------------------------------------
# 8. Extent vs bounds (A2; reference extent.py:121-161)
# --------------------------------------------------------------------------

def q_extent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.min("o_orderdate").cast("string").alias("min_date"),
        F.max("o_orderdate").cast("string").alias("max_date"),
        (F.min("o_totalprice") >= 0).alias("price_lo_ok"),
        (F.max("o_totalprice") < 1000000).alias("price_hi_ok"),
        (F.min("o_orderdate") >= F.lit("1992-01-01").cast("timestamp")).alias("date_lo_ok"),
    )


SQL_EXTENT_ORDERS = """
SELECT CAST(min(o_totalprice) AS DOUBLE) AS min_price,
       CAST(max(o_totalprice) AS DOUBLE) AS max_price,
       CAST(min(o_orderdate) AS VARCHAR) AS min_date,
       CAST(max(o_orderdate) AS VARCHAR) AS max_date,
       min(o_totalprice) >= 0 AS price_lo_ok,
       max(o_totalprice) < 1000000 AS price_hi_ok,
       min(o_orderdate) >= TIMESTAMP '1992-01-01' AS date_lo_ok
FROM orders
"""

# --------------------------------------------------------------------------
# 9. Distribution drift: PSI + KS between two cohorts (north-rule addition).
#    Manual fixed-width bucketing (identical arithmetic both engines).
# --------------------------------------------------------------------------

PSI_LO, PSI_HI, PSI_BINS = 900.0, 105000.0, 20


def q_drift_psi_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    width = (PSI_HI - PSI_LO) / PSI_BINS
    bucket = F.least(
        F.greatest(F.floor((F.col("l_extendedprice") - PSI_LO) / width), F.lit(-1)),
        F.lit(PSI_BINS),
    )
    cohort = (F.col("l_orderkey") % 2 == 0).alias("is_even")
    hist = li.select(bucket.alias("bucket"), cohort).groupBy("bucket", "is_even").agg(
        F.count(F.lit(1)).alias("n")
    )
    pivoted = hist.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_even"), F.col("n")).otherwise(0)).alias("n_even"),
        F.sum(F.when(~F.col("is_even"), F.col("n")).otherwise(0)).alias("n_odd"),
    )
    tot = pivoted.agg(
        F.sum("n_even").alias("t_even"), F.sum("n_odd").alias("t_odd")
    )
    probs = pivoted.crossJoin(tot).select(
        "bucket",
        (F.col("n_even") / F.col("t_even")).alias("p"),
        (F.col("n_odd") / F.col("t_odd")).alias("q"),
    )
    # the window input is the HISTOGRAM (≤ bins+2 rows, already aggregated),
    # so one partition is correct and bounded (WindowExec's blanket warning
    # for it is silenced per-logger in session.build_session)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cdf = probs.select(
        "p", "q", F.sum("p").over(w).alias("cp"), F.sum("q").over(w).alias("cq")
    )
    eps = 1e-6
    return cdf.agg(
        F.round(F.sum((F.col("p") - F.col("q")) * F.log((F.col("p") + eps) / (F.col("q") + eps))), 6).alias("psi"),
        F.round(F.max(F.abs(F.col("cp") - F.col("cq"))), 6).alias("ks"),
    )


SQL_DRIFT_PSI_LINEITEM = f"""
WITH b AS (
  SELECT least(greatest(floor((l_extendedprice - {PSI_LO}) / {(PSI_HI - PSI_LO) / PSI_BINS}), -1), {PSI_BINS}) AS bucket,
         (l_orderkey % 2 = 0) AS is_even
  FROM lineitem
), pv AS (
  SELECT bucket,
         sum(CASE WHEN is_even THEN 1 ELSE 0 END) AS n_even,
         sum(CASE WHEN is_even THEN 0 ELSE 1 END) AS n_odd
  FROM b GROUP BY bucket
), pr AS (
  SELECT bucket,
         n_even / (SELECT sum(n_even) FROM pv) AS p,
         n_odd / (SELECT sum(n_odd) FROM pv) AS q
  FROM pv
), c AS (
  SELECT p, q,
         sum(p) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         sum(q) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cq
  FROM pr
)
SELECT round(sum((p - q) * ln((p + 1e-6) / (q + 1e-6))), 6) AS psi,
       round(max(abs(cp - cq)), 6) AS ks
FROM c
"""

# --------------------------------------------------------------------------
# 10-12. Relational anchors: TPC-H-style agg, join, top-k per group
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem", spread=True)
    disc = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(disc.cast("decimal(38,6)")).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join + decimal-exact revenue + deterministic top-10."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"))
    )
    return joined.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


SQL_TOP_REVENUE_ORDERS = """
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", F.col("p_retailprice").cast("double").alias("p_retailprice"), "rank")
    )


SQL_TOPK_PARTS_PER_BRAND = """
SELECT p_brand, p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice, rank FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rank
  FROM part
) WHERE rank <= 3
"""

# --------------------------------------------------------------------------
# 13-16. Training-data text ops: exact dedup, n-gram jaccard, text stats,
#         language-ID
# --------------------------------------------------------------------------

def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", spread=True)
    norm = tx.normalize_text(F.col("text"))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(norm).alias("n_distinct_normalized"),
        (F.count(F.lit(1)) - F.count_distinct(norm)).alias("n_redundant_docs"),
    )


SQL_DEDUP_EXACT_DOCS = r"""
SELECT count(*) AS n_docs,
       count(DISTINCT trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS n_distinct_normalized,
       count(*) - count(DISTINCT trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS n_redundant_docs
FROM documents
"""


JACCARD_N = 5
JACCARD_THRESHOLD = 0.08
#: boilerplate frequency cut — a shingle present in more than this many docs
#: carries no discrimination and makes its self-join bucket quadratic
SHINGLE_MAX_DF = 20
#: embeddings table vector width (fixed by TESTDATA.md) — passed explicitly
#: so the LSH/IVF paths never probe it with an extra first() job
EMB_DIM = 64


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", spread=True)
    # adaptive_cut: bounded probe, skips the no-op anti-join + second
    # full-shingle cache (EAGER_BY_DESIGN entry, see minhash_lsh_docs)
    pairs = dd.ngram_jaccard_pairs(
        d, "doc_id", "text", n=JACCARD_N, threshold=JACCARD_THRESHOLD,
        max_df=SHINGLE_MAX_DF, adaptive_cut=True,
    )
    return dd.carry(
        pairs,
        pairs.select(
            "id_a", "id_b", "n_common", "n_a", "n_b", F.round("jaccard", 6).alias("jaccard")
        ),
    )


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{JACCARD_N - 1}], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - {JACCARD_N - 1})) AS i)
  WHERE len(t) >= {JACCARD_N} AND shingle <> ''
), sh AS (
  SELECT s.* FROM sh0 s
  JOIN (SELECT shingle FROM sh0 GROUP BY shingle
        HAVING count(*) <= {SHINGLE_MAX_DF}) keep USING (shingle)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_THRESHOLD}
"""


def q_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", spread=True)
    enriched = d.select(
        "lang",
        tx.ws_token_count(F.col("text")).alias("ws_tokens"),
        tx.bpe_token_count(F.col("text")).alias("bpe_tokens"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
    )
    return (
        enriched.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias("avg_chars"),
        )
    )


SQL_TEXT_STATS_BY_LANG = rf"""
WITH e AS (
  SELECT lang,
         CASE WHEN trim(coalesce(text,'')) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(coalesce(text,'')), '\s+')) END AS ws_tokens,
         len(regexp_extract_all(coalesce(text,''), '{tx.TOKEN_REGEX}')) AS bpe_tokens,
         length(coalesce(text,'')) AS n_chars
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       round(sum(n_chars) / count(*), 6) AS avg_chars
FROM e GROUP BY lang
"""


def q_lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", spread=True)
    return (
        d.select(tx.lang_id(F.col("text")).alias("detected_lang"))
        .groupBy("detected_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _sql_lang_scores() -> str:
    parts = []
    for lang, words in tx.LANG_MARKERS.items():
        rx = r"(?i)\b(" + "|".join(words) + r")\b"
        parts.append(f"len(regexp_extract_all(coalesce(text,''), '{rx}')) AS s_{lang}")
    return ", ".join(parts)


SQL_LANG_ID_DOCS = f"""
WITH s AS (SELECT {_sql_lang_scores()} FROM documents),
     d AS (
  SELECT CASE
    WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
    WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
    WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
    ELSE 'es' END AS detected_lang
  FROM s
)
SELECT detected_lang, count(*) AS n_docs FROM d GROUP BY detected_lang
"""

# --------------------------------------------------------------------------
# 17. Embedding similarity: exact cosine top-k (oracle via
#     list_cosine_similarity); LSH variants are rows-only checked
# --------------------------------------------------------------------------

TOPK_K = 5
TOPK_QUERY_MOD = 50


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings", spread=True)
    queries = e.where(F.col("vec_id") % TOPK_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.brute_force_topk(e, queries, k=TOPK_K)
    return out.select("query_id", "vec_id", F.round("sim", 4).alias("sim"), "rank")


SQL_EMBEDDING_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % {TOPK_QUERY_MOD} = 0),
     scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(sim, 4) AS sim, rank FROM ranked WHERE rank <= {TOPK_K}
"""

# --------------------------------------------------------------------------
# 18. Hierarchy closure + congruence (J6-J10): region→nation→customer as a
#     3-level hierarchy; closure built by the engine's path-doubling fixpoint,
#     oracled by a recursive CTE.
# --------------------------------------------------------------------------

def q_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor closure over the TPC-H geography tree (customers under
    nations under regions), via engine.hierarchy.build_closure. node_id
    encoding keeps the three key spaces disjoint: region r → r,
    nation n → 100 + n, customer c → 1000 + c."""
    from safedata_validator_spark.engine.hierarchy import build_closure

    r = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("node_id"),
        F.lit(None).cast("long").alias("parent_id"),
    )
    n = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 100).cast("long").alias("node_id"),
        F.col("n_regionkey").cast("long").alias("parent_id"),
    )
    c = _t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + 1000).cast("long").alias("node_id"),
        (F.col("c_nationkey") + 100).cast("long").alias("parent_id"),
    )
    closure = build_closure(r.unionByName(n).unionByName(c))
    return closure.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("node_id").alias("min_node"),
        F.max("node_id").alias("max_node"),
    )


SQL_HIERARCHY_CLOSURE = """
WITH RECURSIVE nodes AS (
  SELECT CAST(r_regionkey AS BIGINT) AS node_id, CAST(NULL AS BIGINT) AS parent_id FROM region
  UNION ALL
  SELECT CAST(n_nationkey + 100 AS BIGINT), CAST(n_regionkey AS BIGINT) FROM nation
  UNION ALL
  SELECT CAST(c_custkey + 1000 AS BIGINT), CAST(c_nationkey + 100 AS BIGINT) FROM customer
), closure AS (
  SELECT node_id, node_id AS ancestor_id, 0 AS depth FROM nodes
  UNION ALL
  SELECT c.node_id, n.parent_id AS ancestor_id, c.depth + 1
  FROM closure c JOIN nodes n ON c.ancestor_id = n.node_id
  WHERE n.parent_id IS NOT NULL
)
SELECT depth, count(*) AS n_pairs, min(node_id) AS min_node, max(node_id) AS max_node
FROM closure GROUP BY depth
"""

# --------------------------------------------------------------------------
# 18a. Hierarchy congruence (J8-J10; reference taxa.py:1440-1453): facts
#      claim (child, ancestor) name pairs checked against the closure of the
#      TPC-H geography tree; the oracle rebuilds the closure recursively.
# --------------------------------------------------------------------------

def q_hierarchy_congruence_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine path: eval_hierarchy_congruence violations. Customers claim
    ("N"+nationkey, "R"+(custkey%7)): residues 5-6 are unknown ancestors,
    residues 0-4 are real regions but only sometimes the right one."""
    from safedata_validator_spark.engine.hierarchy import (
        build_closure,
        eval_hierarchy_congruence,
    )
    from safedata_validator_spark.rules.model import Rule, RuleSet

    r = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("node_id"),
        F.lit(None).cast("long").alias("parent_id"),
        F.concat(F.lit("R"), F.col("r_regionkey").cast("string")).alias("name"),
    )
    n = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 100).cast("long").alias("node_id"),
        F.col("n_regionkey").cast("long").alias("parent_id"),
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("name"),
    )
    nodes = r.unionByName(n)
    closure = build_closure(nodes.select("node_id", "parent_id"))

    cust = _t(spark, sf_dir, "customer")
    claims = cust.select(
        F.concat(F.lit("N"), F.col("c_nationkey").cast("string")).alias("child"),
        F.concat(F.lit("R"), (F.col("c_custkey") % 7).cast("string")).alias("anc"),
    )
    rule = Rule("geo.hierarchy", "hierarchy_congruence", severity="ERROR",
                params={"nodes_dim": "nodes", "closure_dim": "closure",
                        "child_col": "child", "ancestor_col": "anc"})
    rs = RuleSet(name="hc", key_cols=["child"], scope="'all'", rules=[rule])
    out = eval_hierarchy_congruence(
        claims, rule, rs, {"nodes": nodes, "closure": closure}
    )
    return out.orderBy("entity")


SQL_HIERARCHY_CONGRUENCE_EVENTS = """
WITH RECURSIVE nodes AS (
  SELECT CAST(r_regionkey AS BIGINT) AS node_id, CAST(NULL AS BIGINT) AS parent_id,
         'R' || r_regionkey AS name
  FROM region
  UNION ALL
  SELECT CAST(n_nationkey + 100 AS BIGINT), CAST(n_regionkey AS BIGINT),
         'N' || n_nationkey
  FROM nation
), closure AS (
  SELECT node_id, node_id AS ancestor_id FROM nodes
  UNION ALL
  SELECT c.node_id, n.parent_id
  FROM closure c JOIN nodes n ON c.ancestor_id = n.node_id
  WHERE n.parent_id IS NOT NULL
), claims AS (
  SELECT 'N' || c_nationkey AS child, 'R' || (c_custkey % 7) AS anc, count(*) AS n
  FROM customer GROUP BY 1, 2
), resolved AS (
  SELECT cl.child, cl.anc, cl.n, cn.node_id AS cid, an.node_id AS aid,
         (SELECT 1 FROM closure x WHERE x.node_id = cn.node_id
            AND x.ancestor_id = an.node_id) AS ok
  FROM claims cl
  LEFT JOIN nodes cn ON cn.name = cl.child
  LEFT JOIN nodes an ON an.name = cl.anc
)
SELECT 'geo.hierarchy' AS rule_id, 'ERROR' AS severity, 'all' AS scope,
       'child=' || child || '/anc=' || anc AS entity,
       'child' AS "column", anc AS value,
       CASE WHEN cid IS NULL THEN 'unknown node: ' || child
            WHEN aid IS NULL THEN 'unknown ancestor: ' || anc
            ELSE anc || ' is not an ancestor of ' || child || ' (' || n || ' rows)'
       END AS message
FROM resolved WHERE ok IS NULL
ORDER BY entity
"""

# --------------------------------------------------------------------------
# 18b. Taxon-style name resolution (J6; reference taxa.py:356-412 status
#      disambiguation + the validate_and_add_taxon decision table): events
#      claim synthetic (name, rank) pairs against a nations-derived dimension
#      with planted synonym / ambiguous / missing cases; the oracle replays
#      the decision table as a SQL window.
# --------------------------------------------------------------------------

def q_name_resolution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine path: eval_name_resolution violations over deterministic
    claims. Dimension statuses by nationkey: %7==3 → synonym, else %5==2 →
    doubtful with a planted second doubtful usage (→ ambiguous); claims
    cover user_id % 32, so residues ≥ 25 miss the 25-nation dimension."""
    from safedata_validator_spark.engine.hierarchy import eval_name_resolution
    from safedata_validator_spark.rules.model import Rule, RuleSet

    nat = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("long")
    status = (
        F.when(k % 7 == 3, "synonym").when(k % 5 == 2, "doubtful").otherwise("accepted")
    )
    base = nat.select(
        k.alias("node_id"),
        F.concat(F.lit("NATION_"), k.cast("string")).alias("name"),
        F.lit("nation").alias("rank"),
        status.alias("status"),
    )
    twins = nat.where((k % 5 == 2) & (k % 7 != 3)).select(
        (k + 100).alias("node_id"),
        F.concat(F.lit("NATION_"), k.cast("string")).alias("name"),
        F.lit("nation").alias("rank"),
        F.lit("doubtful").alias("status"),
    )
    dim = base.unionByName(twins)

    ev = _t(spark, sf_dir, "events")
    claims = ev.select(
        F.concat(F.lit("NATION_"), (F.col("user_id") % 32).cast("string")).alias("name"),
        F.lit("nation").alias("rank"),
    )
    rule = Rule("name_resolution", "name_resolution", severity="ERROR",
                params={"dim": "taxa", "name_col": "name", "rank_col": "rank"})
    rs = RuleSet(name="nr", key_cols=["name"], scope="'all'", rules=[rule])
    return eval_name_resolution(claims, rule, rs, {"taxa": dim})


SQL_NAME_RESOLUTION_EVENTS = """
WITH dim AS (
  SELECT CAST(n_nationkey AS BIGINT) AS node_id,
         'NATION_' || CAST(n_nationkey AS BIGINT) AS name,
         CASE WHEN n_nationkey % 7 = 3 THEN 'synonym'
              WHEN n_nationkey % 5 = 2 THEN 'doubtful'
              ELSE 'accepted' END AS status
  FROM nation
  UNION ALL
  SELECT CAST(n_nationkey + 100 AS BIGINT), 'NATION_' || CAST(n_nationkey AS BIGINT), 'doubtful'
  FROM nation WHERE n_nationkey % 5 = 2 AND n_nationkey % 7 <> 3
), pri AS (
  SELECT *, CASE status WHEN 'accepted' THEN 0 WHEN 'doubtful' THEN 1 ELSE 2 END AS prio
  FROM dim
), pref AS (
  SELECT name, node_id, status, prio,
         row_number() OVER (PARTITION BY name ORDER BY prio, node_id) AS rn,
         count(*) OVER (PARTITION BY name, prio) AS nbest
  FROM pri QUALIFY rn = 1
), claims AS (
  SELECT 'NATION_' || (user_id % 32) AS name, count(*) AS n
  FROM events GROUP BY 1
), resolved AS (
  SELECT c.name, c.n,
         CASE WHEN p.node_id IS NULL THEN 'missing'
              WHEN p.nbest > 1 AND p.prio > 0 THEN 'ambiguous'
              WHEN p.status = 'synonym' THEN 'synonym'
              ELSE 'found' END AS match_status
  FROM claims c LEFT JOIN pref p ON c.name = p.name
)
SELECT 'name_resolution.' || match_status AS rule_id,
       CASE WHEN match_status = 'synonym' THEN 'WARNING' ELSE 'ERROR' END AS severity,
       'all' AS scope,
       'name=' || name || '/rank=nation' AS entity,
       'name' AS "column",
       name AS value,
       'name resolution: ' || match_status || ' for (' || name || ', nation) ('
         || n || ' rows)' AS message
FROM resolved WHERE match_status <> 'found'
"""

# --------------------------------------------------------------------------
# 19. Sessionization (gap > 30 min splits a session) — the lag+cumsum window
#     composition; per-user session stats.
# --------------------------------------------------------------------------

SESSION_GAP_SEC = 1800


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > SESSION_GAP_SEC), 1).otherwise(0).alias("is_new"),
    )
    sess = marked.select(
        "user_id",
        "ts",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_no"),
    )
    per_session = sess.groupBy("user_id", "session_no").agg(F.count(F.lit(1)).alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("n_events"),
    )


SQL_SESSIONIZE_EVENTS = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM marked
), per_session AS (
  SELECT user_id, session_no, count(*) AS n_events FROM sess GROUP BY user_id, session_no
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM per_session GROUP BY user_id
"""

# --------------------------------------------------------------------------
# 20. Multimodal feature extraction: binary payloads → mapInPandas features.
#     Oracle reconstructs the deterministic synthetic media table and its
#     integrity metadata in pure SQL (payload bytes = hex digest string).
# --------------------------------------------------------------------------

N_MEDIA = 64


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from safedata_validator_spark.functions import multimodal as mm

    media = mm.synth_media(spark, n=N_MEDIA)
    feats = mm.extract_features(media)
    # the feature vector itself is pytest-gated (deterministic surrogate);
    # the SQL gate checks the Arrow-batch plumbing integrity outputs
    return feats.select("media_id", "kind", "n_bytes", "sha256")


SQL_MEDIA_FEATURES = f"""
WITH media AS (
  SELECT g AS media_id,
         CASE g % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         sha256(CAST(g AS VARCHAR)) AS payload_hex
  FROM generate_series(0, {N_MEDIA - 1}) t(g)
)
SELECT media_id, kind,
       CAST(length(payload_hex) AS INT) AS n_bytes,
       sha256(payload_hex) AS sha256
FROM media
"""

# --------------------------------------------------------------------------
# 21. Quality scoring per document (pretraining-corpus filter battery)
# --------------------------------------------------------------------------

def q_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", spread=True)
    return d.select(
        "doc_id",
        F.round(tx.quality_score(F.col("text")), 6).alias("quality"),
        tx.ws_token_count(F.col("text")).alias("ws_tokens"),
    )


def _sql_quality() -> str:
    stop_rx = r"(?i)\b(" + "|".join(tx.STOPWORDS_EN) + r")\b"
    return rf"""
WITH e AS (
  SELECT doc_id,
         coalesce(text,'') AS t,
         length(coalesce(text,'')) AS n_chars,
         greatest(length(coalesce(text,'')), 1) AS safe,
         length(regexp_replace(coalesce(text,''), '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(coalesce(text,''), '[^.,;:!?''"()\[\]{{}}]', '', 'g')) AS n_punct,
         CASE WHEN trim(coalesce(text,'')) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(coalesce(text,'')), '\s+')) END AS n_tok,
         len(regexp_extract_all(coalesce(text,''), '{stop_rx}')) AS n_stop
  FROM documents
)
SELECT doc_id,
       round(0.25 * (
         least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
         + CAST(n_alpha AS DOUBLE) / safe
         + (1.0 - least(3.0 * CAST(n_punct AS DOUBLE) / safe, 1.0))
         + least(5.0 * CAST(n_stop AS DOUBLE) / greatest(n_tok, 1), 1.0)
       ), 6) AS quality,
       CAST(n_tok AS INT) AS ws_tokens
FROM e
"""


SQL_QUALITY_DOCS = _sql_quality()

# --------------------------------------------------------------------------
# Rows-only checked (hash-based / engine-native; no SQL equivalent)
# --------------------------------------------------------------------------

def q_minhash_lsh_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs. Oracled by the exact-Jaccard SQL: at the
    catalog banding (num_perm=64, bands=16 → r=4) a pair at jaccard s is
    banded with probability 1-(1-s^4)^16 ≈ 1 for the planted near-dups
    (s ≥ 0.95), so candidates+verify reproduce the exact pair set."""
    d = _t(spark, sf_dir, "documents", spread=True)
    # adaptive_cut: one bounded probe job proves the max_df cut a no-op
    # (zero shingles exceed df=20 on this corpus — measured) and skips the
    # |shingles|-row repack shuffle + second cache entirely; the probe
    # also materializes the compact-array cache up front, so the later
    # concurrent AQE stages read it instead of racing to compute it.
    # Catalog entry is EAGER_BY_DESIGN for this (tests/test_plans.py).
    out = dd.minhash_lsh_dedup(
        d, "doc_id", "text", n=JACCARD_N, threshold=JACCARD_THRESHOLD,
        max_df=SHINGLE_MAX_DF, adaptive_cut=True,
    )
    return dd.carry(
        out, out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


#: shared CTE chain producing the exact-Jaccard near-dup pair set (the SQL
#: oracle for both the LSH pair query and the cluster query built on it)
_JACCARD_PAIR_CTES = f"""toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{JACCARD_N - 1}], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - {JACCARD_N - 1})) AS i)
  WHERE len(t) >= {JACCARD_N} AND shingle <> ''
), sh AS (
  SELECT s.* FROM sh0 s
  JOIN (SELECT shingle FROM sh0 GROUP BY shingle
        HAVING count(*) <= {SHINGLE_MAX_DF}) keep USING (shingle)
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)"""

SQL_MINHASH_LSH_DOCS = f"""
WITH {_JACCARD_PAIR_CTES}
SELECT id_a, id_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_THRESHOLD}
"""


def q_dedup_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: MinHash-LSH pairs (same
    banding soundness argument as minhash_lsh_docs) fed through alternating
    large-star/small-star connected components
    (functions.dedup.connected_components) → one row per transitive cluster
    (component = min member id, n_members, sorted member_ids). The oracle
    recomputes the exact-Jaccard pair set in SQL and closes it with a
    recursive CTE — min-label transitive closure."""
    d = _t(spark, sf_dir, "documents", spread=True)
    pairs = dd.minhash_lsh_dedup(
        d, "doc_id", "text", n=JACCARD_N, threshold=JACCARD_THRESHOLD,
        max_df=SHINGLE_MAX_DF, adaptive_cut=True,
    )
    out = dd.dup_clusters(pairs)
    # member list rendered as CSV: engines disagree on array cell rendering
    # (numpy vs list) but not on strings, keeping the value hash portable
    return dd.carry(
        out,
        out.select(
            "component", "n_members", F.array_join("member_ids", ",").alias("member_ids")
        ),
    )


SQL_DEDUP_CLUSTERS_DOCS = f"""
WITH RECURSIVE {_JACCARD_PAIR_CTES}, pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_THRESHOLD}
), dedges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(id, comp) AS (
  SELECT src, src FROM dedges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN dedges e ON e.src = r.id
), labels AS (
  SELECT id, min(comp) AS component FROM reach GROUP BY id
)
SELECT component, CAST(count(*) AS BIGINT) AS n_members,
       array_to_string(list_sort(list(id)), ',') AS member_ids
FROM labels GROUP BY component
"""


def q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", spread=True)
    return dd.simhash_near_pairs(d, "doc_id", "text", max_hamming=12)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings", spread=True)
    # dim=EMB_DIM: without it embedding_near_dup_pairs probes the vector
    # width with a first() — a full hidden execution of the upstream plan
    # at every call (VERDICT r02 §wrong 1)
    out = sim.embedding_near_dup_pairs(e, threshold=0.3, nbits=8, dim=EMB_DIM)
    return out.select("id_a", "id_b", F.round("sim", 6).alias("sim"))


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread: the pre-exchange work here is one numpy-vectorized bucket
    # UDF (light per row); measured, the extra exchange + 32-way Arrow
    # fan-out costs more than the parallelism buys (0.69 s -> 1.19 s)
    e = _t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % TOPK_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.lsh_topk(e, queries, k=TOPK_K, nbits=8, probe_hamming=1, dim=EMB_DIM)
    return out.select("query_id", "vec_id", F.round("sim", 4).alias("sim"), "rank")


CURATE_LANGS = ("en", "fr")
CURATE_MIN_QUALITY = 0.3
CURATE_NEARDUP_T = 0.5


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation (functions.pipeline): exact dedup →
    near-dup removal (exact shingle join here, so the WHOLE pipeline is
    SQL-oracle-gated; method='minhash' is the at-scale swap) → language
    whitelist → quality floor."""
    from safedata_validator_spark.functions.pipeline import curate_documents

    d = _t(spark, sf_dir, "documents", spread=True)
    return curate_documents(
        d, "doc_id", "text",
        min_quality=CURATE_MIN_QUALITY, langs=CURATE_LANGS,
        near_dup_threshold=CURATE_NEARDUP_T, n=JACCARD_N, method="exact",
    )


def _sql_curate(near_dup_mode: str = "pairs") -> str:
    stop_rx = r"(?i)\b(" + "|".join(tx.STOPWORDS_EN) + r")\b"
    lang_case = """CASE
    WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
    WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
    WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
    ELSE 'es' END"""
    lang_scores = ", ".join(
        "len(regexp_extract_all(coalesce(text,''), '"
        + r"(?i)\b(" + "|".join(words) + r")\b"
        + f"')) AS s_{lang}"
        for lang, words in tx.LANG_MARKERS.items()
    )
    langs_in = ", ".join(f"'{v}'" for v in CURATE_LANGS)
    if near_dup_mode == "cluster":
        dropped = f"""pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {CURATE_NEARDUP_T}
), dedges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(rid, comp) AS (
  SELECT src, src FROM dedges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN dedges e ON e.src = r.rid
), labels AS (
  SELECT rid, min(comp) AS component FROM reach GROUP BY rid
), dropped AS (
  SELECT rid AS id_b FROM labels WHERE rid <> component
)"""
    else:
        dropped = f"""dropped AS (
  SELECT DISTINCT id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {CURATE_NEARDUP_T}
)"""
    recursive = "RECURSIVE " if near_dup_mode == "cluster" else ""
    return rf"""
WITH {recursive}norm AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nrm
  FROM documents
), exact_kept AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY nrm) AS keep FROM norm
  ) WHERE doc_id = keep
), toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM exact_kept
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{JACCARD_N - 1}], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - {JACCARD_N - 1})) AS i)
  WHERE len(t) >= {JACCARD_N} AND shingle <> ''
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), {dropped}, survivors AS (
  SELECT doc_id, text FROM exact_kept
  WHERE doc_id NOT IN (SELECT id_b FROM dropped)
), scored AS (
  SELECT doc_id, text, {lang_scores} FROM survivors
), enriched AS (
  SELECT doc_id AS id,
         {lang_case} AS lang,
         round(0.25 * (
           least(CAST(length(coalesce(text,'')) AS DOUBLE) / 500.0, 1.0)
           + CAST(length(regexp_replace(coalesce(text,''), '[^A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(coalesce(text,'')), 1)
           + (1.0 - least(3.0 * CAST(length(regexp_replace(coalesce(text,''), '[^.,;:!?''"()\[\]{{}}]', '', 'g')) AS DOUBLE) / greatest(length(coalesce(text,'')), 1), 1.0))
           + least(5.0 * CAST(len(regexp_extract_all(coalesce(text,''), '{stop_rx}')) AS DOUBLE) / greatest(CASE WHEN trim(coalesce(text,'')) = '' THEN 0 ELSE len(regexp_split_to_array(trim(coalesce(text,'')), '\s+')) END, 1), 1.0)
         ), 6) AS quality,
         CAST(CASE WHEN trim(coalesce(text,'')) = '' THEN 0 ELSE len(regexp_split_to_array(trim(coalesce(text,'')), '\s+')) END AS INT) AS ws_tokens
  FROM scored
)
SELECT id, lang, quality, ws_tokens FROM enriched
WHERE lang IN ({langs_in}) AND quality >= {CURATE_MIN_QUALITY}
"""


SQL_CURATE_CORPUS = _sql_curate()
SQL_CURATE_CORPUS_CLUSTER = _sql_curate(near_dup_mode="cluster")


def q_curate_corpus_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline with one-per-cluster near-dup removal
    (near_dup_mode='cluster'): detector pairs close into connected
    components and only each component's min id survives — vs the 'pairs'
    gate above, members of a transitive cluster that were never directly
    paired are now dropped too. Oracle = the same full-composition SQL
    with a recursive-CTE closure replacing the pairwise drop list."""
    from safedata_validator_spark.functions.pipeline import curate_documents

    d = _t(spark, sf_dir, "documents", spread=True)
    out = curate_documents(
        d,
        "doc_id",
        "text",
        min_quality=CURATE_MIN_QUALITY,
        langs=CURATE_LANGS,
        near_dup_threshold=CURATE_NEARDUP_T,
        n=JACCARD_N,
        method="exact",
        near_dup_mode="cluster",
    )
    return out


# --------------------------------------------------------------------------
# Training-pipeline hygiene: decontamination, PII audit, deterministic split
# --------------------------------------------------------------------------

#: eval "benchmark" slice for the decontamination gate — two of the twenty
#: synthetic sources stand in for a held-out eval corpus
DECON_EVAL_SOURCES = ("src0", "src1")
DECON_N = JACCARD_N
#: split weights for the corpus_split gate (resolved to /10_000 buckets)
SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SAMPLE_FRACTION = 0.2


def q_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination (functions.dedup.decontaminate): training
    docs sharing ≥1 word n-gram with the eval slice, with the distinct
    contaminated-n-gram count. Eval n-gram hashes broadcast; the training
    side is never shuffled before the per-doc count."""
    d = _t(spark, sf_dir, "documents", spread=True)
    ev = d.where(F.col("source").isin(*DECON_EVAL_SOURCES))
    tr = d.where(~F.col("source").isin(*DECON_EVAL_SOURCES))
    out = dd.decontaminate(tr, ev, "doc_id", "text", n=DECON_N)
    return out.select(F.col("id").alias("doc_id"), "n_hits")


SQL_DECONTAMINATE_DOCS = rf"""
WITH toks AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(t[i:i+{DECON_N - 1}], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - {DECON_N - 1})) AS i)
  WHERE len(t) >= {DECON_N} AND shingle <> ''
), ev AS (
  SELECT DISTINCT shingle FROM sh WHERE source IN ('src0', 'src1')
)
SELECT s.doc_id, count(*) AS n_hits
FROM sh s JOIN ev USING (shingle)
WHERE s.source NOT IN ('src0', 'src1')
GROUP BY s.doc_id
HAVING count(*) >= 1
"""


def q_pii_audit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + scrub verification (functions.pii) over a corpus
    with deterministically injected PII (the synthetic documents carry
    none, so the gate plants emails/IPs/phones/SSNs itself — every count
    below has an arithmetically computable expectation). Aggregated per
    source: docs carrying each class, total matches, and the total
    scrubbed-length delta."""
    from safedata_validator_spark.functions import pii

    d = _t(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    injected = F.when(
        doc_id % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com"),
            F.lit(" ip 10.0."), (doc_id % 256).cast("string"), F.lit(".17"),
            F.lit(" call 555-867-5309 ssn 123-45-6789"),
        ),
    ).otherwise(F.col("text"))
    audited = pii.pii_audit(
        d.select("source", doc_id.alias("doc_id"), injected.alias("text")),
        "doc_id", "text", keep=("source",),
    )
    return (
        audited.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_email") > 0).cast("int")).cast("bigint").alias("docs_with_email"),
            F.sum("n_email").cast("bigint").alias("total_email"),
            F.sum("n_ipv4").cast("bigint").alias("total_ipv4"),
            F.sum("n_phone").cast("bigint").alias("total_phone"),
            F.sum("n_ssn").cast("bigint").alias("total_ssn"),
            F.sum("n_card").cast("bigint").alias("total_card"),
            F.sum("chars_redacted").cast("bigint").alias("chars_redacted"),
        )
    )


def _sql_pii_audit() -> str:
    from safedata_validator_spark.functions import pii

    # DuckDB single-quoted strings take backslashes literally — the Java
    # pattern strings pass through verbatim (only quotes need doubling)
    pats = {k: v.replace("'", "''") for k, v in pii.PII_PATTERNS.items()}
    scrub = "coalesce(text,'')"
    for kind in pii.PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pats[kind]}', '{pii.PII_TOKENS[kind]}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(coalesce(text,''), '{pats[k]}')) AS n_{k}"
        for k in pii.PII_PATTERNS
    )
    return rf"""
WITH injected AS (
  SELECT source, doc_id,
         CASE WHEN doc_id % 7 = 0 THEN
           text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17'
                || ' call 555-867-5309 ssn 123-45-6789'
         ELSE text END AS text
  FROM documents
), audited AS (
  SELECT source, doc_id, {counts},
         length(coalesce(text,'')) - length({scrub}) AS chars_redacted
  FROM injected
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       CAST(sum(n_email) AS BIGINT) AS total_email,
       CAST(sum(n_ipv4) AS BIGINT) AS total_ipv4,
       CAST(sum(n_phone) AS BIGINT) AS total_phone,
       CAST(sum(n_ssn) AS BIGINT) AS total_ssn,
       CAST(sum(n_card) AS BIGINT) AS total_card,
       CAST(sum(chars_redacted) AS BIGINT) AS chars_redacted
FROM audited GROUP BY source
"""


SQL_PII_AUDIT_DOCS = _sql_pii_audit()


#: mixture-rebalance targets for the resample gate: src0 anchors (keeps all
#: 25 docs at uniform input), the other 15 sources are dropped. Ratios are
#: binary-exact so Spark and DuckDB floor identical doubles.
MIXTURE_TARGETS = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0, "src4": 0.5}
#: char budget per packed training sequence
PACK_BUDGET = 2000


def q_mixture_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture rebalancing (functions.sampling.mixture_resample):
    deterministically downsample sources to hit target mixture proportions,
    anchored by the stratum that keeps 100%. Reported per source."""
    from safedata_validator_spark.functions import sampling as sp

    d = _t(spark, sf_dir, "documents")
    out = sp.mixture_resample(d, "source", "doc_id", MIXTURE_TARGETS)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    )


def _sql_mixture_resample() -> str:
    from safedata_validator_spark.functions.sampling import BUCKETS

    vals = ", ".join(f"('{s}', {w})" for s, w in MIXTURE_TARGETS.items())
    bucket = (
        f"(('0x' || substr(md5('mixture' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        f" % {BUCKETS})"
    )
    return rf"""
WITH tw(source, w) AS (VALUES {vals}),
counts AS (
  SELECT d.source, w, count(*) AS cnt
  FROM documents d JOIN tw USING (source) GROUP BY d.source, w
), kmin AS (
  SELECT min(cnt / w) AS k FROM counts
), rates AS (
  SELECT source, CAST(floor((w * k / cnt) * {BUCKETS}) AS INT) AS thr
  FROM counts, kmin
)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS kept_chars
FROM documents d JOIN rates USING (source)
WHERE {bucket} < thr
GROUP BY d.source
"""


SQL_MIXTURE_RESAMPLE_DOCS = _sql_mixture_resample()


#: token budget for the exact-BPE packing branch (docs here average ~50 BPE
#: tokens, so ~6 docs share a training sequence — the interesting regime)
PACK_BUDGET_TOKENS = 300


def _pack_rollup(packed: DataFrame, size_col: str, basis: str) -> DataFrame:
    return (
        packed.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(size_col).cast("bigint").alias("seq_units"),
            F.min("start_offset").alias("first_offset"),
        )
        .select(F.lit(basis).alias("size_basis"), "*")
    )


def q_pack_sequences_chars_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (functions.sampling.pack_sequences):
    docs laid head-to-tail per source in doc_id order, cut into
    {PACK_BUDGET}-char sequences; rolled up per (source, seq_id). The
    running-sum window is bounded by the source partition — no global
    sort. Chars-only branch, kept under the r2-r4 bench name so the
    curation-suite composition stays comparable round-over-round."""
    from safedata_validator_spark.functions import sampling as sp

    d = _t(spark, sf_dir, "documents")
    packed = sp.pack_sequences(d, "doc_id", "n_chars", PACK_BUDGET, part_cols=("source",))
    return _pack_rollup(packed, "n_chars", "chars")


def q_pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing on BOTH size feeds, discriminated by ``size_basis``:
    the cheap ``n_chars`` column ('chars', budget {PACK_BUDGET}) and the
    EXACT byte-level-BPE token count ('bpe', budget {PACK_BUDGET_TOKENS},
    functions.bpe.bpe_count — the count a trainer would bill against,
    VERDICT r04 §next 6). Both branches are the same partition-bounded
    running-sum window; the BPE feed adds one zero-shuffle Arrow-batched
    projection. Oracle: the packing arithmetic runs live in DuckDB SQL,
    with only the non-SQL-expressible per-doc token counts pinned as a
    VALUES table (independently cross-checked by the token_count_docs
    golden + tools/purepy_ref.py)."""
    from safedata_validator_spark.functions import bpe, sampling as sp

    d = _t(spark, sf_dir, "documents")
    chars = sp.pack_sequences(d, "doc_id", "n_chars", PACK_BUDGET, part_cols=("source",))
    dt = d.select("source", "doc_id", bpe.bpe_count(F.col("text")).alias("n_bpe"))
    tok = sp.pack_sequences(dt, "doc_id", "n_bpe", PACK_BUDGET_TOKENS, part_cols=("source",))
    return _pack_rollup(chars, "n_chars", "chars").unionByName(
        _pack_rollup(tok, "n_bpe", "bpe")
    )


def sql_pack_sequences_docs(tok_values_sql: str) -> str:
    """DuckDB oracle for q_pack_sequences_docs, composed by
    tools/gen_golden_oracles.py: ``tok_values_sql`` is a pinned VALUES table
    (doc_id, n_bpe_tokens) from the independent purepy BPE — everything
    else (both packing branches, the rollup) is computed live by DuckDB."""
    return f"""
WITH tok AS ({tok_values_sql}),
base AS (
  SELECT d.source, CAST(d.doc_id AS BIGINT) AS doc_id,
         CAST(d.n_chars AS BIGINT) AS n_chars, CAST(t.n_bpe_tokens AS BIGINT) AS n_bpe
  FROM documents d JOIN tok t ON t.doc_id = d.doc_id
), u AS (
  SELECT 'chars' AS size_basis, source, doc_id, n_chars AS sz,
         {PACK_BUDGET} AS budget FROM base
  UNION ALL
  SELECT 'bpe', source, doc_id, n_bpe, {PACK_BUDGET_TOKENS} FROM base
), offs AS (
  SELECT size_basis, source, doc_id, sz, budget,
         CAST(sum(sz) OVER (PARTITION BY size_basis, source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - sz AS BIGINT) AS start_offset
  FROM u
)
SELECT size_basis, source,
       CAST(floor(start_offset / (budget * 1.0)) AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(sz) AS BIGINT) AS seq_units,
       min(start_offset) AS first_offset
FROM offs GROUP BY size_basis, source, seq_id
"""


#: blocked registrable domains for the URL-hygiene gate
URL_BLOCKLIST = ("site1.com", "site4.com")


def q_url_audit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL hygiene (functions.urls) over deterministically injected links
    (the synthetic docs carry none): per-doc URL/host counts, the sorted
    host list, and whether the doc survives the domain blocklist —
    subdomains of a blocked domain are blocked too (sub.site1.com by
    site1.com). Value-exact over every doc."""
    from safedata_validator_spark.functions import urls

    d = _t(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            doc_id % 5 == 0,
            F.concat(
                F.lit(" see https://sub.site"), (doc_id % 7).cast("string"),
                F.lit(".com/p"), doc_id.cast("string"),
                F.lit(" and http://ok.example.org done"),
            ),
        ).otherwise(F.lit("")),
    )
    docs = d.select("doc_id", injected.alias("text"))
    audit = urls.url_audit(docs, "doc_id", "text")
    blocklist = spark.createDataFrame(
        [(b,) for b in URL_BLOCKLIST], "domain string"
    )
    kept = urls.filter_blocked_domains(docs, "doc_id", "text", blocklist).select(
        "doc_id", F.lit(True).alias("survived")
    )
    return (
        audit.withColumnRenamed("id", "doc_id")
        .join(kept, "doc_id", "left")
        .na.fill({"survived": False})
    )


def _sql_url_audit() -> str:
    from safedata_validator_spark.functions.urls import URL_PATTERN

    bl = ", ".join(f"('{b}')" for b in URL_BLOCKLIST)
    pat = URL_PATTERN.replace("'", "''")
    return rf"""
WITH injected AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0 THEN
           ' see https://sub.site' || CAST(doc_id % 7 AS VARCHAR)
           || '.com/p' || CAST(doc_id AS VARCHAR)
           || ' and http://ok.example.org done'
         ELSE '' END AS text
  FROM documents
), bl(domain) AS (VALUES {bl}),
extracted AS (
  SELECT doc_id, regexp_extract_all(coalesce(text,''), '{pat}') AS urls
  FROM injected
), hosts AS (
  SELECT doc_id,
         list_distinct(list_transform(urls,
           u -> lower(regexp_extract(u, 'https?://([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*)', 1)))) AS hosts,
         len(urls) AS n_urls
  FROM extracted
), blocked AS (
  SELECT DISTINCT h.doc_id
  FROM hosts h, UNNEST(h.hosts) AS t(host), bl
  WHERE t.host = bl.domain OR t.host LIKE '%.' || bl.domain
)
SELECT h.doc_id, CAST(h.n_urls AS INT) AS n_urls,
       CAST(len(h.hosts) AS INT) AS n_hosts,
       coalesce(array_to_string(list_sort(h.hosts), ','), '') AS hosts,
       (b.doc_id IS NULL) AS survived
FROM hosts h LEFT JOIN blocked b ON b.doc_id = h.doc_id
"""


SQL_URL_AUDIT_DOCS = _sql_url_audit()


def q_corpus_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment + stratified subsample
    (functions.sampling): md5-bucket split (80/10/10) and an independent
    20% sample, reported per (source, split) with the sampled-doc count —
    pure row-local expressions, reproducible at any parallelism."""
    from safedata_validator_spark.functions import sampling as sp

    d = _t(spark, sf_dir, "documents")
    split = sp.hash_split(d, "doc_id", weights=SPLIT_WEIGHTS)
    base = split.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    # aggregate the sample BEFORE joining: both join sides are per-stratum
    # rollups (|sources| x |splits| rows), never the corpus itself
    samp = (
        sp.stratified_sample(split, "doc_id", SAMPLE_FRACTION)
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled"))
    )
    return base.join(samp, ["source", "split"], "left").na.fill({"n_sampled": 0})


def _sql_corpus_split() -> str:
    from safedata_validator_spark.functions.sampling import BUCKETS

    def bucket(salt: str) -> str:
        return (
            f"(('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
            f" % {BUCKETS})"
        )

    names = list(SPLIT_WEIGHTS)
    acc, cases = 0.0, []
    for name in names[:-1]:
        acc += SPLIT_WEIGHTS[name]
        cases.append(f"WHEN {bucket('split')} < {int(round(acc * BUCKETS))} THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return rf"""
WITH assigned AS (
  SELECT source, n_chars, {case} AS split,
         CASE WHEN {bucket('sample')} < {int(round(SAMPLE_FRACTION * BUCKETS))} THEN 1 ELSE 0 END AS in_sample
  FROM documents
)
SELECT source, split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(in_sample) AS BIGINT) AS n_sampled
FROM assigned GROUP BY source, split
"""


SQL_CORPUS_SPLIT_DOCS = _sql_corpus_split()


def q_repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition battery (functions.repetition): per-doc
    top/duplicate n-gram fractions (n=2,3) and duplicate-line fractions —
    row-local array arithmetic, zero shuffles. Value-exact over every doc."""
    from safedata_validator_spark.functions import repetition as rp

    d = _t(spark, sf_dir, "documents", spread=True)
    return rp.repetition_profile(d, "doc_id", "text", ns=(2, 3)).withColumnRenamed(
        "id", "doc_id"
    )


def _sql_repetition() -> str:
    norm = (
        r"list_filter(string_split(trim(regexp_replace(regexp_replace("
        r"lower(coalesce(text,'')), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),"
        r" x -> x <> '')"
    )
    gram_cte = """g{n} AS (
  SELECT doc_id, array_to_string(t[i:i+{m}], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - {m})) AS i)
  WHERE len(t) >= {n}
), g{n}c AS (
  SELECT doc_id, gram, count(*) AS c FROM g{n} GROUP BY doc_id, gram
), g{n}s AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS dist, max(c) AS top
  FROM g{n}c GROUP BY doc_id
)"""
    return rf"""
WITH toks AS (
  SELECT doc_id, {norm} AS t,
         list_filter(list_transform(string_split(coalesce(text,''), chr(10)),
                     x -> trim(x)), x -> x <> '') AS lines
  FROM documents
), linestats AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_distinct(lines)) AS BIGINT) AS n_dlines,
         CAST(coalesce(list_sum(list_transform(lines, x -> length(x))), 0) AS BIGINT) AS lchars,
         CAST(coalesce(list_sum(list_transform(list_distinct(lines), x -> length(x))), 0) AS BIGINT) AS dlchars,
         CAST(len(t) AS BIGINT) AS n_tokens
  FROM toks
), {gram_cte.format(n=2, m=1)}, {gram_cte.format(n=3, m=2)}
SELECT l.doc_id, l.n_tokens, l.n_lines,
       round((l.n_lines - l.n_dlines) / CAST(NULLIF(l.n_lines, 0) AS DOUBLE), 6) AS dup_line_frac,
       round((l.lchars - l.dlchars) / CAST(NULLIF(l.lchars, 0) AS DOUBLE), 6) AS dup_line_char_frac,
       coalesce(g2s.total, 0) AS g2_total, coalesce(g2s.dist, 0) AS g2_distinct,
       round(g2s.top / CAST(NULLIF(g2s.total, 0) AS DOUBLE), 6) AS top2gram_frac,
       round((g2s.total - g2s.dist) / CAST(NULLIF(g2s.total, 0) AS DOUBLE), 6) AS dup2gram_frac,
       coalesce(g3s.total, 0) AS g3_total, coalesce(g3s.dist, 0) AS g3_distinct,
       round(g3s.top / CAST(NULLIF(g3s.total, 0) AS DOUBLE), 6) AS top3gram_frac,
       round((g3s.total - g3s.dist) / CAST(NULLIF(g3s.total, 0) AS DOUBLE), 6) AS dup3gram_frac
FROM linestats l
LEFT JOIN g2s ON g2s.doc_id = l.doc_id
LEFT JOIN g3s ON g3s.doc_id = l.doc_id
"""


SQL_REPETITION_DOCS = _sql_repetition()


def q_token_count_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-accurate byte-level BPE token counts per document (pinned
    merges table, functions/bpe_vocab.py) next to the cheap regex estimate.
    Golden VALUES oracle: the independent rank-order BPE formulation in
    tools/purepy_ref.py (DuckDB cannot express iterative pair merging)."""
    from safedata_validator_spark.functions.bpe import token_count_exact

    d = _t(spark, sf_dir, "documents", spread=True)
    return token_count_exact(d, "doc_id", "text")


#: window length for the cross-document span-dedup / surgical-decon gates
#: (short enough that the synthetic corpus' planted duplicates produce
#: non-trivial merged spans at the driver's sf0.01)
SPAN_N = 12
#: eval slice for the surgical-decontamination gate: every 7th doc plays
#: the held-out benchmark, the rest are the training corpus
DECON_EVAL_MOD = 7

#: shared DuckDB normalisation + n-token-window CTE body (the SQL twin of
#: functions.text.normalize_text + functions.spans.window_hash_array, except
#: the oracle keeps the window TEXT instead of hashing — agreement therefore
#: also re-witnesses xxhash64 collision-freeness on the corpus)
_SQL_SPAN_NORM = """
  SELECT doc_id,
         CASE WHEN trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN []
              ELSE string_split(trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g')), ' ')
         END AS toks
  FROM documents
"""


def q_span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring span dedup (functions.spans — the
    Lee et al. 2022 suffix-array signal re-expressed as one map-side-
    combined window-hash groupBy): every maximal merged span of >= SPAN_N
    consecutive normalised tokens shared verbatim by 2+ documents,
    flattened to one row per span. Full live DuckDB oracle: windows by
    list slicing over the window TEXT, duplicates by HAVING min!=max,
    span merge by gaps-and-islands."""
    from safedata_validator_spark.functions import spans as sps

    d = _t(spark, sf_dir, "documents", spread=True)
    out = sps.duplicated_spans(d, "doc_id", "text", n=SPAN_N)
    flat = (
        out.select(
            F.col("id").alias("doc_id"),
            "n_tokens",
            F.explode("spans").alias("sp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("sp.s").alias("span_start"),
            F.col("sp.e").alias("span_end"),
        )
    )
    return dd.carry(out, flat)


SQL_SPAN_DEDUP_DOCS = f"""
WITH norm AS ({_SQL_SPAN_NORM}),
wins AS (
  SELECT doc_id, u.pos - 1 AS pos,
         array_to_string(toks[u.pos:u.pos+{SPAN_N - 1}], ' ') AS w
  FROM norm, LATERAL unnest(range(1, greatest(len(toks)-{SPAN_N}+2, 1))) AS u(pos)),
dup AS (SELECT w FROM wins GROUP BY w HAVING min(doc_id) <> max(doc_id)),
hits AS (SELECT doc_id, pos FROM wins JOIN dup USING (w)),
marks AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= {SPAN_N}
              THEN 0 ELSE 1 END AS brk
  FROM hits),
isl AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        FROM marks),
merged AS (SELECT doc_id, min(pos) AS s, max(pos)+{SPAN_N}-1 AS e
           FROM isl GROUP BY doc_id, g)
SELECT m.doc_id,
       CAST(len(n.toks) AS INTEGER) AS n_tokens,
       CAST(m.s AS INTEGER) AS span_start,
       CAST(m.e AS INTEGER) AS span_end
FROM merged m JOIN norm n USING (doc_id)
"""


def q_decon_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical decontamination (functions.spans.decontaminated_spans):
    locate eval-leaked passages in the training slice as merged maximal
    spans — the eval side's distinct window hashes broadcast against the
    row-locally exploded training windows, output bounded by leak volume.
    Eval slice = every DECON_EVAL_MOD-th doc; training = the rest. Full
    live DuckDB oracle over the same window/merge semantics."""
    from safedata_validator_spark.functions import spans as sps

    d = _t(spark, sf_dir, "documents", spread=True)
    train = d.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    ev = d.where(F.col("doc_id") % DECON_EVAL_MOD == 0)
    out = sps.decontaminated_spans(train, ev, "doc_id", "text", n=SPAN_N)
    flat = (
        out.select(
            F.col("id").alias("doc_id"),
            "n_tokens",
            F.explode("spans").alias("sp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("sp.s").alias("span_start"),
            F.col("sp.e").alias("span_end"),
        )
    )
    return dd.carry(out, flat)


SQL_DECON_SPANS_DOCS = f"""
WITH norm AS ({_SQL_SPAN_NORM}),
wins AS (
  SELECT doc_id, u.pos - 1 AS pos,
         array_to_string(toks[u.pos:u.pos+{SPAN_N - 1}], ' ') AS w
  FROM norm, LATERAL unnest(range(1, greatest(len(toks)-{SPAN_N}+2, 1))) AS u(pos)),
ewins AS (SELECT DISTINCT w FROM wins WHERE doc_id % {DECON_EVAL_MOD} = 0),
hits AS (
  SELECT doc_id, pos FROM wins
  WHERE doc_id % {DECON_EVAL_MOD} <> 0 AND w IN (SELECT w FROM ewins)),
marks AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= {SPAN_N}
              THEN 0 ELSE 1 END AS brk
  FROM hits),
isl AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        FROM marks),
merged AS (SELECT doc_id, min(pos) AS s, max(pos)+{SPAN_N}-1 AS e
           FROM isl GROUP BY doc_id, g)
SELECT m.doc_id,
       CAST(len(n.toks) AS INTEGER) AS n_tokens,
       CAST(m.s AS INTEGER) AS span_start,
       CAST(m.e AS INTEGER) AS span_end
FROM merged m JOIN norm n USING (doc_id)
"""


#: interpolation weight for the LM-quality gate (CCNet-style bigram model)
LM_LAM = 0.9


def q_lm_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistical LM quality (functions.lm_quality): every doc
    scored with the interpolated bigram cross-entropy of the corpus's OWN
    statistics (self-scoring measures repetitiveness/templatedness — the
    CCNet signal with the corpus as its own reference). Full live DuckDB
    oracle: reference counts by GROUP BY over unnested token/bigram
    streams, the same interpolated probability, avg(-log2 p) per doc.
    Docs with < 2 tokens have NULL cross_entropy in both engines."""
    from safedata_validator_spark.functions import lm_quality as lmq

    # spread=False: the per-doc avg(-log2 p) sums doubles in occurrence
    # order, so the scan keeps its exact (unrepartitioned) lineage — a
    # changed addition order could flip the 6th rounded decimal against
    # the oracle (ADVICE r05 #4).
    d = _t(spark, sf_dir, "documents", spread=False)
    out = lmq.bigram_cross_entropy(d, "doc_id", "text", lam=LM_LAM)
    flat = out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "n_bigrams",
        "cross_entropy",
    )
    return dd.carry(out, flat)


SQL_LM_QUALITY_DOCS = f"""
WITH norm AS ({_SQL_SPAN_NORM}),
runi AS (SELECT u.w, count(*) AS c FROM norm, LATERAL unnest(toks) AS u(w) GROUP BY u.w),
rbg AS (SELECT toks[p.i] AS w1, toks[p.i+1] AS w2, count(*) AS c12
        FROM norm, LATERAL unnest(range(1, greatest(len(toks), 1))) AS p(i)
        GROUP BY 1, 2),
tot AS (SELECT sum(c) AS n, count(*) AS v FROM runi),
dbg AS (SELECT doc_id, toks[p.i] AS w1, toks[p.i+1] AS w2
        FROM norm, LATERAL unnest(range(1, greatest(len(toks), 1))) AS p(i)),
scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         avg(-log2({LM_LAM} * coalesce(rbg.c12 * 1.0 / u1.c, 0.0)
                   + {1.0 - LM_LAM} * (coalesce(u2.c, 0) + 1.0) / (tot.n + tot.v))) AS h
  FROM dbg
  LEFT JOIN rbg ON dbg.w1 = rbg.w1 AND dbg.w2 = rbg.w2
  LEFT JOIN runi u1 ON dbg.w1 = u1.w
  LEFT JOIN runi u2 ON dbg.w2 = u2.w
  CROSS JOIN tot
  GROUP BY doc_id)
SELECT n.doc_id,
       CAST(len(n.toks) AS INTEGER) AS n_tokens,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(s.h, 6) AS cross_entropy
FROM norm n LEFT JOIN scored s USING (doc_id)
"""


def q_winnow_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap pairs (MOSS-style local-similarity
    detection): docs sharing ≥ min_common selected k-gram hashes. Explode +
    self equi-join on the fingerprint — the same scale shape as the shingle
    join, but over the winnowed (w× smaller) selection."""
    d = _t(spark, sf_dir, "documents", spread=True)
    # explode_OUTER: the plain explode triggers InferFiltersFromGenerate,
    # which pushes a size(...)>0 pre-filter below the projections with the
    # whole winnowing chain INLINED — re-evaluating the gram array per
    # window, O(n²) per document. The outer variant infers no filter; the
    # null rows (fingerprint-less docs) drop afterwards for free.
    fps = tx.with_chargram_fingerprints(d, "text", out="__fps", k=8, w=4).select(
        F.col("doc_id").alias("id"), F.explode_outer("__fps").alias("fp")
    ).where(F.col("fp").isNotNull())
    # frequency cut (same as the shingle join's max_df): a fingerprint present
    # in a large share of documents is boilerplate and would make its join
    # bucket quadratic without adding discrimination
    hot = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") > 20)
    fps = fps.join(hot.select("fp"), "fp", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= 20)
    )


def q_wkt_geo_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKT geometry audit (SURVEY §2.8 Geo — reference locations.py:353-364):
    deterministic WKT strings are built from orders columns, parsed back with
    the JVM-side kind/syntax/bounds expressions, and aggregated; the DuckDB
    oracle computes the expected values arithmetically WITHOUT any WKT round
    trip, so a parsing defect cannot cancel itself out."""
    from safedata_validator_spark.functions import geo

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")
    c = F.col("o_custkey").cast("long")
    lon = (F.pmod(k, F.lit(360)) - 180 + 0.25).cast("double")
    lat = (F.pmod(c, F.lit(180)) - 90 + 0.5).cast("double")
    x2, y2 = lon + 1.0, lat + 1.0
    s = lambda v: v.cast("string")  # noqa: E731
    point = F.concat(F.lit("POINT ("), s(lon), F.lit(" "), s(lat), F.lit(")"))
    poly = F.concat(
        F.lit("POLYGON (("), s(lon), F.lit(" "), s(lat), F.lit(", "),
        s(x2), F.lit(" "), s(lat), F.lit(", "), s(x2), F.lit(" "), s(y2),
        F.lit(", "), s(lon), F.lit(" "), s(lat), F.lit("))"),
    )
    broken = F.concat(F.lit("POINT ("), s(lon), F.lit(")"))  # x without y
    wkt = (
        F.when(F.pmod(k, F.lit(97)) == 0, broken)
        .when(F.pmod(k, F.lit(7)) == 0, poly)
        .otherwise(point)
    )
    p = o.select(wkt.alias("wkt")).select(
        geo.wkt_kind(F.col("wkt")).alias("kind"),
        geo.wkt_is_valid_syntax(F.col("wkt")).alias("valid"),
        geo.wkt_bounds(F.col("wkt")).alias("b"),
    )
    return p.groupBy("kind", "valid").agg(
        F.count(F.lit(1)).alias("n"),
        # coalesce: the invalid group aggregates only NULL bounds, and NULL
        # numerics cross the DuckDB/pandas boundary as NaN — pin a sentinel
        F.coalesce(F.round(F.min("b.min_x"), 6), F.lit(-999.0)).alias("min_x"),
        F.coalesce(F.round(F.max("b.max_x"), 6), F.lit(-999.0)).alias("max_x"),
        F.coalesce(F.round(F.avg("b.min_y"), 6), F.lit(-999.0)).alias("avg_min_y"),
        F.coalesce(F.round(F.avg("b.max_y"), 6), F.lit(-999.0)).alias("avg_max_y"),
    )


SQL_WKT_GEO_AUDIT = """
WITH g AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         (CAST(o_orderkey AS BIGINT) % 360) - 180 + 0.25 AS lon,
         (CAST(o_custkey AS BIGINT) % 180) - 90 + 0.5 AS lat
  FROM orders
), r AS (
  SELECT CASE WHEN k % 97 = 0 THEN 'POINT'
              WHEN k % 7 = 0 THEN 'POLYGON' ELSE 'POINT' END AS kind,
         (k % 97 <> 0) AS valid,
         CASE WHEN k % 97 = 0 THEN NULL ELSE lon END AS min_x,
         CASE WHEN k % 97 = 0 THEN NULL
              WHEN k % 7 = 0 THEN lon + 1 ELSE lon END AS max_x,
         CASE WHEN k % 97 = 0 THEN NULL ELSE lat END AS min_y,
         CASE WHEN k % 97 = 0 THEN NULL
              WHEN k % 7 = 0 THEN lat + 1 ELSE lat END AS max_y
  FROM g
)
SELECT kind, valid, COUNT(*) AS n,
       COALESCE(round(MIN(min_x), 6), -999.0) AS min_x,
       COALESCE(round(MAX(max_x), 6), -999.0) AS max_x,
       COALESCE(round(AVG(min_y), 6), -999.0) AS avg_min_y,
       COALESCE(round(AVG(max_y), 6), -999.0) AS avg_max_y
FROM r GROUP BY kind, valid
"""


# --------------------------------------------------------------------------
# 25b. Full OGC validity audit — drives the BUILT-IN pure-numpy geometry
#      engine (functions/geo_validity.py, the shapely-free backend of
#      geo.full_validity; reference locations.py:353-364 `.is_valid`).
#      Six geometry classes are constructed deterministically from orders
#      keys; each class has a KNOWN validity by construction, so the DuckDB
#      oracle computes the expected (class, ogc_valid, n) table purely
#      arithmetically — no geometry code on the oracle side, meaning a
#      validity-engine defect cannot cancel itself out.
# --------------------------------------------------------------------------


def q_ogc_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGC validity over generated WKT: valid points/polygons/holed polygons
    vs bowties (self-intersection), Z points, unclosed rings and
    hole-outside-shell — through the Arrow-batched pandas UDF with the
    builtin backend (environment-independent: shapely, when installed, is
    covered by the parity battery in tests/test_env_gated.py instead)."""
    from safedata_validator_spark.functions import geo

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")
    c = F.col("o_custkey").cast("long")
    # quarter-grid coordinates: exact binary fractions, so double→string
    # renders plain decimals both here and in the oracle's expectations
    lon = (F.pmod(k, F.lit(360)) - 180 + 0.25).cast("double")
    lat = (F.pmod(c, F.lit(180)) - 90 + 0.5).cast("double")
    s = lambda v: v.cast("string")  # noqa: E731
    x0, y0, x1, y1 = s(lon), s(lat), s(lon + 1.0), s(lat + 1.0)
    hx0, hy0, hx1, hy1 = s(lon + 0.25), s(lat + 0.25), s(lon + 0.5), s(lat + 0.5)
    SP, CM = F.lit(" "), F.lit(", ")

    def ring(ax, ay, bx, by):
        # axis-aligned CCW rectangle ring (ax ay, bx ay, bx by, ax by, ax ay)
        return F.concat(ax, SP, ay, CM, bx, SP, ay, CM, bx, SP, by, CM,
                        ax, SP, by, CM, ax, SP, ay)

    point = F.concat(F.lit("POINT ("), x0, SP, y0, F.lit(")"))
    zpoint = F.concat(F.lit("POINT Z ("), x0, SP, y0, F.lit(" 5)"))
    polygon = F.concat(F.lit("POLYGON (("), ring(x0, y0, x1, y1), F.lit("))"))
    bowtie = F.concat(  # edges cross: (x0 y0→x1 y1) × (x1 y0→x0 y1)
        F.lit("POLYGON (("), x0, SP, y0, CM, x1, SP, y1, CM, x1, SP, y0,
        CM, x0, SP, y1, CM, x0, SP, y0, F.lit("))"),
    )
    unclosed = F.concat(  # first != last: ring never closes
        F.lit("POLYGON (("), x0, SP, y0, CM, x1, SP, y0, CM, x1, SP, y1,
        F.lit("))"),
    )
    holed = F.concat(  # hole strictly inside the shell: valid
        F.lit("POLYGON (("), ring(x0, y0, x1, y1), F.lit("), ("),
        ring(hx0, hy0, hx1, hy1), F.lit("))"),
    )
    stray_hole = F.concat(  # hole 5 units east of the shell: invalid
        F.lit("POLYGON (("), ring(x0, y0, x1, y1), F.lit("), ("),
        ring(s(lon + 5.0), hy0, s(lon + 5.5), hy1), F.lit("))"),
    )
    cls = F.pmod(k, F.lit(11))
    wkt = (
        F.when(cls == 0, bowtie)
        .when(cls == 1, zpoint)
        .when(cls == 2, unclosed)
        .when(cls == 3, stray_hole)
        .when(cls == 4, holed)
        .when(cls == 5, polygon)
        .otherwise(point)
    )
    label = (
        F.when(cls == 0, "bowtie")
        .when(cls == 1, "zpoint")
        .when(cls == 2, "unclosed")
        .when(cls == 3, "stray_hole")
        .when(cls == 4, "holed")
        .when(cls == 5, "polygon")
        .otherwise("point")
    )
    g = o.select(label.alias("cls"), wkt.alias("wkt"))
    checked = geo.full_validity(g, "wkt", backend="builtin")
    return checked.groupBy("cls", "ogc_valid").agg(F.count(F.lit(1)).alias("n"))


SQL_OGC_VALIDITY_AUDIT = """
SELECT CASE CAST(o_orderkey AS BIGINT) % 11
         WHEN 0 THEN 'bowtie' WHEN 1 THEN 'zpoint' WHEN 2 THEN 'unclosed'
         WHEN 3 THEN 'stray_hole' WHEN 4 THEN 'holed' WHEN 5 THEN 'polygon'
         ELSE 'point' END AS cls,
       CAST(o_orderkey AS BIGINT) % 11 NOT IN (0, 1, 2, 3) AS ogc_valid,
       COUNT(*) AS n
FROM orders GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# 25c. Real PNG decode audit — drives the BUILT-IN pure-stdlib PNG codec
#      (functions/png.py) through decode_image's REAL (non-surrogate) path
#      inside a mapInPandas stage: per doc a solid-colour PNG is encoded
#      (varying size, channel layout grey/RGB/RGBA and scanline filter type
#      0-4, so every unfilter branch executes), decoded back, and pixel
#      statistics emitted. The DuckDB oracle recomputes those statistics
#      ARITHMETICALLY from the colour formula — it never touches a byte of
#      PNG — so an encode/decode defect cannot cancel out.
# --------------------------------------------------------------------------

_PNG_AUDIT_DOCS = 240


def q_png_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as _pd

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _PNG_AUDIT_DOCS)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )

    def per_batch(it):
        import numpy as _np

        from safedata_validator_spark.functions.multimodal import decode_image
        from safedata_validator_spark.functions.png import encode_png

        for pdf in it:
            ids, n_px, mean_px, min_px, max_px = [], [], [], [], []
            for did in pdf["doc_id"]:
                i = int(did)
                r, g, b = (i * 37) % 256, (i * 59) % 256, (i * 83) % 256
                grey = (i * 53) % 256
                alpha = (i * 29) % 256
                w, h = i % 6 + 3, i % 5 + 2
                layout = i % 3  # 0=RGB, 1=RGBA, 2=greyscale
                if layout == 0:
                    arr = _np.tile(_np.array([r, g, b], _np.uint8), (h, w, 1))
                elif layout == 1:
                    arr = _np.tile(_np.array([r, g, b, alpha], _np.uint8), (h, w, 1))
                else:
                    arr = _np.full((h, w, 1), grey, _np.uint8)
                img = decode_image(encode_png(arr, filter_type=i % 5))
                ids.append(i)
                n_px.append(int(img.size))
                mean_px.append(round(float(img.mean()), 6))
                min_px.append(int(img.min()))
                max_px.append(int(img.max()))
            yield _pd.DataFrame(
                {"doc_id": ids, "n_px": n_px, "mean_px": mean_px,
                 "min_px": min_px, "max_px": max_px}
            )

    return d.mapInPandas(
        per_batch,
        schema="doc_id long, n_px int, mean_px double, min_px int, max_px int",
    )


SQL_PNG_DECODE_AUDIT = f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         (CAST(doc_id AS BIGINT) * 37) % 256 AS r,
         (CAST(doc_id AS BIGINT) * 59) % 256 AS g,
         (CAST(doc_id AS BIGINT) * 83) % 256 AS b,
         (CAST(doc_id AS BIGINT) * 53) % 256 AS grey,
         CAST(doc_id AS BIGINT) % 6 + 3 AS w,
         CAST(doc_id AS BIGINT) % 5 + 2 AS h,
         CAST(doc_id AS BIGINT) % 3 AS layout
  FROM documents WHERE doc_id < {_PNG_AUDIT_DOCS}
)
SELECT i AS doc_id,
       CAST(w * h * 3 AS INT) AS n_px,
       -- decode_image coerces to RGB: alpha dropped, grey replicated
       round(CASE WHEN layout = 2 THEN CAST(grey AS DOUBLE)
                  ELSE (r + g + b) / 3.0 END, 6) AS mean_px,
       CAST(CASE WHEN layout = 2 THEN grey ELSE LEAST(r, g, b) END AS INT) AS min_px,
       CAST(CASE WHEN layout = 2 THEN grey ELSE GREATEST(r, g, b) END AS INT) AS max_px
FROM p
"""


_JPEG_AUDIT_DOCS = 120


def q_jpeg_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode audit over the built-in T.81 codec
    (functions/jpeg.py): per doc, synthesize a flat image (grayscale /
    equal-channel RGB at 4:4:4 / equal-channel RGB at 4:2:0), encode at
    quality=100 — alternating deterministically between BASELINE (SOF0)
    and PROGRESSIVE (SOF2, Annex G multi-scan) streams — and decode
    through the SAME multimodal entry point the pipeline uses. Flat q100
    streams decode EXACTLY in both modes (all-ones quant tables; equal
    channels put Cb=Cr at precisely 128, so the color roundtrip is
    integer-exact), which makes pixel statistics arithmetically derivable —
    ONE DuckDB oracle recomputes them from the doc id alone for both
    encodings. Gates markers, Huffman tables both directions, DC coding,
    progressive scan scripts (spectral selection / successive
    approximation / DC refinement / EOB runs), the 4:2:0 MCU interleave +
    upsample, color conversion, and odd-size cropping; the AC/noise path
    is unit-gated in tests/test_builtin_codecs.py."""
    import pandas as _pd

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _JPEG_AUDIT_DOCS)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )

    def per_batch(it):
        import numpy as _np

        from safedata_validator_spark.functions.jpeg import (
            encode_jpeg,
            encode_progressive_jpeg,
        )
        from safedata_validator_spark.functions.multimodal import decode_image

        for pdf in it:
            ids, n_px, mean_px, min_px, max_px = [], [], [], [], []
            for did in pdf["doc_id"]:
                i = int(did)
                v = (i * 53) % 256
                w, h = i % 7 + 3, i % 5 + 2
                layout = i % 3  # 0=gray, 1=RGB 4:4:4, 2=RGB 4:2:0
                enc = encode_progressive_jpeg if (i // 9) % 2 else encode_jpeg
                if layout == 0:
                    arr = _np.full((h, w), v, _np.uint8)
                    payload = enc(arr, quality=100)
                else:
                    arr = _np.full((h, w, 3), v, _np.uint8)
                    payload = enc(
                        arr, quality=100, subsample="444" if layout == 1 else "420"
                    )
                img = decode_image(payload)
                ids.append(i)
                n_px.append(int(img.size))
                mean_px.append(round(float(img.mean()), 6))
                min_px.append(int(img.min()))
                max_px.append(int(img.max()))
            yield _pd.DataFrame(
                {"doc_id": ids, "n_px": n_px, "mean_px": mean_px,
                 "min_px": min_px, "max_px": max_px}
            )

    return d.mapInPandas(
        per_batch,
        schema="doc_id long, n_px int, mean_px double, min_px int, max_px int",
    )


SQL_JPEG_DECODE_AUDIT = f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         (CAST(doc_id AS BIGINT) * 53) % 256 AS v,
         CAST(doc_id AS BIGINT) % 7 + 3 AS w,
         CAST(doc_id AS BIGINT) % 5 + 2 AS h
  FROM documents WHERE doc_id < {_JPEG_AUDIT_DOCS}
)
SELECT i AS doc_id,
       -- decode_image coerces to RGB: grayscale replicates to 3 channels
       CAST(w * h * 3 AS INT) AS n_px,
       round(CAST(v AS DOUBLE), 6) AS mean_px,
       CAST(v AS INT) AS min_px,
       CAST(v AS INT) AS max_px
FROM p
"""


def q_image_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG + baseline-JPEG decode audits folded into ONE catalog gate with a
    ``format`` discriminator column (the driver's correctness sweep checks
    the first 50 catalog entries, so sibling gates with identical schemas
    are consolidated to keep EVERY codec value-checked every round —
    VERDICT r04 §next 3). Each branch is exactly the standalone audit:
    see q_png_decode_audit / q_jpeg_decode_audit for what it gates."""
    png = q_png_decode_audit(spark, sf_dir).select(F.lit("png").alias("format"), "*")
    jpg = q_jpeg_decode_audit(spark, sf_dir).select(F.lit("jpeg").alias("format"), "*")
    return png.unionByName(jpg)


SQL_IMAGE_DECODE_AUDIT = f"""
SELECT 'png' AS format, * FROM ({SQL_PNG_DECODE_AUDIT})
UNION ALL
SELECT 'jpeg' AS format, * FROM ({SQL_JPEG_DECODE_AUDIT})
"""


_AUDIO_AUDIT_DOCS = 96


def q_audio_features_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode audit over the built-in WAV/PCM, FLAC, G.711 AND
    IMA-ADPCM codecs (functions/wav.py, functions/flac.py): per doc,
    synthesize a signal of known amplitude, encode to one of four formats
    (rotating deterministically by doc id) and decode + featurize through
    the SAME entry points the multimodal pipeline uses
    (multimodal.decode_audio → wav.audio_features).

    * WAV/PCM + FLAC: a constant-|amplitude| square wave makes RMS and
      peak EXACT dyadic rationals (a/2^15 or a/2^7) and zero crossings a
      floor expression; FLAC is lossless with the same normalization.
    * G.711 mu-law/A-law (tags 7/6) are LOSSY — but the square-wave
      amplitude is chosen as a DECODER-TABLE FIXED POINT (the value some
      8-bit code decodes to), and re-encoding a reconstruction level
      returns its own code (involution, exhaustively property-tested), so
      the round trip is EXACT and the oracle computes the table value
      arithmetically from the doc id (the G.711 segment/mantissa formula
      in plain SQL).
    * IMA ADPCM (tag 0x11) adapts its step per sample, so only a CONSTANT
      clip survives exactly (delta 0 → nibble 0 → predictor unchanged);
      channel 1 carries the NEGATED constant to gate de-interleave sign
      handling, and the decoder returns whole padded blocks, so n_frames
      is ceil(n/505)*505 in the oracle.

    ONE arithmetic DuckDB oracle gates all four formats from the doc id
    alone.  Gates RIFF framing, PCM 8/16-bit decode, FLAC
    frame/subframe/rice decode + CRC/MD5, G.711 table decode + segment
    encode, ADPCM block headers/nibble order/predictor, channel
    de-interleave, normalization and the feature math; 24/32-bit + float
    paths and ADPCM/G.711 fidelity on moving signals are unit- and
    property-gated in tests/test_builtin_codecs.py and
    tests/test_codec_properties.py."""
    import pandas as _pd

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _AUDIO_AUDIT_DOCS)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )

    def per_batch(it):
        import numpy as _np

        from safedata_validator_spark.functions.flac import encode_flac
        from safedata_validator_spark.functions.multimodal import decode_audio
        from safedata_validator_spark.functions.wav import (
            audio_features,
            encode_g711_wav,
            encode_ima_adpcm,
            encode_wav,
        )

        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                i = int(did)
                layout = i % 3  # 0=16-bit mono, 1=16-bit stereo, 2=8-bit mono
                fam = (i // 9) % 4  # 0=wav, 1=flac, 2=g711, 3=ima-adpcm
                use_flac = fam == 1
                a16 = (i * 997) % 30000 + 500
                a8 = (i * 31) % 120 + 8
                p = i % 7 + 2
                # n ≡ 0 (mod 16) keeps duration_ms tie-free at every rate
                n = 800 + (i % 40) * 16
                rate = (8000, 16000, 44100)[(i // 3) % 3]
                up = (_np.arange(n) // p) % 2 == 0
                if fam >= 2:
                    chn = 2 if layout == 1 else 1
                    if fam == 2:
                        # amplitude = the value G.711 code `lo` decodes to
                        # (fixed point of the lossy quantizer → exact RT)
                        lo = (i * 13) % 112 + 8
                        if i % 2 == 0:  # mu-law (tag 7)
                            val = ((lo % 16) * 8 + 132) * (1 << (lo // 16)) - 132
                        else:  # A-law (tag 6)
                            seg, mant = lo // 16, lo % 16
                            val = (
                                mant * 16 + 8
                                if seg == 0
                                else (mant * 16 + 264) << max(seg - 1, 0)
                            )
                        mono = _np.where(up, val, -val).astype(_np.int16)
                        sig = (
                            mono[:, None].repeat(2, axis=1) if chn == 2 else mono
                        )
                        payload = encode_g711_wav(
                            sig, rate, law="ulaw" if i % 2 == 0 else "alaw"
                        )
                    else:
                        # ADPCM: constant clip (delta 0 → exact); negated
                        # second channel gates de-interleave sign handling
                        const = _np.full(n, a16, dtype=_np.int16)
                        sig = (
                            _np.stack([const, -const], axis=1)
                            if chn == 2
                            else const
                        )
                        payload = encode_ima_adpcm(sig, rate)
                elif layout == 2:
                    if use_flac:  # FLAC 8-bit is signed; same a/2^7 values
                        payload = encode_flac(
                            _np.where(up, a8, -a8), rate, bits=8
                        )
                    else:
                        samples = _np.where(up, 128 + a8, 128 - a8)
                        payload = encode_wav(samples, rate, bits=8)
                else:
                    mono = _np.where(up, a16, -a16)
                    ch = mono[:, None].repeat(2, axis=1) if layout == 1 else mono
                    enc = encode_flac if use_flac else encode_wav
                    payload = enc(ch, rate, bits=16)
                sr, dec = decode_audio(payload)
                f = audio_features(sr, dec)
                rows.append(
                    {
                        "doc_id": i,
                        "sample_rate": sr,
                        "n_frames": f["n_frames"],
                        "n_channels": dec.shape[1],
                        "duration_ms": f["duration_ms"],
                        "rms": f["rms"],
                        "peak": f["peak"],
                        "zero_crossings": f["zero_crossings"],
                    }
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_frames", "n_channels",
                    "duration_ms", "rms", "peak", "zero_crossings",
                ],
            )

    return d.mapInPandas(
        per_batch,
        schema=(
            "doc_id long, sample_rate int, n_frames int, n_channels int, "
            "duration_ms int, rms double, peak double, zero_crossings int"
        ),
    )


SQL_AUDIO_FEATURES_AUDIT = f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         CAST(doc_id AS BIGINT) % 3 AS layout,
         (CAST(doc_id AS BIGINT) // 9) % 4 AS fam,
         (CAST(doc_id AS BIGINT) * 13) % 112 + 8 AS lo,
         (CAST(doc_id AS BIGINT) * 997) % 30000 + 500 AS a16,
         (CAST(doc_id AS BIGINT) * 31) % 120 + 8 AS a8,
         CAST(doc_id AS BIGINT) % 7 + 2 AS hp,
         800 + (CAST(doc_id AS BIGINT) % 40) * 16 AS n,
         CASE (CAST(doc_id AS BIGINT) // 3) % 3
           WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS rate
  FROM documents WHERE doc_id < {_AUDIO_AUDIT_DOCS}
), q AS (
  SELECT *,
         -- the G.711 reconstruction level code `lo` decodes to: the
         -- segment/mantissa expansion of the mu-law (even doc) or A-law
         -- (odd doc) tables — the exact amplitude the Spark side encoded
         CASE WHEN i % 2 = 0
              THEN ((lo % 16) * 8 + 132) * (1 << (lo // 16)) - 132
              ELSE CASE WHEN lo // 16 = 0 THEN (lo % 16) * 16 + 8
                        ELSE ((lo % 16) * 16 + 264) * (1 << (lo // 16 - 1))
                   END
         END AS gval,
         -- ADPCM decodes whole 505-sample blocks (tail block padded)
         ((n + 504) // 505) * 505 AS n_dec
  FROM p
)
SELECT i AS doc_id,
       CAST(rate AS INT) AS sample_rate,
       CAST(CASE WHEN fam = 3 THEN n_dec ELSE n END AS INT) AS n_frames,
       CAST(CASE WHEN layout = 1 THEN 2 ELSE 1 END AS INT) AS n_channels,
       CAST(round((CASE WHEN fam = 3 THEN n_dec ELSE n END) * 1000.0 / rate)
            AS INT) AS duration_ms,
       -- constant-|amplitude| signal: RMS = peak = a / 2^(bits-1), an
       -- exact dyadic double on both sides (no rounding applied)
       CASE WHEN fam = 2 THEN gval / 32768.0
            WHEN fam = 3 THEN a16 / 32768.0
            WHEN layout = 2 THEN a8 / 128.0 ELSE a16 / 32768.0 END AS rms,
       CASE WHEN fam = 2 THEN gval / 32768.0
            WHEN fam = 3 THEN a16 / 32768.0
            WHEN layout = 2 THEN a8 / 128.0 ELSE a16 / 32768.0 END AS peak,
       CAST(CASE WHEN fam = 3 THEN 0 ELSE (n - 1) // hp END AS INT)
         AS zero_crossings
FROM q
"""


_GIF_AUDIT_DOCS = 72


def q_gif_frames_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-frame decode audit over the built-in animated-GIF codec
    (functions/gif.py): per doc, encode an animated GIF (2–4 solid-color
    frames, per-frame delays, frame 0 interlaced on every third doc) and
    decode it back through the SAME seam ``sample_frames(codec='real')``
    uses (multimodal.decode_frames).  Solid frames make per-channel pixel
    means exact integers and the GIF delay arithmetic (10 ms ticks,
    cumulative timestamps) closed-form, so the DuckDB oracle recomputes
    every output from the doc id alone.  Gates LSD/palette parsing,
    variable-width LZW round trip, interlace reordering, frame compositing
    and timestamp accumulation; disposal/transparency paths are unit-gated
    in tests/test_builtin_codecs.py."""
    import pandas as _pd

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _GIF_AUDIT_DOCS)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )

    def per_batch(it):
        import numpy as _np

        from safedata_validator_spark.functions.gif import encode_gif
        from safedata_validator_spark.functions.multimodal import decode_frames

        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                i = int(did)
                nf = i % 3 + 2
                w, h = i % 5 + 3, i % 4 + 2
                pal = _np.array(
                    [
                        [
                            (i * 37 + c * 19) % 256,
                            (i * 59 + c * 23) % 256,
                            (i * 83 + c * 29) % 256,
                        ]
                        for c in range(4)
                    ],
                    dtype=_np.uint8,
                )
                frames = [
                    _np.full((h, w), fi % 4, dtype=_np.uint8) for fi in range(nf)
                ]
                payload = encode_gif(
                    frames,
                    pal,
                    delays_ms=[(fi + 1) * 20 for fi in range(nf)],
                    interlace_first=i % 3 == 0,
                )
                for fi, (t_ms, img) in enumerate(decode_frames(payload)):
                    rows.append(
                        {
                            "doc_id": i,
                            "frame_idx": fi,
                            "t_ms": int(t_ms),
                            "mean_r": float(img[:, :, 0].mean()),
                            "mean_g": float(img[:, :, 1].mean()),
                            "mean_b": float(img[:, :, 2].mean()),
                        }
                    )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "t_ms", "mean_r", "mean_g", "mean_b",
                ],
            )

    return d.mapInPandas(
        per_batch,
        schema=(
            "doc_id long, frame_idx int, t_ms int, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


SQL_GIF_FRAMES_AUDIT = f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS i, CAST(doc_id AS BIGINT) % 3 + 2 AS nf
  FROM documents WHERE doc_id < {_GIF_AUDIT_DOCS}
),
f AS (
  SELECT i, nf, unnest(range(0, nf)) AS fi FROM p
)
SELECT i AS doc_id,
       CAST(fi AS INT) AS frame_idx,
       -- cumulative delays: sum of (k+1)*20 for k < fi
       CAST(10 * fi * (fi + 1) AS INT) AS t_ms,
       -- solid frame fi uses palette entry fi (nf <= 4): exact means
       CAST((i * 37 + fi * 19) % 256 AS DOUBLE) AS mean_r,
       CAST((i * 59 + fi * 23) % 256 AS DOUBLE) AS mean_g,
       CAST((i * 83 + fi * 29) % 256 AS DOUBLE) AS mean_b
FROM f
"""


_AVI_AUDIT_DOCS = 60


def q_avi_frames_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode audit over the built-in MJPEG-AVI path
    (functions/avi.py + functions/jpeg.py): per doc, encode 2-4 flat frames
    (grayscale / equal-channel RGB at 4:4:4 / at 4:2:0, rotating by doc) as
    quality-100 baseline JPEGs, wrap them in a single-stream RIFF/AVI
    container at a per-doc fps, and decode back through the SAME seam
    ``sample_frames(codec='real')`` uses (multimodal.decode_frames).  Flat
    q100 JPEG decodes exactly (see q_jpeg_decode_audit) and AVI timestamps
    are pure integer arithmetic (fi * 1000 // fps from the stream header's
    scale/rate), so the DuckDB oracle recomputes every output from the doc
    id alone.  Gates RIFF chunk walking, hdrl/strl/strh parsing, movi frame
    extraction, MJPEG payload decode and timestamp assignment."""
    import pandas as _pd

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _AVI_AUDIT_DOCS)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )

    def per_batch(it):
        import numpy as _np

        from safedata_validator_spark.functions.avi import encode_avi
        from safedata_validator_spark.functions.jpeg import encode_jpeg
        from safedata_validator_spark.functions.multimodal import decode_frames

        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                i = int(did)
                nf = i % 3 + 2
                w, h = i % 5 + 3, i % 4 + 2
                fps = i % 4 + 5
                layout = i % 3  # 0=gray, 1=RGB 4:4:4, 2=RGB 4:2:0
                jpegs = []
                for fi in range(nf):
                    v = (i * 31 + fi * 57) % 256
                    if layout == 0:
                        jpegs.append(encode_jpeg(_np.full((h, w), v, _np.uint8), quality=100))
                    else:
                        jpegs.append(
                            encode_jpeg(
                                _np.full((h, w, 3), v, _np.uint8),
                                quality=100,
                                subsample="444" if layout == 1 else "420",
                            )
                        )
                payload = encode_avi(jpegs, width=w, height=h, fps=fps)
                for fi, (t_ms, img) in enumerate(decode_frames(payload)):
                    rows.append(
                        {
                            "doc_id": i,
                            "frame_idx": fi,
                            "t_ms": int(t_ms),
                            "n_px": int(img.size),
                            "mean_px": round(float(img.mean()), 6),
                        }
                    )
            yield _pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "t_ms", "n_px", "mean_px"]
            )

    return d.mapInPandas(
        per_batch,
        schema="doc_id long, frame_idx int, t_ms int, n_px int, mean_px double",
    )


SQL_AVI_FRAMES_AUDIT = f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         CAST(doc_id AS BIGINT) % 3 + 2 AS nf,
         CAST(doc_id AS BIGINT) % 5 + 3 AS w,
         CAST(doc_id AS BIGINT) % 4 + 2 AS h,
         CAST(doc_id AS BIGINT) % 4 + 5 AS fps
  FROM documents WHERE doc_id < {_AVI_AUDIT_DOCS}
),
f AS (
  SELECT i, w, h, fps, unnest(range(0, nf)) AS fi FROM p
)
SELECT i AS doc_id,
       CAST(fi AS INT) AS frame_idx,
       CAST((fi * 1000) // fps AS INT) AS t_ms,
       CAST(w * h * 3 AS INT) AS n_px,
       CAST((i * 31 + fi * 57) % 256 AS DOUBLE) AS mean_px
FROM f
"""


_MP4_AUDIT_DOCS = 60


def q_mp4_frames_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode audit over the built-in MJPEG-MP4 path
    (functions/mp4.py + functions/jpeg.py): per doc, encode 2-4 flat frames
    (grayscale / equal-channel RGB at 4:4:4 / at 4:2:0, rotating by doc) as
    quality-100 baseline JPEGs, wrap them in a single-track ISO-BMFF/MP4
    container at a per-doc fps AND a per-doc chunk layout (1..3 samples per
    chunk, so the stsc/stco chunk map is exercised with ragged last chunks,
    not just the all-in-one-chunk shape), and decode back through the SAME
    seam ``sample_frames(codec='real')`` uses (multimodal.decode_frames).
    Flat q100 JPEG decodes exactly (see q_jpeg_decode_audit) and MP4
    timestamps are pure integer arithmetic (stts cumulative deltas over the
    mdhd timescale: fi * 1000 // fps), so the DuckDB oracle recomputes every
    output from the doc id alone.  Gates box-tree walking, tkhd/mdhd/hdlr
    parsing, stsd codec dispatch, the stts/stsc/stsz/stco sample map, MJPEG
    payload decode and timestamp assignment."""
    import pandas as _pd

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _MP4_AUDIT_DOCS)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )

    def per_batch(it):
        import numpy as _np

        from safedata_validator_spark.functions.jpeg import encode_jpeg
        from safedata_validator_spark.functions.mp4 import encode_mp4
        from safedata_validator_spark.functions.multimodal import decode_frames

        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                i = int(did)
                nf = i % 3 + 2
                w, h = i % 5 + 3, i % 4 + 2
                fps = i % 4 + 5
                layout = i % 3  # 0=gray, 1=RGB 4:4:4, 2=RGB 4:2:0
                jpegs = []
                for fi in range(nf):
                    v = (i * 43 + fi * 71) % 256
                    if layout == 0:
                        jpegs.append(encode_jpeg(_np.full((h, w), v, _np.uint8), quality=100))
                    else:
                        jpegs.append(
                            encode_jpeg(
                                _np.full((h, w, 3), v, _np.uint8),
                                quality=100,
                                subsample="444" if layout == 1 else "420",
                            )
                        )
                payload = encode_mp4(
                    jpegs, width=w, height=h, fps=fps, samples_per_chunk=i % 3 + 1
                )
                for fi, (t_ms, img) in enumerate(decode_frames(payload)):
                    rows.append(
                        {
                            "doc_id": i,
                            "frame_idx": fi,
                            "t_ms": int(t_ms),
                            "n_px": int(img.size),
                            "mean_px": round(float(img.mean()), 6),
                        }
                    )
            yield _pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "t_ms", "n_px", "mean_px"]
            )

    return d.mapInPandas(
        per_batch,
        schema="doc_id long, frame_idx int, t_ms int, n_px int, mean_px double",
    )


SQL_MP4_FRAMES_AUDIT = f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         CAST(doc_id AS BIGINT) % 3 + 2 AS nf,
         CAST(doc_id AS BIGINT) % 5 + 3 AS w,
         CAST(doc_id AS BIGINT) % 4 + 2 AS h,
         CAST(doc_id AS BIGINT) % 4 + 5 AS fps
  FROM documents WHERE doc_id < {_MP4_AUDIT_DOCS}
),
f AS (
  SELECT i, w, h, fps, unnest(range(0, nf)) AS fi FROM p
)
SELECT i AS doc_id,
       CAST(fi AS INT) AS frame_idx,
       CAST((fi * 1000) // fps AS INT) AS t_ms,
       CAST(w * h * 3 AS INT) AS n_px,
       CAST((i * 43 + fi * 71) % 256 AS DOUBLE) AS mean_px
FROM f
"""


def q_video_frames_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG-AVI + MJPEG-MP4 container decode audits folded into ONE catalog
    gate with a ``container`` discriminator column (driver caps the
    correctness sweep at 50 catalog entries — VERDICT r04 §next 3). Each
    branch is exactly the standalone audit: see q_avi_frames_audit /
    q_mp4_frames_audit for what it gates."""
    avi = q_avi_frames_audit(spark, sf_dir).select(F.lit("avi").alias("container"), "*")
    mp4 = q_mp4_frames_audit(spark, sf_dir).select(F.lit("mp4").alias("container"), "*")
    return avi.unionByName(mp4)


SQL_VIDEO_FRAMES_AUDIT = f"""
SELECT 'avi' AS container, * FROM ({SQL_AVI_FRAMES_AUDIT})
UNION ALL
SELECT 'mp4' AS container, * FROM ({SQL_MP4_FRAMES_AUDIT})
"""


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbours — the second ANN scale path beside
    LSH (coarse k-means quantizer + inverted-list probing).

    No scan spread here (and in ann_recall): the Lloyd centroid update
    sums doubles in partition order, so a repartitioned scan could move
    centroids by an ulp and flip a boundary assignment against the pinned
    golden oracle — the same order-sensitivity exemption as lm_quality."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % TOPK_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.ivf_topk(e, queries, k=TOPK_K, n_centroids=16, nprobe=4)
    return out.select("query_id", "vec_id", F.round("sim", 4).alias("sim"), "rank")


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both ANN top-k scale paths (sign-LSH, IVF) folded into ONE catalog
    gate with a ``backend`` discriminator column (driver caps the
    correctness sweep at 50 catalog entries — VERDICT r04 §next 3). Each
    branch is exactly the standalone query; the pinned golden VALUES oracle
    (tools/gen_golden_oracles.py) carries both backends."""
    lsh = q_lsh_ann_topk(spark, sf_dir).select(F.lit("lsh").alias("backend"), "*")
    ivf = q_ivf_ann_topk(spark, sf_dir).select(F.lit("ivf").alias("backend"), "*")
    return lsh.unionByName(ivf)


# --------------------------------------------------------------------------
# 26b. ANN recall@k robustness gate: LSH and IVF top-k measured against the
#      exact brute-force top-k (itself SQL-oracled in embedding_topk) with a
#      pinned recall floor. Unlike the pinned VALUES oracles, this gate
#      SURVIVES an nbits/nprobe/n_centroids default change — recall is
#      recomputed live; only the floor is pinned (VERDICT r02 §next 3).
# --------------------------------------------------------------------------

#: gate-pinned index parameters and avg-recall floors. The embeddings test
#: table is near-random (little cluster structure), so recall is governed by
#: the probed fraction of the corpus; the parameters below measure avg
#: recall 0.82 (lsh) / 0.92 (ivf) at sf0.01 — floors leave ≥0.2 honest
#: margin while a broken index (empty/arbitrary candidates) scores ≈ k/N
#: = 0.01 and a lost probe ring scores < 0.5.
ANN_RECALL_GATES = {
    "lsh": ({"nbits": 4, "probe_hamming": 2, "dim": EMB_DIM}, 0.6),
    "ivf": ({"n_centroids": 8, "nprobe": 6}, 0.7),
}


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % TOPK_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(e, queries, k=TOPK_K).select("query_id", "vec_id")
    parts = []
    for method in sorted(ANN_RECALL_GATES):
        params, floor = ANN_RECALL_GATES[method]
        fn = sim.lsh_topk if method == "lsh" else sim.ivf_topk
        approx = fn(e, queries, k=TOPK_K, **params)
        hits = (
            approx.select("query_id", "vec_id")
            .join(exact, ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        # left join from ALL queries: a query the index found nothing for
        # must count as recall 0, not silently drop out of the average
        per = queries.select("query_id").join(hits, "query_id", "left").select(
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(TOPK_K)).alias("recall")
        )
        parts.append(
            per.agg(
                F.count(F.lit(1)).alias("n_queries"),
                (F.avg("recall") >= floor).alias("recall_ok"),
            ).select(F.lit(method).alias("method"), "n_queries", "recall_ok")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("method")


SQL_ANN_RECALL = f"""
SELECT method, n_queries, true AS recall_ok FROM (
  SELECT 'ivf' AS method, count(*) AS n_queries
  FROM embeddings WHERE vec_id % {TOPK_QUERY_MOD} = 0
  UNION ALL
  SELECT 'lsh', count(*) FROM embeddings WHERE vec_id % {TOPK_QUERY_MOD} = 0
) ORDER BY method
"""


# --------------------------------------------------------------------------
# 27. Stateful streaming sequence gate (§2.9): the applyInPandasWithState
#     cross-batch checker run on two REAL micro-batches, gated against the
#     batch-SQL computation of the same semantics — streaming answers must
#     equal the batch answers when micro-batch order respects turn order
#     (reference field.py:722-746 current_row carried between chunks).
# --------------------------------------------------------------------------

#: role grammar for the stream gate (deterministic map of event_type)
STREAM_TRANSITIONS = [
    ["user", "assistant"],
    ["assistant", "user"],
    ["assistant", "tool"],
    ["tool", "assistant"],
]


def _stream_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcript-shaped derivation of the events table:
    conv_id = user_id; turn_idx = per-conv rank plus a CUMULATIVE shift at
    planted gap rows (event_id % 17 — keeps turn_idx strictly increasing and
    UNIQUE per conv, so the stateful checker's stable sort has no tie-order
    nondeterminism); ts regresses one hour at event_id % 23 rows; role maps
    event_type onto the user/assistant/tool grammar."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    role = (
        F.when(F.col("event_type").isin("click", "signup"), "user")
        .when(F.col("event_type").isin("view", "purchase"), "assistant")
        .otherwise("tool")
    )
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (
            F.row_number().over(w)
            + F.sum(F.when(F.col("event_id") % 17 == 0, 1).otherwise(0)).over(cum)
        ).cast("long").alias("turn_idx"),
        role.alias("role"),
        F.when(
            F.col("event_id") % 23 == 0, F.col("ts") - F.expr("INTERVAL 1 HOUR")
        ).otherwise(F.col("ts")).alias("ts"),
        F.row_number().over(w).alias("__seq"),
    )


def q_stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER by necessity: real two-micro-batch streaming run of the
    first-seen-wins exact dedup (streaming.dedup_stream.stream_exact_dedup).
    Batch 0 = even doc_ids, batch 1 = odd — a duplicate whose even twin
    arrived in batch 0 must be flagged in batch 1 via carried state. The
    oracle replays the same decision in SQL: keeper = min (batch, doc_id)
    per normalized content."""
    import glob
    import hashlib
    import os
    import shutil

    from safedata_validator_spark.streaming.dedup_stream import stream_exact_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:8]
    root = f"/tmp/sdv_stream_dedup_gate_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/src"
    os.makedirs(src)
    now = None
    for i, part in enumerate(
        (docs.where(F.col("doc_id") % 2 == 0), docs.where(F.col("doc_id") % 2 == 1))
    ):
        stage = f"{root}/stage{i}"
        part.coalesce(1).write.parquet(stage)
        (pf,) = glob.glob(f"{stage}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.copyfile(pf, dst)
        if now is None:
            now = os.path.getmtime(dst)
        os.utime(dst, (now - 120 + 60 * i, now - 120 + 60 * i))

    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = stream_exact_dedup(stream, "doc_id", "text")
    qname = "sdv_stream_dedup_gate"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", f"{root}/ck")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(qname).collect()
    res = spark.createDataFrame(rows, out.schema)
    return res.select(F.col("id").alias("doc_id"), "is_dup", "keep_id")


SQL_STREAM_DEDUP_EVENTS = r"""
WITH normed AS (
  SELECT doc_id, doc_id % 2 AS b,
         trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM documents
), keepers AS (
  SELECT norm, doc_id AS keep_id FROM (
    SELECT norm, doc_id,
           row_number() OVER (PARTITION BY norm ORDER BY b, doc_id) AS rn
    FROM normed
  ) WHERE rn = 1
)
SELECT n.doc_id, (n.doc_id <> k.keep_id) AS is_dup, k.keep_id
FROM normed n JOIN keepers k USING (norm)
"""


#: streaming drift gate: histogram domain over events.value and the batch
#: split timestamp (events span 2024-01; batch 0 = first half of the month)
DRIFT_STREAM_LO, DRIFT_STREAM_HI, DRIFT_STREAM_BINS = 0.0, 200.0, 8
DRIFT_STREAM_SPLIT = "2024-01-16 00:00:00"


def q_stream_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER by necessity: real two-micro-batch streaming run of the
    windowed-histogram drift monitor (streaming.drift_stream) — day windows
    over events.ts, watermark delay 0, append mode. Batch 0 = the first
    half of the month, batch 1 = the rest, so the split-day window's
    histogram state must carry across the micro-batch boundary and every
    closed window must emit exactly once (window.end <= final watermark =
    max ts). The emitted histograms are then scored against the full-table
    baseline histogram with the SAME batch code path (PSI + KS via
    engine.drift.compare_histograms). The oracle replays everything in
    SQL, including the append-mode emission rule: only windows whose end
    <= max(ts) appear."""
    import glob
    import hashlib
    import os
    import shutil

    from safedata_validator_spark.engine.drift import histogram
    from safedata_validator_spark.streaming.drift_stream import (
        score_drift_windows,
        windowed_histogram,
    )

    ev = _t(spark, sf_dir, "events").select("ts", "value")
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:8]
    root = f"/tmp/sdv_stream_drift_gate_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/src"
    os.makedirs(src)
    split = F.lit(DRIFT_STREAM_SPLIT).cast("timestamp")
    now = None
    for i, part in enumerate(
        (ev.where(F.col("ts") < split), ev.where(F.col("ts") >= split))
    ):
        stage = f"{root}/stage{i}"
        part.coalesce(1).write.parquet(stage)
        (pf,) = glob.glob(f"{stage}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.copyfile(pf, dst)
        if now is None:
            now = os.path.getmtime(dst)
        os.utime(dst, (now - 120 + 60 * i, now - 120 + 60 * i))

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    hist = windowed_histogram(
        stream,
        "value",
        DRIFT_STREAM_LO,
        DRIFT_STREAM_HI,
        DRIFT_STREAM_BINS,
        ts_col="ts",
        window_dur="1 day",
        delay="0 seconds",
    )
    qname = "sdv_stream_drift_gate"
    q = (
        hist.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", f"{root}/ck")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(qname).collect()
    hist_df = spark.createDataFrame(rows, hist.schema)
    base = histogram(
        ev, "value", DRIFT_STREAM_LO, DRIFT_STREAM_HI, DRIFT_STREAM_BINS
    ).select("bucket", "n")
    out = score_drift_windows(hist_df, base)
    return out.select(
        "win_start",
        F.round("psi", 6).alias("psi"),
        F.round("ks", 6).alias("ks"),
    ).orderBy("win_start")


_DRIFT_STREAM_W = (DRIFT_STREAM_HI - DRIFT_STREAM_LO) / DRIFT_STREAM_BINS

SQL_STREAM_DRIFT_EVENTS = f"""
WITH src AS (
  SELECT ts,
         CASE WHEN value < {DRIFT_STREAM_LO} THEN 0
              WHEN value >= {DRIFT_STREAM_HI} THEN {DRIFT_STREAM_BINS + 1}
              ELSE 1 + CAST(floor((value - {DRIFT_STREAM_LO}) / {_DRIFT_STREAM_W}) AS INT)
         END AS bucket
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
-- append-mode emission: a day window is in the output iff its end passed
-- the final watermark (= max event time at delay 0)
hist AS (
  SELECT date_trunc('day', ts) AS ws, bucket, count(*) AS n
  FROM src
  WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT max(ts) FROM events)
  GROUP BY 1, 2
),
base AS (SELECT bucket, count(*) AS n FROM src GROUP BY 1),
grid AS (
  SELECT ws, bucket
  FROM (SELECT DISTINCT ws FROM hist)
  CROSS JOIN (SELECT bucket FROM base UNION SELECT bucket FROM hist)
),
pr AS (
  SELECT g.ws, g.bucket,
         COALESCE(h.n, 0) / CAST((SELECT sum(n) FROM hist h2 WHERE h2.ws = g.ws) AS DOUBLE) AS p,
         COALESCE(b.n, 0) / CAST((SELECT sum(n) FROM base) AS DOUBLE) AS q
  FROM grid g
  LEFT JOIN hist h ON h.ws = g.ws AND h.bucket = g.bucket
  LEFT JOIN base b ON b.bucket = g.bucket
),
c AS (
  SELECT ws, p, q,
         sum(p) OVER (PARTITION BY ws ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         sum(q) OVER (PARTITION BY ws ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cq
  FROM pr
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
       round(sum((p - q) * ln((p + 1e-6) / (q + 1e-6))), 6) AS psi,
       round(max(abs(cp - cq)), 6) AS ks
FROM c GROUP BY ws ORDER BY win_start
"""


def q_stream_sequence_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER by necessity: runs an actual two-micro-batch streaming query
    (file source, maxFilesPerTrigger=1, fresh checkpoint) and returns the
    emitted violations. Batch 1 = first 5 turns of every conversation,
    batch 2 = the rest — state (last idx/ts/role) must carry across the
    boundary for the result to equal the batch-SQL oracle."""
    import glob
    import hashlib
    import os
    import shutil

    from safedata_validator_spark.streaming.validate_stream import (
        stateful_sequence_violations,
    )

    turns = _stream_turns(spark, sf_dir)
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:8]
    root = f"/tmp/sdv_stream_gate_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/src"
    os.makedirs(src)
    now = None
    for i, part in enumerate(
        (turns.where(F.col("__seq") <= 5), turns.where(F.col("__seq") > 5))
    ):
        stage = f"{root}/stage{i}"
        part.drop("__seq").coalesce(1).write.parquet(stage)
        (pf,) = glob.glob(f"{stage}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.copyfile(pf, dst)
        # the file source processes oldest-mtime first: pin batch order
        # explicitly rather than trusting copy timestamps
        if now is None:
            now = os.path.getmtime(dst)
        os.utime(dst, (now - 120 + 60 * i, now - 120 + 60 * i))

    schema = turns.drop("__seq").schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = stateful_sequence_violations(
        stream, transitions=STREAM_TRANSITIONS, allowed_start=["user"]
    )
    qname = "sdv_stream_sequence_gate"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", f"{root}/ck")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(qname).collect()
    res = spark.createDataFrame(rows, out.schema)
    return res.orderBy("conv_id", "turn_idx", "rule_id", "message")


SQL_STREAM_SEQUENCE_EVENTS = """
WITH base AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         row_number() OVER w AS seq,
         sum(CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shift,
         CASE WHEN event_type IN ('click','signup') THEN 'user'
              WHEN event_type IN ('view','purchase') THEN 'assistant'
              ELSE 'tool' END AS role,
         CASE WHEN event_id % 23 = 0 THEN ts - INTERVAL 1 HOUR ELSE ts END AS ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), turns AS (
  SELECT conv_id, CAST(seq + shift AS BIGINT) AS turn_idx, role, ts FROM base
), lagged AS (
  SELECT conv_id, turn_idx, role, ts,
         lag(turn_idx) OVER w2 AS prev_idx,
         lag(role) OVER w2 AS prev_role,
         lag(ts) OVER w2 AS prev_ts
  FROM turns
  WINDOW w2 AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT * FROM (
  SELECT conv_id, turn_idx, 'stream.sequential' AS rule_id,
         CAST(turn_idx AS VARCHAR) AS value,
         'expected ' || (COALESCE(prev_idx, 0) + 1) || ' got ' || turn_idx AS message
  FROM lagged WHERE turn_idx != COALESCE(prev_idx, 0) + 1
  UNION ALL
  SELECT conv_id, turn_idx, 'stream.monotone',
         -- pandas renders timestamps with full 6-digit microseconds (or none
         -- when zero); DuckDB's CAST trims trailing zeros — format explicitly
         CASE WHEN strftime(ts, '%f') = '000000'
              THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
              ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END,
         'event time decreased'
  FROM lagged WHERE prev_ts IS NOT NULL AND ts < prev_ts
  UNION ALL
  SELECT conv_id, turn_idx, 'stream.grammar', role,
         'forbidden transition ' || COALESCE(prev_role, '') || '→' || role
  FROM lagged
  WHERE (prev_role IS NULL AND role != 'user')
     OR (prev_role IS NOT NULL AND NOT (
           (prev_role = 'user' AND role = 'assistant') OR
           (prev_role = 'assistant' AND role IN ('user','tool')) OR
           (prev_role = 'tool' AND role = 'assistant')))
)
ORDER BY conv_id, turn_idx, rule_id, message
"""


def q_transcript_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship engine run: full rule set over the synthetic bad transcript
    table (deterministic, independent of sf_dir scale), including the
    manifest-declared-vs-computed temporal extent congruence rule
    (reference final_checks, field.py:283-318)."""
    from safedata_validator_spark.data.synth import dims, transcripts_bad
    from safedata_validator_spark.engine.validator import ValidationEngine
    from safedata_validator_spark.rules.presets import SOFT_TS_BOUNDS, transcript_ruleset

    res = ValidationEngine().validate(
        transcripts_bad(spark),
        transcript_ruleset(declared_ts_extent=SOFT_TS_BOUNDS),
        dims(spark),
        with_stats=False,
    )
    return res.verdicts.select("scope", "rule_id", "severity", "n_rows", "n_failed", "passed")


#: Golden verdict table for the flagship run — the engine analogue of the
#: reference's exact-error-count corpus (test/test_dataset.py:11-24:
#: good=0 / bad=94). Deterministic because the synthetic generator is
#: hash-seeded; any engine or generator change that shifts a count fails the
#: gate loudly.
SQL_TRANSCRIPT_VERDICTS = """
SELECT * FROM (VALUES
  ('all', 'conv_id.not_blank', 'ERROR', CAST(3401 AS BIGINT), CAST(0 AS BIGINT), true),
  ('all', 'key.unique', 'ERROR', 3401, 1, false),
  ('all', 'role.grammar', 'ERROR', 3401, 7, false),
  ('all', 'role.in_levels', 'ERROR', 3401, 2, false),
  ('all', 'role.levels_audit', 'ERROR', 3401, 2, false),
  ('all', 'role.not_padded', 'ERROR', 3401, 1, false),
  ('all', 'row.not_all_blank', 'ERROR', 3401, 0, true),
  ('all', 'text.no_excel_error', 'ERROR', 3401, 1, false),
  ('all', 'text.not_blank', 'ERROR', 3401, 2, false),
  ('all', 'text.not_na', 'WARNING', 3401, 1, true),
  ('all', 'tool.ref_integrity', 'ERROR', 3401, 1, false),
  ('all', 'tool.ref_integrity.alias', 'WARNING', 3401, 1, true),
  ('all', 'tool.requires_tool_role', 'ERROR', 3401, 0, true),
  ('all', 'ts.extent_congruence', 'ERROR', 3401, 1, false),
  ('all', 'ts.extent_hard', 'ERROR', 3401, 1, false),
  ('all', 'ts.extent_soft', 'WARNING', 3401, 1, true),
  ('all', 'ts.monotone', 'ERROR', 3401, 1, false),
  ('all', 'turn_idx.positive', 'ERROR', 3401, 0, true),
  ('all', 'turn_idx.sequential', 'ERROR', 3401, 2, false)
) AS t(scope, rule_id, severity, n_rows, n_failed, passed)
"""


QUERIES = {
    "profile_lineitem": q_profile_lineitem,
    "unique_key_orders": q_unique_key_orders,
    "sequential_lineitem": q_sequential_lineitem,
    "ref_integrity_events": q_ref_integrity_events,
    "monotone_events": q_monotone_events,
    "grammar_events": q_grammar_events,
    "levels_audit_events": q_levels_audit_events,
    "extent_orders": q_extent_orders,
    "drift_psi_lineitem": q_drift_psi_lineitem,
    "topk_parts_per_brand": q_topk_parts_per_brand,
    "dedup_exact_docs": q_dedup_exact_docs,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "text_stats_by_lang": q_text_stats_by_lang,
    "lang_id_docs": q_lang_id_docs,
    "embedding_topk": q_embedding_topk,
    "hierarchy_closure": q_hierarchy_closure,
    "name_resolution_events": q_name_resolution_events,
    "hierarchy_congruence_events": q_hierarchy_congruence_events,
    "media_features": q_media_features,
    # round-5 training-hygiene ops (cross-doc span dedup, surgical
    # decontamination, LM quality) — full live DuckDB oracles
    "span_dedup_docs": q_span_dedup_docs,
    "decon_spans_docs": q_decon_spans_docs,
    "lm_quality_docs": q_lm_quality_docs,
    "quality_docs": q_quality_docs,
    "wkt_geo_audit": q_wkt_geo_audit,
    "ogc_validity_audit": q_ogc_validity_audit,
    "image_decode_audit": q_image_decode_audit,
    "audio_features_audit": q_audio_features_audit,
    "gif_frames_audit": q_gif_frames_audit,
    "video_frames_audit": q_video_frames_audit,
    "curate_corpus": q_curate_corpus,
    "decontaminate_docs": q_decontaminate_docs,
    "pii_audit_docs": q_pii_audit_docs,
    "corpus_split_docs": q_corpus_split_docs,
    "dedup_clusters_docs": q_dedup_clusters_docs,
    "repetition_docs": q_repetition_docs,
    "mixture_resample_docs": q_mixture_resample_docs,
    "pack_sequences_docs": q_pack_sequences_docs,
    "curate_corpus_cluster": q_curate_corpus_cluster,
    "url_audit_docs": q_url_audit_docs,
    # value-gated against a hard-coded golden VALUES table (deterministic run)
    "transcript_verdicts": q_transcript_verdicts,
    # stateful streaming == batch SQL (two real micro-batches, carried state)
    "stream_dedup_events": q_stream_dedup_events,
    "stream_sequence_events": q_stream_sequence_events,
    "stream_drift_events": q_stream_drift_events,
    # live recall vs the exact top-k; only the floor is pinned
    "ann_recall": q_ann_recall,
    # pinned golden VALUES oracle (independent purepy_ref BPE)
    "token_count_docs": q_token_count_docs,
    # rows-only (non-SQL-expressible: hash-seeded signatures / engine-native)
    "minhash_lsh_docs": q_minhash_lsh_docs,
    "simhash_docs": q_simhash_docs,
    "embedding_near_dup": q_embedding_near_dup,
    "ann_topk": q_ann_topk,
    "winnow_overlap_docs": q_winnow_overlap_docs,
}

#: standalone per-backend / per-format callables kept OUT of the driver
#: catalog (capped at 50 entries) but addressable by bench.py, whose
#: headline composition must stay comparable round-over-round
BENCH_QUERIES = {
    **QUERIES,
    # relational extras displaced from the 50-entry driver catalog by the
    # round-5 hygiene gates; bench.py's HEADLINE composition still times
    # pricing_summary / top_revenue_orders round-over-round
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "sessionize_events": q_sessionize_events,
    "lsh_ann_topk": q_lsh_ann_topk,
    "ivf_ann_topk": q_ivf_ann_topk,
    "png_decode_audit": q_png_decode_audit,
    "jpeg_decode_audit": q_jpeg_decode_audit,
    "avi_frames_audit": q_avi_frames_audit,
    "mp4_frames_audit": q_mp4_frames_audit,
    # chars-only packing under the r2-r4 name so the timed curation-suite
    # composition stays comparable (the catalog entry now adds a BPE branch)
    "pack_sequences_docs": q_pack_sequences_chars_docs,
}

ORACLES = {
    "wkt_geo_audit": SQL_WKT_GEO_AUDIT,
    "ogc_validity_audit": SQL_OGC_VALIDITY_AUDIT,
    "image_decode_audit": SQL_IMAGE_DECODE_AUDIT,
    "audio_features_audit": SQL_AUDIO_FEATURES_AUDIT,
    "gif_frames_audit": SQL_GIF_FRAMES_AUDIT,
    "video_frames_audit": SQL_VIDEO_FRAMES_AUDIT,
    "curate_corpus": SQL_CURATE_CORPUS,
    "decontaminate_docs": SQL_DECONTAMINATE_DOCS,
    "pii_audit_docs": SQL_PII_AUDIT_DOCS,
    "corpus_split_docs": SQL_CORPUS_SPLIT_DOCS,
    "dedup_clusters_docs": SQL_DEDUP_CLUSTERS_DOCS,
    "repetition_docs": SQL_REPETITION_DOCS,
    "mixture_resample_docs": SQL_MIXTURE_RESAMPLE_DOCS,
    # pack_sequences_docs: composed golden oracle (live DuckDB packing SQL
    # over pinned per-doc BPE token counts) — merged in via GOLDEN_ORACLES
    "curate_corpus_cluster": SQL_CURATE_CORPUS_CLUSTER,
    "url_audit_docs": SQL_URL_AUDIT_DOCS,
    "profile_lineitem": SQL_PROFILE_LINEITEM,
    "unique_key_orders": SQL_UNIQUE_KEY_ORDERS,
    "sequential_lineitem": SQL_SEQUENTIAL_LINEITEM,
    "ref_integrity_events": SQL_REF_INTEGRITY_EVENTS,
    "monotone_events": SQL_MONOTONE_EVENTS,
    "grammar_events": SQL_GRAMMAR_EVENTS,
    "levels_audit_events": SQL_LEVELS_AUDIT_EVENTS,
    "extent_orders": SQL_EXTENT_ORDERS,
    "drift_psi_lineitem": SQL_DRIFT_PSI_LINEITEM,
    "span_dedup_docs": SQL_SPAN_DEDUP_DOCS,
    "decon_spans_docs": SQL_DECON_SPANS_DOCS,
    "lm_quality_docs": SQL_LM_QUALITY_DOCS,
    "topk_parts_per_brand": SQL_TOPK_PARTS_PER_BRAND,
    "dedup_exact_docs": SQL_DEDUP_EXACT_DOCS,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "text_stats_by_lang": SQL_TEXT_STATS_BY_LANG,
    "lang_id_docs": SQL_LANG_ID_DOCS,
    "embedding_topk": SQL_EMBEDDING_TOPK,
    "hierarchy_closure": SQL_HIERARCHY_CLOSURE,
    "name_resolution_events": SQL_NAME_RESOLUTION_EVENTS,
    "hierarchy_congruence_events": SQL_HIERARCHY_CONGRUENCE_EVENTS,
    "transcript_verdicts": SQL_TRANSCRIPT_VERDICTS,
    "stream_sequence_events": SQL_STREAM_SEQUENCE_EVENTS,
    "stream_dedup_events": SQL_STREAM_DEDUP_EVENTS,
    "stream_drift_events": SQL_STREAM_DRIFT_EVENTS,
    "ann_recall": SQL_ANN_RECALL,
    "media_features": SQL_MEDIA_FEATURES,
    "quality_docs": SQL_QUALITY_DOCS,
    "minhash_lsh_docs": SQL_MINHASH_LSH_DOCS,
    # pinned golden VALUES oracles (independent purepy_ref implementation,
    # generated by tools/gen_golden_oracles.py, valid at the driver's sf0.01)
    **GOLDEN_ORACLES,
}
