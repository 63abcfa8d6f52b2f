"""End-to-end training-corpus curation — the composition the individual
dedup / similarity / text operators exist for: exact dedup → near-dup
removal → language whitelist → quality floor, one declarative DataFrame
pipeline.

Scale shape: exact dedup is a map-side-combined min-id aggregation plus a
unique-key semi-join (no task ever holds a whole duplicate group, however
large); near-dup pair finding defaults to
the exact shingle join (SQL-oracle-checkable) and swaps to MinHash-LSH
(``method='minhash'``) at corpus scale, where the all-pairs shingle join
is replaced by banded candidate generation + exact verification; the
language and quality stages are pure Column expressions fused into the
surviving rows' projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_validator_spark.functions import dedup as dd
from safedata_validator_spark.functions import text as tx


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.5,
    n: int = 3,
    method: str = "exact",
    near_dup_mode: str = "pairs",
    remove_dup_spans: int | None = None,
    lm_band: tuple[float, float] | None = None,
) -> DataFrame:
    """Curate a document corpus for training:

    1. exact dedup on normalized text — the lowest id of each group survives;
    1b. (``remove_dup_spans=k``) cross-document exact-substring span
       removal over the exact survivors (``spans.remove_duplicated_spans``
       with window length k): shared boilerplate/licence runs are stripped
       IN PLACE before similarity, language and quality are judged, so a
       doc that is mostly boilerplate plus a unique tail keeps the tail
       (dropping the whole doc is near-dup removal's job, not this
       stage's). Off by default — span removal changes text, so the
       default composition stays byte-identical to the SQL oracle;
    2. near-dup removal over the survivors: pairs with n-gram Jaccard ≥
       ``near_dup_threshold`` (``method``: 'exact' shingle join, or 'minhash'
       for banded MinHash-LSH candidates + exact verification). Removal
       semantics via ``near_dup_mode``: 'pairs' drops the higher id of every
       pair (two docs survive iff no detector pair links them — keeps
       members of a transitive cluster that are not directly similar);
       'cluster' closes the pairs into connected components and keeps ONE
       doc per component (the minimum id — the SlimPajama/Dolma-style
       one-per-cluster rule). Both deterministic and order-free;
    3. language whitelist (``lang_id``);
    4. quality floor (``quality_score``);
    5. (``lm_band=(lo_q, hi_q)``) CCNet-style perplexity band over the
       stage-4 survivors (``lm_quality.perplexity_band``, self-scored):
       docs outside the [lo_q, hi_q] corpus perplexity quantiles are
       dropped; docs too short to have bigrams (NULL band) are KEPT —
       the length floor is stage 4's job. Off by default, keeping the
       default composition byte-identical to the SQL oracle.

    → (id, lang, quality, ws_tokens) for surviving documents.
    """
    # exact-dup groups keyed by the 64-bit fingerprint of the normalized
    # text, not the normalized string itself — the dedup window then
    # shuffles 8-byte keys instead of carrying a full second copy of every
    # document through the exchange (collision odds 2^-64 per pair, the
    # standard exact-dedup trade at corpus scale)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        tx.fingerprint64(F.col(text_col)).alias("__fp"),
    )
    # min-id-per-fingerprint via groupBy + composite-key semi-join, NOT a
    # Window.partitionBy("__fp"): a window puts every copy of a duplicate
    # group in ONE task (a viral boilerplate page duplicated millions of
    # times = one unbounded straggler), while the aggregation gets map-side
    # combine (shuffle volume = distinct fingerprints x 16 bytes) and the
    # semi-join's (fp, id) key is unique per row, so hot fingerprints
    # spread across the cluster no matter how large the group.
    keepers = base.groupBy("__fp").agg(F.min("id").alias("id"))
    # exact_kept feeds BOTH the pair-finding stage and the survivor
    # anti-join — persist so the source scan + fingerprint + semi-join runs
    # once, not once per consumer (released via the cache hand-off below)
    exact_kept = (
        base.join(keepers, ["__fp", "id"], "left_semi")
        .select("id", "text")
        .persist()
    )

    span_caches: tuple = ()
    if remove_dup_spans:
        from safedata_validator_spark.functions import spans as sp

        cleaned = sp.remove_duplicated_spans(
            exact_kept, "id", "text", n=remove_dup_spans
        )
        span_caches = tuple(getattr(cleaned, "_sdv_cached", ())) + (exact_kept,)
        # the cleaned text feeds pair-finding AND the survivor anti-join,
        # same double-consumer shape as exact_kept itself
        exact_kept = (
            cleaned.select("id", F.col("text_clean").alias("text")).persist()
        )

    if method == "minhash":
        pairs = dd.minhash_lsh_dedup(
            exact_kept, "id", "text", n=n, threshold=near_dup_threshold
        )
    else:
        pairs = dd.ngram_jaccard_pairs(
            exact_kept, "id", "text", n=n, threshold=near_dup_threshold
        )
    cc_caches: tuple = ()
    if near_dup_mode == "cluster":
        # one survivor per transitively-connected duplicate cluster: the
        # star-contraction output maps every member to its component min,
        # so the drop list is every non-root member
        cc = dd.connected_components(pairs)
        cc_caches = tuple(getattr(cc, "_sdv_cached", ()))
        drop = cc.where(F.col("id") != F.col("component")).select("id").distinct()
    else:
        drop = pairs.select(F.col("id_b").alias("id")).distinct()
    # explicit broadcast: the drop list is bounded by the near-dup pair
    # count (tiny next to the corpus), and AQE cannot replan the cached
    # exact_kept probe side (no exchange = no stage boundary), so without
    # the hint this anti-join shuffles every surviving document's text
    survivors = exact_kept.join(F.broadcast(drop), "id", "left_anti")

    enriched = survivors.select(
        "id",
        tx.lang_id(F.col("text")).alias("lang"),
        F.round(tx.quality_score(F.col("text")), 6).alias("quality"),
        tx.ws_token_count(F.col("text")).alias("ws_tokens"),
    )
    # persist the (text-free, four-column) enrichment before filtering:
    # Catalyst pushes the lang/quality predicate through the projection by
    # SUBSTITUTING the full expression trees into a Filter, which gets no
    # subexpression elimination — every marker regex then re-evaluates per
    # reference (measured: 6s → 49s per 1M docs). Filtering the cached
    # columns evaluates each expression exactly once.
    enriched = enriched.persist()
    out = enriched.where(
        F.col("lang").isin(list(langs)) & (F.col("quality") >= min_quality)
    )

    lm_caches: tuple = ()
    if lm_band is not None:
        from safedata_validator_spark.functions import lm_quality as lq

        lo_q, hi_q = lm_band
        # band over the stage-4 survivors' TEXT (rejoin the cached
        # exact_kept spine by id — `out` is the text-free enrichment)
        banded = lq.perplexity_band(
            exact_kept.join(out.select("id"), "id", "left_semi"),
            "id",
            "text",
            lo_quantile=lo_q,
            hi_quantile=hi_q,
        )
        lm_caches = tuple(getattr(banded, "_sdv_cached", ()))
        keep = banded.where(
            F.col("band").isNull() | (F.col("band") == "keep")
        ).select("id")
        # NO broadcast here: unlike the near-dup drop list (bounded by
        # pair count), the keep list is O(surviving corpus) — a plain
        # semi-join shuffles 8-byte ids on both sides instead of shipping
        # the whole id set to every executor
        out = out.join(keep, "id", "left_semi")

    # the pair-finding stage persisted its shingle extraction; hand that
    # cache plus our own exact_kept up so the caller can dd.release(out)
    # after materializing
    return dd._hand_off_cache(
        out,
        tuple(getattr(pairs, "_sdv_cached", ()))
        + cc_caches
        + span_caches
        + lm_caches
        + (exact_kept, enriched),
    )
