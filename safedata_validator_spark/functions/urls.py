"""URL extraction and domain-blocklist filtering for corpus curation.

The C4/RefinedWeb-style URL hygiene pass: extract URLs from document text,
normalize each to its registrable host, count per-document link density,
and drop documents whose host matches a blocklist (exact host or any
parent domain — ``ads.example.com`` is blocked by ``example.com``).

All JVM-side Column expressions (regexp_extract_all + string ops in
whole-stage codegen); the blocklist check is a BROADCAST semi-join against
the exploded per-doc host set, so the corpus is never shuffled. The URL
regex restricts itself to syntax Java regex and RE2 interpret identically,
keeping every operator exactly oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: http(s) URL matcher — scheme, host, optional port/path. Host labels end
#: in an alphanumeric/hyphen run, so a sentence-final '.' after a bare host
#: is NOT consumed (a trailing-punctuation path suffix is, as usual).
URL_PATTERN = r"https?://[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*(?::\d+)?(?:/[^\s]*)?"

#: host extractor applied to ONE already-extracted URL
_HOST_PATTERN = r"https?://([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*)"


def extract_urls(col: Column) -> Column:
    """Array of URLs found in a text column (order of appearance). Group 0
    = the whole match (the pattern has only non-capturing groups)."""
    return F.regexp_extract_all(
        F.coalesce(col, F.lit("")), F.lit(URL_PATTERN), F.lit(0)
    )


def url_hosts(col: Column) -> Column:
    """Distinct lowercased hosts of every URL in a text column."""
    return F.array_distinct(
        F.transform(
            extract_urls(col),
            lambda u: F.lower(F.regexp_extract(u, _HOST_PATTERN, 1)),
        )
    )


def host_suffixes(host: Column) -> Column:
    """All dot-suffix domains of a host, most-specific first:
    'a.b.example.com' → [a.b.example.com, b.example.com, example.com, com].
    Pure array arithmetic — the blocklist join then matches a host against
    ANY parent domain without a per-blocklist-row scan."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def url_audit(
    df: DataFrame, id_col: str, text_col: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document URL profile → (id, [keep...], n_urls, n_hosts, hosts
    CSV-sorted). Row-local; zero shuffles."""
    text = F.col(text_col)
    hosts = url_hosts(text)
    return df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep],
        F.size(extract_urls(text)).cast("int").alias("n_urls"),
        F.size(hosts).cast("int").alias("n_hosts"),
        F.array_join(F.array_sort(hosts), ",").alias("hosts"),
    )


def filter_blocked_domains(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: DataFrame,
    domain_col: str = "domain",
) -> DataFrame:
    """Drop documents containing a URL whose host is (a subdomain of) any
    blocklisted domain → the surviving rows of ``df``.

    Shape: explode each doc's distinct hosts into their dot-suffixes
    (bounded by hosts × label-depth per doc), broadcast the blocklist,
    semi-join to find offending doc ids, anti-join the corpus against that
    (tiny) id list — the full corpus is never shuffled."""
    suffixes = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(url_hosts(F.col(text_col))).alias("__host"),
        )
        .select("id", F.explode(host_suffixes(F.col("__host"))).alias("__dom"))
    )
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("__dom")).distinct()
    )
    offenders = suffixes.join(bl, "__dom", "left_semi").select("id").distinct()
    return df.join(
        F.broadcast(offenders.withColumnRenamed("id", id_col)), id_col, "left_anti"
    )
