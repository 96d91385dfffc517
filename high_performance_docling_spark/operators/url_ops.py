"""URL / domain curation operators for crawl pipelines.

Every large-scale crawl curation pipeline (CCNet, C4, RefinedWeb,
Dolma) buckets documents by their source URL: per-registrable-domain
counts drive blocklists, sampling weights and dedup scopes. This module
provides that surface as pure JVM-side column expressions — a shared
Java∩RE2 regex subset (same discipline as operators/cleaning.py's PII
chain) so the DuckDB oracle evaluates the identical patterns.

Functions return projections (no shuffle); the per-domain rollup is one
hash aggregation on the registrable-domain key. Domain keys are
power-law-skewed in real crawls (wikipedia.org, blogspot.com mega
domains) — pair the rollup with operators/skew.salted_agg when a single
domain's row group exceeds an executor partition.

Registrable-domain note: the full Public Suffix List is a 10k-entry
table (not vendored here); ``registrable_domain`` implements the
documented two-label heuristic with a small second-level-TLD set
(co.uk, com.au, …) that covers the overwhelming bulk of crawl traffic.
A production deployment swaps in the PSL as a broadcast join without
changing the call sites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# host: authority up to the first ':' (port), '/', '?' or '#'.
# Java and RE2 agree on this class-based pattern (no lookaround).
_HOST_RX = r"^[a-z][a-z0-9+.-]*://([^/?#:]+)"
_PATH_RX = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_QUERY_RX = r"\?([^#]*)"

# second-level labels under which the registrable domain is THREE labels
# (news.bbc.co.uk -> bbc.co.uk). Kept to the high-traffic set; see
# module docstring for the PSL upgrade path.
SECOND_LEVEL_TLDS = ("co", "com", "org", "net", "ac", "gov", "edu")


def url_host(url: Column) -> Column:
    """Lower-cased host part of an absolute URL ('' when unparseable)."""
    return F.regexp_extract(F.lower(url), _HOST_RX, 1)


def url_path(url: Column) -> Column:
    """Path component including the leading '/' ('' when absent)."""
    return F.regexp_extract(F.lower(url), _PATH_RX, 1)


def url_query(url: Column) -> Column:
    """Query string after '?' (without the '?'; '' when absent)."""
    return F.regexp_extract(url, _QUERY_RX, 1)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 heuristic: last two labels, or last three when the
    second-to-last label is a known second-level TLD label and at least
    three labels exist. '' host stays ''."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(n <= 1, host)
        .when(
            (n >= 3) & F.element_at(parts, -2).isin(*SECOND_LEVEL_TLDS), last3
        )
        .otherwise(last2)
    )


def parse_url_columns(
    df: DataFrame, url_col: str = "url", prefix: str = "url_"
) -> DataFrame:
    """Append parsed URL columns: host, registrable domain, path depth
    (number of non-empty path segments) and a has-query flag. Pure
    projection — Catalyst keeps it inside the enclosing codegen stage."""
    u = F.col(url_col)
    host = url_host(u)
    path = url_path(u)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    return df.select(
        "*",
        host.alias(f"{prefix}host"),
        registrable_domain(host).alias(f"{prefix}domain"),
        F.greatest(depth, F.lit(0)).alias(f"{prefix}path_depth"),
        (F.length(url_query(u)) > 0).cast("int").alias(f"{prefix}has_query"),
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-registrable-domain rollup: document count, distinct hosts,
    query-URL count, mean path depth (4 dp) and, when ``weight_col`` is
    given, its rounded mean — the table a curation run ranks, blocklists
    and samples from."""
    parsed = parse_url_columns(df, url_col)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("url_host").alias("n_hosts"),
        F.sum("url_has_query").alias("n_query_urls"),
        F.round(F.avg("url_path_depth"), 4).alias("avg_path_depth"),
    ]
    if weight_col is not None:
        aggs.append(F.round(F.avg(weight_col), 4).alias(f"avg_{weight_col}"))
    return parsed.groupBy(F.col("url_domain").alias("domain")).agg(*aggs)
