"""Web-crawl hygiene: URL canonicalization, URL-level dedup, and
host-level corpus stats — the normalization pass a crawl pipeline runs
before any content-based dedup (the same page arrives as `HTTP://WWW.
Site.com:80/a/?utm_source=x&b=2&a=1#frag` and `http://site.com/a?a=1&
b=2`; without canonicalization every downstream dedup treats them as
distinct documents).

All transforms are single built-in column expressions (regexp_extract /
lower / split / array_sort / concat_ws) — whole-stage-codegen JVM work,
no UDFs, so the pass adds no Python cost to a 100 TB scan and every
rule is exactly reproducible in the DuckDB oracle.

Canonicalization rules (the widely-applied safe subset — see RFC 3986
§6 syntax-based normalization plus the tracking-param strip crawl
pipelines layer on top):

* scheme and host lowercased; a leading ``www.`` label dropped;
* default ports stripped (``:80`` for http, ``:443`` for https);
* the fragment dropped;
* tracking query parameters dropped (``utm_*``, ``gclid``, ``fbclid``);
* remaining query parameters sorted by full ``k=v`` text (stable,
  total order — applying twice is a no-op);
* a trailing ``/`` stripped from non-root paths; an empty path becomes
  ``/``.

Scale posture: canonicalize is a narrow map (no exchange).
``url_dedup`` adds ONE hash aggregate keyed on the canonical string —
the same shuffle shape as exact text dedup; representative choice is
min(id) inside the aggregate, so no window/sort over the corpus.
``host_stats`` is a second bounded aggregate (rows ∝ distinct hosts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one RFC-3986-shaped extraction regex: scheme://host[:port][path][?q][#f]
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

# tracking parameters a crawl pipeline strips before dedup
TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("gclid", "fbclid")


def _is_tracking_param(p: Column) -> Column:
    """True when the raw ``k=v`` text names a tracking parameter.

    Folds over the module-level constants so extending
    ``TRACKING_PREFIXES`` / ``TRACKING_EXACT`` is authoritative."""
    low = F.lower(p)
    cond = F.lit(False)
    for prefix in TRACKING_PREFIXES:
        cond = cond | low.startswith(prefix)
    for name in TRACKING_EXACT:
        cond = cond | low.startswith(name + "=")
    return cond


def _canon_query(q: Column) -> Column:
    """Drop tracking params, sort the survivors by full k=v text."""
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~_is_tracking_param(p),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` as a single JVM column expression.

    Unparseable values (no ``scheme://host``) canonicalize to NULL so
    callers can route them to a quarantine path instead of silently
    colliding on a garbage key."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    host0 = F.lower(F.regexp_extract(url, _URL_RE, 2))
    host = F.when(
        host0.startswith("www."), host0.substr(F.lit(5), F.length(host0))
    ).otherwise(host0)
    port = F.regexp_extract(url, _URL_RE, 3)
    path0 = F.regexp_extract(url, _URL_RE, 4)
    query = F.regexp_extract(url, _URL_RE, 5)

    keep_port = F.when(
        (port == "")
        | ((scheme == F.lit("http")) & (port == "80"))
        | ((scheme == F.lit("https")) & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.when(path0 == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path0) > 1) & path0.endswith("/"),
            path0.substr(F.lit(1), F.length(path0) - 1),
        ).otherwise(path0)
    )
    cq = _canon_query(query)
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        keep_port,
        path,
        F.when(cq == "", F.lit("")).otherwise(F.concat(F.lit("?"), cq)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(out)


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """URL-level dedup clusters: one row per canonical URL with the
    representative (minimum ``id_col``), member count, and the number
    of distinct raw spellings that collapsed onto it.

    Returns (canonical_url, rep_id, n_docs, n_raw_forms). One hash
    aggregate keyed on the canonical string — map-side combined, no
    sort, no window; representative selection rides the same aggregate
    as ``min(id)``."""
    return (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
            F.col(url_col).alias("_raw"),
            F.col(id_col).alias("_id"),
        )
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min("_id").cast("long").alias("rep_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("_raw").cast("long").alias("n_raw_forms"),
        )
    )


def host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl profile over CANONICAL urls: page count, distinct
    canonical URLs, and the duplicate factor (pages per distinct URL,
    rounded 6dp) — the table a crawl scheduler reads to spot mirror
    hosts. Host = canonical authority (lowercased, www-stripped,
    default ports gone). Two bounded aggregates; rows ∝ hosts."""
    canon = df.select(canonicalize_url(F.col(url_col)).alias("cu")).where(
        F.col("cu").isNotNull()
    )
    host = F.regexp_extract(F.col("cu"), r"^[a-z0-9+.-]+://([^/?#]+)", 1)
    return (
        canon.select(host.alias("host"), F.col("cu"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.countDistinct("cu").cast("long").alias("n_urls"),
        )
        .select(
            "host",
            "n_pages",
            "n_urls",
            F.round(F.col("n_pages").cast("double") / F.col("n_urls"), 6).alias(
                "dup_factor"
            ),
        )
    )
