"""URL canonicalization + URL-level dedup for web corpora: the same
page is crawled under scheme/case/port/tracking-param/trailing-slash
variants, and url-level dedup before fetch/extract is the cheapest
dedup in the whole pipeline (pure string column ops — no Python, no
shuffle until the final groupBy on the canonical key).

Canonical form (conservative, lossless for real content URLs):
- scheme and host lowercased; leading ``www.`` dropped;
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment dropped;
- tracking query params dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``ref``); remaining params sorted bytewise (order-insensitive);
- trailing slashes collapsed; empty path → ``/``.

Everything is a composition of JVM built-ins (regexp_extract /
regexp_replace / array ops) so the identical expression runs in the
DuckDB oracle — the canonicalization is value-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: query params that never identify content
TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|ref)="


def canonical_url(col: str | Column = "url") -> Column:
    """Column expression computing the canonical form of ``col``."""
    url = F.col(col) if isinstance(col, str) else col
    url = F.regexp_replace(url, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http",
                  F.regexp_replace(host, r":80$", "")) \
        .when(scheme == "https",
              F.regexp_replace(host, r":443$", "")) \
        .otherwise(host)
    rest = F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?]*)", 1)
    path = F.regexp_replace(rest, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE)))
    qstr = F.when(F.size(params) > 0,
                  F.concat(F.lit("?"), F.array_join(params, "&"))) \
        .otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qstr)


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Group rows by canonical URL: (url_canon, canonical_url =
    bytewise-min original variant, n_variants). Two-phase hash agg —
    map-side combine absorbs per-partition variant repetition; the
    canonical-key shuffle carries one row per (partition, key)."""
    return (df.select(F.col(url_col).alias("_u"),
                      canonical_url(url_col).alias("url_canon"))
            .groupBy("url_canon")
            .agg(F.min("_u").alias("first_url"),
                 F.count("*").alias("n_variants")))
