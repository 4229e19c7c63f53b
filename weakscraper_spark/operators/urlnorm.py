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


def crawl_schedule(df: DataFrame, per_host: int = 2,
                   url_col: str = "url", seed: int = 42) -> DataFrame:
    """Politeness scheduling for a fetch fleet: each url gets a
    (host, wave, slot) assignment such that a host with n urls is
    spread over ``ceil(n / per_host)`` sequential waves with at most
    ~``per_host`` parallel fetches per wave.

    Assignment is HASH-based, not rank-based: a row_number window
    per host would funnel the head host (30% of a CC crawl) through
    one task — the same corpus-hot-window straggler this repo bans
    everywhere else. Instead wave = floor(u(url) · n_waves) with
    u = the md5-uniform draw from ``hash_sample``'s family — so wave
    sizes are binomial around per_host rather than exact, which a
    fetch fleet absorbs, and the schedule is deterministic,
    partitioning-independent, resume-stable, and mirrored
    bit-for-bit in the DuckDB oracle. Per-host counts are a
    two-phase agg broadcast back onto the rows.

    Unparseable urls are NOT silently dropped (and don't crash the
    job — ``try_parse_url``, since Spark 4's ANSI ``parse_url``
    RAISES on an invalid url): host is coalesced to the sentinel
    ``""`` before the groupBy/join, so every input url gets a
    schedule row — the sentinel "host" gets politeness waves like
    any other, and the caller can audit/route ``host = ''`` rows
    explicitly (the DuckDB oracle's regexp_extract mirrors this: no
    match → '').

    Input columns PASS THROUGH (appended: host — reused if the input
    already carries one, e.g. from robots_filter — plus wave, slot),
    so upstream lineage rides the rows instead of needing a
    corpus-width re-join."""
    host = (F.col("host") if "host" in df.columns
            else F.try_parse_url(F.col(url_col), F.lit("HOST")))
    # the sentinel coalesce runs on BOTH branches — a passthrough
    # host column may still carry NULLs, and a NULL join key would
    # silently drop the row in the counts equi-join (r04 review)
    rows = df.withColumn("host", F.coalesce(host, F.lit("")))
    counts = rows.groupBy("host").agg(F.count("*").alias("_n"))
    n_waves = F.greatest(F.ceil(F.col("_n") / per_host), F.lit(1))

    def u(salt: str):
        return (F.conv(F.substring(
            F.md5(F.encode(F.concat(F.lit(f"{seed}:{salt}:"),
                                    F.col(url_col)), "UTF-8")),
            1, 15), 16, 10).cast("double") / F.lit(float(16 ** 15)))

    return (rows.join(F.broadcast(counts), "host")
            .select(*rows.columns,
                    F.floor(u("w") * n_waves).cast("long").alias("wave"),
                    F.floor(u("s") * per_host).cast("long").alias("slot")))


#: registered domains dropped outright (seed list; callers pass their
#: own curated list at scale — e.g. the UT1 adult/gambling categories)
DEFAULT_BLOCKED_DOMAINS = (
    "badcontent.example", "casino.example", "linkfarm.example",
)

#: substrings scored against the WHOLE lowercased url. Strict terms
#: score 1.0, soft terms 0.5 — the RefinedWeb-style soft-match rule
#: where one strong or two weak signals cross the drop line.
STRICT_URL_TERMS = ("xxx", "casino", "viagra", "warez")
SOFT_URL_TERMS = ("download", "torrent", "free-money", "winner")


def url_quality_filter(df: DataFrame, url_col: str = "url",
                       blocked_domains: tuple[str, ...] =
                       DEFAULT_BLOCKED_DOMAINS,
                       max_score: float = 1.0) -> DataFrame:
    """URL-level corpus gate (RefinedWeb §2's first filter): score
    every url from the STRING ALONE — before any fetch/parse spend —
    and emit an auditable verdict row per input url:

    (url, host, reg_domain, url_score, blocked_domain, keep)

    - ``reg_domain`` = last two host labels (cheap registered-domain
      proxy; a public-suffix list upgrade slots in here);
    - ``blocked_domain`` = reg_domain ∈ blocked list (exact match on
      the key — at scale the curated list is a broadcast join side,
      here an IN-list literal since the seed list is tiny);
    - ``url_score`` = 1.0 per strict spam term + 0.5 per soft term
      occurring ANYWHERE in the lowercased url (substring, not word:
      spam hosts embed terms in subdomains/paths);
    - ``keep`` = not blocked and url_score < max_score.

    Pure JVM string ops, zero shuffle — the whole filter is a narrow
    map, which is the point: it runs on the 10^12-row frontier
    BEFORE the expensive stages. Every expression is mirrored
    bit-for-bit in the DuckDB oracle twin."""
    url = F.lower(F.col(url_col))
    host = F.lower(F.coalesce(
        F.try_parse_url(F.col(url_col), F.lit("HOST")), F.lit("")))
    host_nw = F.regexp_replace(host, r"^www\.", "")
    labels = F.split(host_nw, r"\.")
    reg = F.when(
        F.size(labels) >= 2,
        F.concat_ws(".", F.element_at(labels, -2),
                    F.element_at(labels, -1))).otherwise(host_nw)
    score = sum(
        [F.when(F.contains(url, F.lit(t)), F.lit(1.0))
         .otherwise(F.lit(0.0)) for t in STRICT_URL_TERMS] +
        [F.when(F.contains(url, F.lit(t)), F.lit(0.5))
         .otherwise(F.lit(0.0)) for t in SOFT_URL_TERMS])
    blocked = reg.isin(*blocked_domains) if blocked_domains \
        else F.lit(False)
    return df.select(
        F.col(url_col),
        host_nw.alias("host"),
        reg.alias("reg_domain"),
        F.round(score, 1).alias("url_score"),
        blocked.alias("blocked_domain"),
        (~blocked & (F.round(score, 1) < max_score)).alias("keep"))
