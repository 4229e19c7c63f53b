"""CDX(J) crawl-index parsing + SURT canonical keys — the index
surface of a Common-Crawl-style corpus (public conventions: Internet
Archive CDXJ lines ``<urlkey> <14-digit timestamp> <JSON>``, and the
SURT — Sort-friendly URI Reordering Transform — key format
``com,example)/path``, host segments reversed so one host's records
sort contiguously).

Pipeline role: the CDX index is how a 100 TB crawl is NAVIGATED
without touching WARC payloads — url→record lookup, per-host slices,
revisit/digest dedup, and fetch planning all run over these ~200-byte
rows instead of the page corpus. Everything here is JVM column
expressions (regexp + JSON built-ins — no Python), so the operators
are value-checked against DuckDB twins and the scan stays narrow.

Scale shape: parse is a narrow map; the digest-dedup rollup is one
map-side-combinable groupBy on urlkey (the SURT key is ALREADY the
sort/partition key of a real CDX index — co-located in practice).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: query params that never identify content (SURT canonicalization
#: drops sessions + trackers; superset of urlnorm.TRACKING_RE)
_SURT_DROP_RE = (r"^(utm_[^=]*|gclid|fbclid|ref|jsessionid|phpsessid|"
                 r"sid)=")


def surt_key(col: str | Column = "url") -> Column:
    """The SURT canonical key of a URL as a column expression:
    ``com,example)/path?a=1`` — scheme dropped, host lowercased with
    userinfo, trailing root-dots and leading ``www.`` stripped and
    dot-segments REVERSED (comma-joined), default ports stripped,
    path lowercased with trailing
    slashes collapsed (empty → ``/``), fragment dropped, query
    lowercased with session/tracking params removed and the rest
    bytewise-sorted. A documented subset of the public SURT spec
    (no %-decoding pass — crawl URLs are stored encoded), mirrored
    verbatim in the DuckDB oracle."""
    url = F.col(col) if isinstance(col, str) else col
    url = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1))
    # strip userinfo (r07 probe: 'https://user:pass@h/x' keyed as
    # 'com,user:pass@h)/...' — wrong segments AND credentials leaked
    # into the index); the last '@' ends the userinfo per RFC 3986
    host = F.regexp_replace(host, r"^.*@", "")
    # strip trailing FQDN root dots ('example.com.' → a LEADING empty
    # reversed segment ',com,example' — r07 probe)
    host = F.regexp_replace(host, r"\.+(?=$|:)", "")
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http",
                  F.regexp_replace(host, r":80$", "")) \
        .when(scheme == "https",
              F.regexp_replace(host, r":443$", "")) \
        .otherwise(host)
    # a surviving non-default port sits after the reversed host
    # (standard SURT position: ``com,example:8080)/``)
    port = F.regexp_extract(host, r":(\d+)$", 1)
    hostname = F.regexp_replace(host, r":\d+$", "")
    rev = F.array_join(F.reverse(F.split(hostname, r"\.")), ",")
    rev = F.when(port != "", F.concat(rev, F.lit(":"), port)) \
        .otherwise(rev)
    path = F.lower(
        F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1))
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.lower(F.regexp_extract(url, r"\?([^#]*)", 1))
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_SURT_DROP_RE)))
    qstr = F.when(F.size(params) > 0,
                  F.concat(F.lit("?"), F.array_join(params, "&"))) \
        .otherwise(F.lit(""))
    return F.concat(rev, F.lit(")"), path, qstr)


#: one CDXJ line: urlkey SP 14-digit-timestamp SP json-object
_CDXJ_RE = r"^(\S+) (\d{14}) (\{.*\})\s*$"

CDX_SCHEMA_FIELDS = ("url", "mime", "status", "digest", "length",
                     "offset", "filename")


def parse_cdxj(df: DataFrame, col: str = "line") -> DataFrame:
    """CDXJ lines → typed records:

    (urlkey, ts, url, mime, status_code, digest, length, offset,
     filename, status)

    ``status`` is 'ok' for a well-formed line, 'error:BadLine' when
    the ``urlkey timestamp {json}`` frame doesn't match, and
    'error:BadJson' when the frame matches but the JSON blob doesn't
    parse (A13 taxonomy: malformed index lines become visible rows,
    never task failures or silent drops). CDXJ stores blob values as
    strings (public convention); numeric fields are cast with try_
    semantics so a junk length NULLs rather than raising (ANSI mode).
    Narrow JVM map — regexp frame split + get_json_object, no
    Python."""
    line = F.col(col)
    urlkey = F.nullif(F.regexp_extract(line, _CDXJ_RE, 1), F.lit(""))
    ts_raw = F.nullif(F.regexp_extract(line, _CDXJ_RE, 2), F.lit(""))
    blob = F.nullif(F.regexp_extract(line, _CDXJ_RE, 3), F.lit(""))
    framed = df.select(
        urlkey.alias("_k"), ts_raw.alias("_ts"), blob.alias("_b"))
    # a parsable blob must round-trip url extraction; get_json_object
    # returns NULL for malformed JSON, which classifies the line
    g = {f: F.get_json_object("_b", f"$.{f}") for f in
         CDX_SCHEMA_FIELDS}
    status = (F.when(F.col("_k").isNull(), "error:BadLine")
              .when(g["url"].isNull() &
                    F.get_json_object("_b", "$").isNull(),
                    "error:BadJson")
              .otherwise("ok"))
    return framed.select(
        F.col("_k").alias("urlkey"),
        F.try_to_timestamp(F.col("_ts"),
                           F.lit("yyyyMMddHHmmss")).alias("ts"),
        g["url"].alias("url"),
        g["mime"].alias("mime"),
        # try_cast, not cast: ANSI mode (Spark 4 default) RAISES on a
        # junk numeric string — an index line must never kill a task
        g["status"].try_cast("int").alias("status_code"),
        g["digest"].alias("digest"),
        g["length"].try_cast("long").alias("length"),
        g["offset"].try_cast("long").alias("offset"),
        g["filename"].alias("filename"),
        status.alias("status"))


def format_cdxj(index: DataFrame, url_col: str = "url",
                ts_col: str = "warc_ts",
                filename_col: str = "src") -> DataFrame:
    """The index WRITE side: typed index rows (the
    ``sources.warc.warc_record_index`` schema) → CDXJ ``line``
    strings ``<surt-urlkey> <ts14> <json>`` — the file a crawl tier
    ships next to its WARCs so readers can navigate 100 TB of
    archives by byte range without scanning payloads. Blob values are
    rendered as STRINGS (the public CDXJ convention ``parse_cdxj``
    decodes with try_cast). Pure JVM (surt_key + to_json) narrow map;
    round-trips through ``parse_cdxj``/``cdx_digest_dedup`` — the
    write→read pair is value-checked against the archive BUILDER's
    independent byte accounting (tests/test_warc_cdx.py)."""
    blob = F.to_json(F.struct(
        F.col(url_col).alias("url"),
        F.col("mime").alias("mime"),
        F.col("http_status").cast("string").alias("status"),
        F.col("digest").alias("digest"),
        F.col("length").cast("string").alias("length"),
        F.col("offset").cast("string").alias("offset"),
        F.col(filename_col).alias("filename")))
    # concat_ws silently SKIPS null columns, so a NULL timestamp
    # (WARC-Date missing/unparseable — the record itself still
    # frames 'ok') would render a malformed 2-field line that comes
    # back from parse_cdxj as error:BadLine (r07 review). The
    # all-zero ts14 keeps the line well-formed and round-trips as a
    # visible NULL ts (year 0000 fails try_to_timestamp).
    ts14 = F.coalesce(F.date_format(ts_col, "yyyyMMddHHmmss"),
                      F.lit("00000000000000"))
    return index.select(F.concat_ws(
        " ", surt_key(url_col), ts14, blob).alias("line"))


def cdx_digest_dedup(records: DataFrame) -> DataFrame:
    """Per urlkey, the revisit/churn rollup a fetch planner consumes:

    (urlkey, n_records, n_distinct_digests, latest_ts, latest_digest,
     all_same)

    ``all_same`` marks urls whose every capture carried one digest —
    the re-crawl-less-often candidates (the CDX-level sibling of
    ``snapshot_change_rate``). One map-side-combinable groupBy on the
    index's native sort key; error rows (NULL urlkey) are excluded
    upstream by the caller's filter on status='ok'."""
    return (records
            .groupBy("urlkey")
            .agg(F.count("*").alias("n_records"),
                 F.countDistinct("digest").alias("n_distinct_digests"),
                 F.max("ts").alias("latest_ts"),
                 # tie-break on digest: 14-digit CDX timestamps have
                 # 1-second resolution, so two captures of one urlkey
                 # in the same second are possible — max_by on ts
                 # alone would make latest_digest nondeterministic
                 # across runs (a silent hash flap; r06 advice)
                 F.max_by("digest", F.struct("ts", "digest"))
                  .alias("latest_digest"))
            .withColumn("all_same",
                        F.col("n_distinct_digests") <= 1))
