"""CDX WRITE side: archive bytes → index rows → CDXJ lines →
(parse back) — value-checked against the archive BUILDER's
independent byte accounting, plus the property the index exists for:
slicing the archive at (offset, length) and inflating yields exactly
the indexed record (the byte-range fetch a 100 TB crawl reader
performs)."""

import zlib

import pytest

from weakscraper_spark.operators.cdx import (cdx_digest_dedup,
                                             format_cdxj, parse_cdxj)
from weakscraper_spark.sources.warc import (build_warc,
                                            iter_warc_index,
                                            iter_warc_records,
                                            payload_digest,
                                            warc_record_index)


def _records(n=6, host="example.com"):
    return [{"type": "response",
             "url": f"https://{host}/p/{i}",
             "date": f"2024-05-01T00:00:{i:02d}Z",
             "body": f"<html><body>doc {i} " + "w " * (10 + 7 * i)
                     + "</body></html>",
             "http_status": 200,
             "mime": "text/html; charset=utf-8"}
            for i in range(n)]


# ---------------------------------------------------------------------------
# pure-python kernel: builder accounting == parser-derived index
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gz", [True, False])
def test_builder_index_matches_parser(gz):
    truth: list = []
    raw = build_warc(_records(), gzip_members=gz, index=truth)
    got = list(iter_warc_index(raw))
    assert [r["status"] for r in got] == ["ok"] * 6
    assert [(r["url"], r["offset"], r["length"]) for r in got] == \
        [(t["url"], t["offset"], t["length"]) for t in truth]
    assert [payload_digest(r["body"]) for r in got] == \
        [t["digest"] for t in truth]


@pytest.mark.parametrize("gz", [True, False])
def test_byte_range_fetch_roundtrip(gz):
    """The point of the index: archive[offset : offset+length] alone
    reconstructs the record."""
    truth: list = []
    raw = build_warc(_records(), gzip_members=gz, index=truth)
    for t in truth:
        span = raw[t["offset"]:t["offset"] + t["length"]]
        member = (zlib.decompress(span, 31) if gz
                  else span + b"\r\n\r\n")
        (rec,) = list(iter_warc_records(member))
        assert rec["status"] == "ok"
        assert rec["url"] == t["url"]
        assert payload_digest(rec["body"]) == t["digest"]


def test_index_offsets_cover_gzip_archive_exactly():
    truth: list = []
    raw = build_warc(_records(), gzip_members=True, index=truth)
    pos = 0
    for t in truth:
        assert t["offset"] == pos
        pos += t["length"]
    assert pos == len(raw)


def test_index_error_taxonomy():
    # garbage yields one visible FrameSync row, never a raise
    got = list(iter_warc_index(b"not a warc at all"))
    assert len(got) == 1 and got[0]["status"] == "error:FrameSync"
    # truncated gzip tail: decoded members survive, tail is dropped
    truth: list = []
    raw = build_warc(_records(3), gzip_members=True, index=truth)
    got = list(iter_warc_index(raw[:truth[2]["offset"] + 5]))
    assert [r["status"] for r in got] == ["ok", "ok"]


# ---------------------------------------------------------------------------
# spark surface: write → ship → parse round-trip
# ---------------------------------------------------------------------------

def test_warc_to_cdx_roundtrip_spark(spark):
    recs = _records(8, host="a.example.com") + [
        {"type": "warcinfo", "body": b"software: test\r\n"}]
    truth: list = []
    raw = build_warc(recs, gzip_members=True, index=truth)
    files = spark.createDataFrame([("crawl-00.warc.gz", raw)],
                                  "path string, content binary")
    from pyspark.sql import functions as F
    idx = warc_record_index(files)
    ok = idx.filter((F.col("status") == "ok") &
                    (F.col("record_type") == "response"))
    lines = format_cdxj(ok)
    back = parse_cdxj(lines).orderBy("urlkey")
    rows = back.collect()
    assert len(rows) == 8
    assert all(r["status"] == "ok" for r in rows)
    by_url = {t["url"]: t for t in truth if t["url"]}
    for r in rows:
        t = by_url[r["url"]]
        assert (r["offset"], r["length"], r["digest"]) == \
            (t["offset"], t["length"], t["digest"])
        assert r["urlkey"].startswith("com,example,a)/p/")
        assert r["filename"] == "crawl-00.warc.gz"
        assert r["status_code"] == 200
        assert r["ts"] is not None
    # and the dedup rollup consumes the round-tripped records directly
    roll = cdx_digest_dedup(back).collect()
    assert len(roll) == 8
    assert all(row["all_same"] for row in roll)


def test_warc_record_index_no_payload_column(spark):
    """Index rows must stay ~200 B — the html payload never leaves
    the task."""
    files = spark.createDataFrame(
        [("a.warc.gz", build_warc(_records(2)))],
        "path string, content binary")
    assert "html" not in warc_record_index(files).columns


def test_pages_to_warc_distributed_roundtrip(spark):
    """The DISTRIBUTED write side: archives built by applyInPandas
    round-trip through the byte-level reader, and the emitted cdx
    column matches what warc_record_index re-derives from the bytes
    alone."""
    from pyspark.sql import functions as F
    from weakscraper_spark.sources.warc import pages_to_warc
    pages = spark.range(40).select(
        (F.col("id") / 10).cast("int").alias("archive_id"),
        F.concat(F.lit("https://w.example/p/"),
                 F.col("id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2024-05-01 00:00:00")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>doc "),
                          F.col("id").cast("string"),
                          F.lit("</body></html>")), "UTF-8")
         .alias("html"))
    archives = pages_to_warc(pages).cache()
    assert archives.count() == 4
    emitted = (archives.select("filename",
                               F.explode("cdx").alias("c"))
               .select("filename", "c.url", "c.offset", "c.length",
                       "c.digest"))
    derived = warc_record_index(
        archives.select(F.col("filename").alias("path"), "content"))
    got = {(r.src, r.url): (r.offset, r.length, r.digest)
           for r in derived.select(
               F.col("src"), "url", "offset", "length",
               "digest").collect()}
    want = {(r.filename, r.url): (r.offset, r.length, r.digest)
            for r in emitted.collect()}
    assert got == want and len(want) == 40
    archives.unpersist()


def test_pages_to_warc_bytes_partition_invariant(spark):
    """Archive bytes are a pure function of the row SET (kernel
    sorts by url): repartitioning must not change a single byte."""
    from pyspark.sql import functions as F
    from weakscraper_spark.sources.warc import pages_to_warc
    pages = spark.range(24).select(
        (F.col("id") % 3).alias("archive_id"),
        F.concat(F.lit("https://w.example/p/"),
                 F.col("id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2024-05-01 00:00:00")).alias("warc_ts"),
        F.encode(F.col("id").cast("string"), "UTF-8").alias("html"))
    a = {r.filename: bytes(r.content)
         for r in pages_to_warc(pages.repartition(1)).collect()}
    b = {r.filename: bytes(r.content)
         for r in pages_to_warc(pages.repartition(7, "url")).collect()}
    assert a == b and len(a) == 3


def test_pages_to_warc_feeds_format_cdxj(spark):
    """write → index lines → parse: the one-pass archive+index
    production a crawl tier ships."""
    from pyspark.sql import functions as F
    from weakscraper_spark.sources.warc import pages_to_warc
    pages = spark.range(6).select(
        F.lit(0).alias("archive_id"),
        F.concat(F.lit("https://w.example/p/"),
                 F.col("id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2024-05-01 12:34:56")).alias("warc_ts"),
        F.encode(F.col("id").cast("string"), "UTF-8").alias("html"))
    archives = pages_to_warc(pages)
    idx = (archives.select(F.col("filename").alias("src"),
                           F.explode("cdx").alias("c"))
           .select("src", "c.url", "c.warc_ts", "c.offset",
                   "c.length", "c.digest",
                   F.lit("text/html").alias("mime"),
                   F.lit(200).alias("http_status")))
    back = parse_cdxj(format_cdxj(idx)).collect()
    assert len(back) == 6
    assert all(r.status == "ok" and r.status_code == 200 and
               r.urlkey.startswith("example,w)/p/") for r in back)


def test_fetch_by_index_random_access(spark):
    """The index READ path: records come back by (offset, length)
    slice + single-member inflate — bodies byte-identical to what a
    full parse yields, corrupt spans degrade to error:BadSpan rows."""
    from pyspark.sql import functions as F
    from weakscraper_spark.sources.warc import fetch_by_index
    truth: list = []
    raw = build_warc(_records(6), gzip_members=True, index=truth)
    archives = spark.createDataFrame(
        [("a.warc.gz", raw)], "filename string, content binary")
    idx_rows = [("a.warc.gz", t["url"], t["offset"], t["length"])
                for t in truth[:4]]
    # plus one corrupt span (offset into the middle of a member)
    idx_rows.append(("a.warc.gz", "corrupt", truth[0]["offset"] + 3,
                     truth[0]["length"]))
    idx = spark.createDataFrame(
        idx_rows, "filename string, url string, offset long, "
                  "length long")
    out = {r.url: r for r in fetch_by_index(archives, idx).collect()}
    assert len(out) == 5
    want = {r["url"]: r["body"] for r in _records(6)}
    for t in truth[:4]:
        r = out[t["url"]]
        assert r.status == "ok"
        body = want[t["url"]]
        body = body.encode() if isinstance(body, str) else body
        assert bytes(r.html) == body
    assert out["corrupt"].status == "error:BadSpan"
    assert out["corrupt"].html is None


# ---------------------------------------------------------------------------
# r07 end-of-round review regressions (6 findings, all fixed + pinned)
# ---------------------------------------------------------------------------

def test_build_warc_location_with_percent():
    """Percent bytes in Location (the norm for encoded 3xx targets)
    must neither crash the %-format nor corrupt neighboring header
    values."""
    raw = build_warc([
        {"type": "response", "url": "https://h/x", "http_status": 301,
         "location": "/a%2Fb?q=%s%d", "body": b""}],
        gzip_members=False)
    (rec,) = list(iter_warc_records(raw))
    assert rec["status"] == "ok"
    assert rec["location"] == "/a%2Fb?q=%s%d"
    assert rec["http_status"] == 301


def test_empty_body_digest_matches_builder():
    """3xx/204 records have empty payloads; the CDX convention is
    the sha-1 of b'' — the parser-side index must agree with the
    builder's accounting, and the dedup rollup must SEE the digest
    (countDistinct ignores NULLs: an all-redirect urlkey would
    report n_distinct_digests=0/all_same=true regardless of churn)."""
    truth: list = []
    raw = build_warc([
        {"type": "response", "url": "https://h/r", "http_status": 301,
         "location": "/new", "body": b""}], index=truth)
    (got,) = list(iter_warc_index(raw))
    assert got["status"] == "ok"
    assert payload_digest(b"") == truth[0]["digest"] \
        == "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"


def test_warc_record_index_empty_body_digest_spark(spark):
    raw = build_warc([
        {"type": "response", "url": "https://h/r", "http_status": 301,
         "location": "/new", "body": b""}])
    files = spark.createDataFrame([("a.warc.gz", raw)],
                                  "path string, content binary")
    (row,) = warc_record_index(files).collect()
    assert row.digest == payload_digest(b"")
    assert row.location == "/new"


def test_format_cdxj_null_ts_stays_well_formed(spark):
    """concat_ws skips NULL columns — a missing WARC-Date must not
    produce a 2-field line that round-trips as error:BadLine; the
    all-zero ts14 keeps the frame and surfaces as a NULL ts."""
    from pyspark.sql import functions as F
    idx = spark.createDataFrame(
        [("a.warc.gz", "https://h.example/p", None, 10, 20,
          "sha1:X", "text/html", 200)],
        "src string, url string, warc_ts timestamp, offset long, "
        "length long, digest string, mime string, http_status int")
    back = parse_cdxj(format_cdxj(idx)).collect()
    assert len(back) == 1
    assert back[0].status == "ok"
    assert back[0].ts is None
    assert back[0].urlkey == "example,h)/p"


def test_fetch_by_index_null_span_degrades(spark):
    """parse_cdxj's BadLine/junk-numeric rows carry NULL offsets —
    the fetch kernel must yield error:BadSpan, never a task-killing
    NaN cast."""
    from weakscraper_spark.sources.warc import fetch_by_index
    raw = build_warc(_records(2))
    archives = spark.createDataFrame(
        [("a.warc.gz", raw)], "filename string, content binary")
    idx = spark.createDataFrame(
        [("a.warc.gz", "https://x/", None, None)],
        "filename string, url string, offset long, length long")
    (row,) = fetch_by_index(archives, idx).collect()
    assert row.status == "error:BadSpan"


def test_fetch_by_index_ships_archive_bytes_once(spark):
    """Plan shape: index rows are PACKED per archive before the join
    (collect_list), so the content column is joined once per archive
    — never replicated per index row."""
    import contextlib
    import io
    import re
    from weakscraper_spark.sources.warc import fetch_by_index
    raw = build_warc(_records(3))
    archives = spark.createDataFrame(
        [("a.warc.gz", raw)], "filename string, content binary")
    idx = spark.createDataFrame(
        [("a.warc.gz", f"u{i}", 0, 10) for i in range(3)],
        "filename string, url string, offset long, length long")
    df = fetch_by_index(archives, idx)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the aggregate (packing) must sit BELOW the join in the plan
    names = [m.group(1) for m in
             re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)", plan,
                         re.M)]
    assert any(n.endswith("Aggregate") for n in names), names
    assert len(df.collect()) == 3


def test_pages_to_warc_revisit_total_order(spark):
    """Two captures of one url in one archive group must serialize
    deterministically (url sort alone ties; arrival order is
    partition-dependent)."""
    from pyspark.sql import functions as F
    from weakscraper_spark.sources.warc import pages_to_warc
    rows = [(0, "https://h/p", "2024-05-01 00:00:00", b"v1"),
            (0, "https://h/p", "2024-05-02 00:00:00", b"v2"),
            (0, "https://h/q", "2024-05-01 00:00:00", b"q")]
    pages = spark.createDataFrame(
        rows, "archive_id long, url string, ts string, html binary"
    ).select("archive_id", "url",
             F.to_timestamp("ts").alias("warc_ts"), "html")
    a = {r.filename: bytes(r.content)
         for r in pages_to_warc(pages.repartition(1)).collect()}
    b = {r.filename: bytes(r.content)
         for r in pages_to_warc(
             pages.orderBy(F.desc("warc_ts")).repartition(3))
         .collect()}
    assert a == b


def test_assign_archives_deterministic_and_revisit_colocated(spark):
    from pyspark.sql import functions as F
    from weakscraper_spark.sources.warc import assign_archives
    pages = spark.range(200).select(
        F.concat(F.lit("https://h/p/"),
                 (F.col("id") % 50).cast("string")).alias("url"))
    a = {(r.url, r.archive_id) for r in
         assign_archives(pages.repartition(1), 8).collect()}
    b = {(r.url, r.archive_id) for r in
         assign_archives(pages.repartition(7), 8).collect()}
    assert a == b
    # one archive per url (revisits co-located)
    per_url = {}
    for url, aid in a:
        per_url.setdefault(url, set()).add(aid)
    assert all(len(v) == 1 for v in per_url.values())
    assert 0 <= min(x for _, x in a) and max(x for _, x in a) < 8
