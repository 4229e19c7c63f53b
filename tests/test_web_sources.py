"""WARC ingestion + charset decode + head-metadata extraction —
the raw-crawl edge of the pipeline (sources/warc.py,
operators/charset.py, operators/metadata.py). Kernel behaviors are
pinned driver-side (total functions, construction path disjoint from
parse path); the Spark flat-maps are checked for row accounting and
narrow plans."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from weakscraper_spark.operators.charset import (
    charset_param, decode_html, sniff_decode)
from weakscraper_spark.operators.metadata import (
    page_metadata, page_metadata_fields)
from weakscraper_spark.sources.warc import (
    build_warc, iter_warc_records, warc_pages, warc_records)


# ---------------------------------------------------------------------------
# WARC kernel (pure)
# ---------------------------------------------------------------------------

RECS = [
    {"type": "warcinfo", "body": "software: test", "date":
     "2024-05-01T00:00:00Z"},
    {"type": "response", "url": "https://a.example.com/x",
     "date": "2024-05-01T12:30:00Z", "body": "<html>A</html>",
     "http_status": 200, "mime": "text/html; charset=utf-8"},
    {"type": "request", "url": "https://a.example.com/x",
     "body": "GET /x HTTP/1.1"},
    {"type": "response", "url": "https://b.example.com/img",
     "date": "2024-05-01T12:31:00Z", "body": b"\x89PNG...",
     "http_status": 200, "mime": "image/png"},
    {"type": "response", "url": "https://c.example.com/404",
     "date": "2024-05-01T12:32:00Z", "body": "gone",
     "http_status": 404, "mime": "text/html"},
]


@pytest.mark.parametrize("gz", [True, False])
def test_warc_roundtrip_all_record_types(gz):
    raw = build_warc(RECS, gzip_members=gz)
    got = list(iter_warc_records(raw))
    assert [r["record_type"] for r in got] == \
        ["warcinfo", "response", "request", "response", "response"]
    assert all(r["status"] == "ok" for r in got)
    html = got[1]
    assert html["url"] == "https://a.example.com/x"
    assert html["http_status"] == 200
    assert html["body"] == b"<html>A</html>"
    assert html["mime"].startswith("text/html")
    assert got[4]["http_status"] == 404


def test_warc_truncated_and_garbage_are_status_not_raise():
    raw = build_warc(RECS[:2], gzip_members=False)
    trunc = list(iter_warc_records(raw[:-20]))   # cut into 2nd body
    assert trunc[0]["status"] == "ok"
    assert trunc[-1]["status"].startswith("error:")
    assert list(iter_warc_records(b"not a warc at all"))[0][
        "status"] == "error:FrameSync"
    assert list(iter_warc_records(b"")) == []
    # corrupt gzip tail: first member survives
    gz = build_warc(RECS[:2], gzip_members=True)
    got = list(iter_warc_records(gz[:len(gz) // 2]))
    assert got and got[0]["record_type"] == "warcinfo"


def test_warc_streaming_frames_span_members():
    """Records are framed incrementally from the member stream: a
    whole multi-record archive compressed as ONE gzip member (records
    span member boundaries in the rolling buffer) parses identically
    to the one-member-per-record CC layout."""
    import zlib
    plain = build_warc(RECS, gzip_members=False)
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    one_member = co.compress(plain) + co.flush()
    a = list(iter_warc_records(one_member))
    b = list(iter_warc_records(build_warc(RECS, gzip_members=True)))
    assert [(r["record_type"], r["status"], r["body"]) for r in a] == \
        [(r["record_type"], r["status"], r["body"]) for r in b]
    assert len(a) == len(RECS)


def test_warc_member_iteration_linear_and_chunked():
    """The member walk consumes the compressed input via fixed-size
    slices (r04 review: per-member unused_data copies were O(members
    × archive)); a tiny chunk_size must produce identical bytes and
    identical framed records."""
    from weakscraper_spark.sources.warc import _iter_member_chunks
    raw = build_warc(RECS, gzip_members=True)
    default = b"".join(_iter_member_chunks(raw))
    tiny = b"".join(_iter_member_chunks(raw, chunk_size=7))
    assert tiny == default
    assert b"WARC/1.0" in default


def test_warc_spark_flatmap_and_pages_view(spark):
    files = spark.createDataFrame(
        [("f1.warc.gz", build_warc(RECS)),
         ("f2.warc.gz", b"garbage")],
        "path string, content binary")
    recs = warc_records(files).collect()
    by_src = {}
    for r in recs:
        by_src.setdefault(r.src, []).append(r)
    assert len(by_src["f1.warc.gz"]) == 5
    assert by_src["f2.warc.gz"][0].status == "error:FrameSync"
    # pages view: only the 200 text/html response survives, with
    # typed timestamp
    pages = warc_pages(files).collect()
    assert len(pages) == 1
    assert pages[0].url == "https://a.example.com/x"
    assert pages[0].warc_ts.year == 2024
    assert bytes(pages[0].html) == b"<html>A</html>"


def test_warc_oversize_archive_degrades_to_status_row(spark, tmp_path):
    """An archive above the byte cap must become ONE error:Oversize
    status row (never a parse attempt / reader crash), and the raw
    plan's length guard must prune it from the scan while
    oversize_archives reports exactly the pruned set (VERDICT r04
    #2). Caps are parameterized down to test-scale bytes."""
    from weakscraper_spark.plans.raw_pipeline import oversize_archives
    big = build_warc(RECS)
    files = spark.createDataFrame(
        [("small.warc.gz", build_warc(RECS[:1])),
         ("big.warc.gz", big)],
        "path string, content binary")
    recs = warc_records(files, max_archive_bytes=len(big) - 1).collect()
    by_src = {}
    for r in recs:
        by_src.setdefault(r.src, []).append(r)
    assert len(by_src["big.warc.gz"]) == 1
    assert by_src["big.warc.gz"][0].status == "error:Oversize"
    assert by_src["big.warc.gz"][0].n_bytes == len(big)
    assert all(r.status != "error:Oversize"
               for r in by_src["small.warc.gz"])
    # scan-level guard: the oversize file is pruned by the pushed-down
    # length filter and surfaced by the audit query
    (tmp_path / "small.warc.gz").write_bytes(build_warc(RECS[:1]))
    (tmp_path / "big.warc.gz").write_bytes(big)
    over = oversize_archives(spark, str(tmp_path),
                             max_archive_bytes=len(big) - 1).collect()
    assert [(r.src.rsplit("/", 1)[-1], r.status) for r in over] == [
        ("big.warc.gz", "error:Oversize")]
    from weakscraper_spark.plans.raw_pipeline import _archive_scan
    kept = (_archive_scan(spark, str(tmp_path))
            .filter(F.col("length") <= len(big) - 1)
            .select("path").collect())
    assert [r.path.rsplit("/", 1)[-1] for r in kept] == ["small.warc.gz"]


def test_warc_plan_is_narrow(spark):
    files = spark.createDataFrame([("f", build_warc(RECS[:1]))],
                                  "path string, content binary")
    plan = warc_records(files)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_warc_pages_feed_prepare_pages(spark):
    """The pages view composes with the standard pipeline entry
    (host derivation + extractable filter)."""
    from weakscraper_spark.plans.pipeline import prepare_pages
    files = spark.createDataFrame(
        [("f1", build_warc(RECS))], "path string, content binary")
    staged = prepare_pages(warc_pages(files)).collect()
    assert len(staged) == 1 and staged[0].host == "a.example.com"


# ---------------------------------------------------------------------------
# charset kernel (pure)
# ---------------------------------------------------------------------------

def test_sniff_decode_order():
    # BOM wins over everything
    t, e, s = sniff_decode(b"\xef\xbb\xbfh\xc3\xa9", "iso-8859-1")
    assert (t, e, s) == ("hé", "utf-8", "ok:bom")
    # transport charset
    t, e, s = sniff_decode("héllo".encode("cp1252"), "ISO-8859-1")
    assert t == "héllo" and e == "cp1252" and s == "ok:transport"
    # meta prescan
    raw = (b'<html><head><meta charset="utf-8"></head>'
           + "né".encode("utf-8") + b"</html>")
    t, e, s = sniff_decode(raw)
    assert "né" in t and e == "utf-8" and s == "ok:meta"
    # http-equiv form
    raw = (b'<meta http-equiv="Content-Type" content="text/html; '
           b'charset=ISO-8859-1">caf\xe9')
    t, e, s = sniff_decode(raw)
    assert "café" in t and e == "cp1252" and s == "ok:meta"
    # undeclared valid utf-8
    t, e, s = sniff_decode("日本語".encode("utf-8"))
    assert t == "日本語" and e == "utf-8" and s == "ok:utf8"
    # undeclared non-utf8 → cp1252 fallback, total
    t, e, s = sniff_decode(b"caf\xe9 au lait")
    assert t == "café au lait" and e == "cp1252" and s == "ok:fallback"
    # lying declaration (utf-16 label on utf-8 bytes) degrades, not
    # raises
    t, e, s = sniff_decode("ok".encode("utf-8"), "utf-16")
    assert isinstance(t, str) and t  # decoded something, total


def test_utf16_bom():
    t, e, s = sniff_decode("hôtel".encode("utf-16"))  # BOM-prefixed LE
    assert t == "hôtel" and e.startswith("utf-16") and s == "ok:bom"


def test_charset_param():
    assert charset_param("text/html; charset=UTF-8") == "UTF-8"
    assert charset_param('text/html; charset="iso-8859-1"') == \
        "iso-8859-1"
    assert charset_param("text/html") is None
    assert charset_param(None) is None


def test_decode_html_plan_is_narrow(spark):
    from weakscraper_spark.operators.charset import decode_html
    df = spark.createDataFrame([(1, b"x", None)],
                               "id long, html binary, cs string")
    plan = decode_html(df, charset_col="cs")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_decode_html_spark(spark):
    rows = [
        (1, "plain utf8 ☃".encode("utf-8"), None),
        (2, "windows text café".encode("cp1252"), "windows-1252"),
        (3, None, None),
    ]
    df = spark.createDataFrame(
        rows, "id long, html binary, cs string")
    out = {r.id: r for r in
           decode_html(df, charset_col="cs").collect()}
    assert out[1].text_decoded == "plain utf8 ☃"
    assert out[2].text_decoded == "windows text café"
    assert out[2].encoding == "cp1252"
    assert out[3].status == "error:NullHtml"
    assert out[3].text_decoded is None


def test_decode_html_rejects_colliding_columns(spark):
    """Input already carrying 'status' (e.g. an ingest status row) or
    'encoding' must be a clear error — not a silent clobber, and not
    an AnalysisException deep in the stacked plan (ADVICE r04)."""
    import pytest

    from weakscraper_spark.operators.charset import decode_html
    df = spark.createDataFrame([(1, b"x", "ok")],
                               "id long, html binary, status string")
    with pytest.raises(ValueError, match="status"):
        decode_html(df)
    df2 = spark.createDataFrame([(1, b"x", "t")],
                                "id long, html binary, text_decoded string")
    with pytest.raises(ValueError, match="text_decoded"):
        decode_html(df2)


# ---------------------------------------------------------------------------
# metadata kernel (pure)
# ---------------------------------------------------------------------------

FULL_PAGE = """<html lang="en-US"><head>
<title>The  Title</title>
<meta name="description" content="a description">
<meta property="og:title" content="OG Title">
<link rel="canonical" href="https://canon.example.com/x">
</head><body><h1>First <em>Heading</em></h1><h1>Second</h1>
</body></html>"""


def test_page_metadata_fields_full():
    f = page_metadata_fields(FULL_PAGE)
    assert f == {
        "title": "The Title",
        "meta_description": "a description",
        "canonical": "https://canon.example.com/x",
        "og_title": "OG Title",
        "lang_attr": "en-US",
        "h1": "First Heading",   # first h1 wins, inline markup joined
    }


def test_page_metadata_fields_sparse_and_garbage():
    assert page_metadata_fields("<p>no head</p>") == {
        "title": None, "meta_description": None, "canonical": None,
        "og_title": None, "lang_attr": None, "h1": None}
    # total on garbage
    f = page_metadata_fields("<<<>>>\x00<title>t")
    assert isinstance(f, dict)


def test_warc_to_pages_charset_leg(spark):
    """A cp1252 body with a transport charset comes out as clean
    UTF-8 html bytes with the encoding recorded."""
    from weakscraper_spark.plans.raw_pipeline import warc_to_pages
    body = "<p>café page</p>".encode("cp1252")
    files = spark.createDataFrame(
        [("f", build_warc([
            {"type": "response", "url": "https://x.example.com/1",
             "date": "2024-05-01T00:00:00Z", "body": body,
             "http_status": 200,
             "mime": "text/html; charset=windows-1252"}]))],
        "path string, content binary")
    rows = warc_to_pages(files).collect()
    assert len(rows) == 1
    assert rows[0].encoding == "cp1252"
    assert bytes(rows[0].html).decode("utf-8") == "<p>café page</p>"


def test_raw_warc_extract_end_to_end(spark, tmp_path):
    """The full raw-crawl plan: synthesized template pages packed
    into gzip'd WARC archives on disk → binaryFile scan → record
    parse → charset decode → template extract (+fallback) →
    latest-per-url. Every template-ok row's text is BYTE-IDENTICAL
    to the synthesized ground truth (the north rule's invariant,
    end-to-end from archive bytes)."""
    from weakscraper_spark.plans.raw_pipeline import (
        build_raw_extract_plan)
    from weakscraper_spark.sources.synth import (
        compiled_specs, rows_for_index, synth_templates)
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    truth_latest: dict[str, tuple] = {}
    recs = []
    for i in range(40):
        for (url, ts, html, text, _lang) in rows_for_index(
                i, 50, 0.3, 42):
            if url not in truth_latest or ts > truth_latest[url][0]:
                truth_latest[url] = (ts, text)
            recs.append({"type": "response", "url": url,
                         "date": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                         "body": html, "http_status": 200,
                         "mime": "text/html; charset=utf-8"})
    for k in range(4):
        (wdir / f"part-{k}.warc.gz").write_bytes(build_warc(recs[k::4]))

    out = build_raw_extract_plan(spark, str(wdir),
                                 synth_templates(spark),
                                 compiled_specs()).collect()
    assert len(out) == len(truth_latest)        # one row per url
    ok = [r for r in out if r.status == "ok"]
    assert ok, "no template-extracted rows came through the raw plan"
    for r in ok:
        assert r.text == truth_latest[r.url][1], r.url
    # ground-truth-empty pages (mismatch/malformed) never fake an ok
    for r in out:
        if truth_latest[r.url][1] == "":
            assert r.status != "ok"


def test_page_metadata_spark(spark):
    df = spark.createDataFrame(
        [("u1", FULL_PAGE.encode("utf-8")), ("u2", None)],
        "url string, html binary")
    out = {r.url: r for r in page_metadata(df).collect()}
    assert out["u1"].title == "The Title"
    assert out["u1"].status == "ok"
    assert out["u2"].status == "error:NullHtml"
    plan = page_metadata(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
