"""RSS/Atom feed ingestion: field mapping, format tolerances,
header metadata, and plan shape (narrow map, zero shuffle)."""

import contextlib
import io
import re

import pytest

from weakscraper_spark.operators.feeds import feed_meta, parse_feeds

_RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Site News</title>
<link>https://news.example.org/</link>
<item>
  <title><![CDATA[Post <1> & done]]></title>
  <link>https://news.example.org/p/1?a=1&amp;b=2</link>
  <guid isPermaLink="false">urn:post:1</guid>
  <pubDate>Thu, 05 Mar 2026 10:00:00 GMT</pubDate>
  <description>First &amp; foremost</description>
</item>
<ITEM>
  <TITLE>Upper case tags</TITLE>
  <LINK>https://news.example.org/p/2</LINK>
</ITEM>
<item>
  <description>no link no guid - dropped</description>
</item>
</channel></rss>"""

_ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>Atom Blog</title>
<link rel="self" href="https://blog.example.org/feed.xml"/>
<link rel="alternate" href="https://blog.example.org/"/>
<entry>
  <title>Entry one</title>
  <id>tag:blog,2026:e1</id>
  <link rel="self" href="https://blog.example.org/e1.xml"/>
  <link rel="alternate" href="https://blog.example.org/e1?x=1&amp;y=2"/>
  <published>2026-03-05T10:00:00Z</published>
  <summary>S1</summary>
</entry>
<entry>
  <title>Entry two</title>
  <id>tag:blog,2026:e2</id>
  <link href="https://blog.example.org/e2"/>
  <updated>2026-03-06T00:00:00Z</updated>
  <content>C2 body</content>
</entry>
</feed>"""


@pytest.fixture(scope="module")
def feed_df(spark):
    return spark.createDataFrame(
        [("https://news.example.org/rss.xml", _RSS),
         ("https://blog.example.org/feed.xml", _ATOM)],
        "url string, xml string")


def test_rss_fields(feed_df):
    rows = {r.entry_id or r.link: r
            for r in parse_feeds(feed_df).filter("kind = 'rss'").collect()}
    assert len(rows) == 2  # the link-less guid-less item is dropped
    r1 = rows["urn:post:1"]
    assert r1.feed_url == "https://news.example.org/rss.xml"
    assert r1.title == "Post <1> & done"          # CDATA literal
    assert r1.link == "https://news.example.org/p/1?a=1&b=2"  # decoded
    assert r1.published == "Thu, 05 Mar 2026 10:00:00 GMT"
    assert r1.summary == "First & foremost"
    r2 = rows["https://news.example.org/p/2"]
    assert r2.title == "Upper case tags"
    assert r2.entry_id is None and r2.published is None


def test_atom_fields(feed_df):
    rows = {r.entry_id: r
            for r in parse_feeds(feed_df).filter("kind = 'atom'").collect()}
    assert len(rows) == 2
    e1 = rows["tag:blog,2026:e1"]
    # rel="alternate" wins over rel="self"; href entity-decoded
    assert e1.link == "https://blog.example.org/e1?x=1&y=2"
    assert e1.published == "2026-03-05T10:00:00Z"
    assert e1.summary == "S1"
    e2 = rows["tag:blog,2026:e2"]
    assert e2.link == "https://blog.example.org/e2"   # bare link
    assert e2.published == "2026-03-06T00:00:00Z"     # updated fallback
    assert e2.summary == "C2 body"                    # content fallback


def test_feed_meta(feed_df):
    rows = {r.feed_url: r for r in feed_meta(feed_df).collect()}
    rss = rows["https://news.example.org/rss.xml"]
    # entry blocks stripped first: channel title/link, not an item's
    assert rss.kind == "rss"
    assert rss.title == "Site News"
    assert rss.site_link == "https://news.example.org/"
    atom = rows["https://blog.example.org/feed.xml"]
    assert atom.kind == "atom"
    assert atom.title == "Atom Blog"
    assert atom.site_link == "https://blog.example.org/"


def test_not_a_feed(spark):
    df = spark.createDataFrame(
        [("https://x.org/page.html", "<html><body>hi</body></html>")],
        "url string, xml string")
    assert parse_feeds(df).count() == 0
    meta = feed_meta(df).collect()[0]
    assert meta.kind is None


def test_binary_xml_column(spark):
    df = spark.createDataFrame(
        [("u", _ATOM.encode("utf-8"))], "url string, xml binary")
    assert parse_feeds(df).count() == 2


def test_plan_is_narrow_map(feed_df):
    df = parse_feeds(feed_df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    names = [m.group(1) for m in
             re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)",
                         buf.getvalue(), re.M)]
    assert "Exchange" not in names, names
    assert "BatchEvalPython" not in names, names
    assert "ArrowEvalPython" not in names, names


_PAGE_WITH_FEEDS = """<html><head>
<base href="https://blog.example.org/posts/page.html">
<link rel="alternate" type="application/rss+xml"
      title="Main &amp; More" href="/feed.xml">
<link rel="alternate" type="application/atom+xml" href="atom.xml">
<link rel="ALTERNATE" TYPE="application/rss+xml"
      href="https://other.example.org/r.xml">
<link rel="stylesheet" type="text/css" href="/style.css">
<link rel="self" type="application/rss+xml" href="/not-alternate.xml">
<link rel="alternate" type="application/rss+xml">
</head><body><a href="x">not a link tag</a></body></html>"""


def test_discover_feeds(spark):
    from weakscraper_spark.operators.feeds import discover_feeds
    df = spark.createDataFrame(
        [("https://blog.example.org/", _PAGE_WITH_FEEDS),
         ("https://plain.example.org/", "<html><p>none</p></html>")],
        "url string, html string")
    got = {(r.feed_url): (r.feed_kind, r.feed_title)
           for r in discover_feeds(df).collect()}
    # absolute kept; "/feed.xml" joins the page ORIGIN; bare
    # "atom.xml" resolves against <base href>'s directory
    assert got == {
        "https://blog.example.org/feed.xml": ("rss", "Main & More"),
        "https://blog.example.org/posts/atom.xml": ("atom", None),
        "https://other.example.org/r.xml": ("rss", None),
    }


def test_discover_feeds_relative_base(spark):
    """A RELATIVE <base href> (legal per WHATWG) must first resolve
    against the page url before it becomes the resolution base —
    feeding the raw '/x/' into resolve_href as a base produced
    '://…' garbage feed urls (r05 advice)."""
    from weakscraper_spark.operators.feeds import discover_feeds
    page = ('<html><head><base href="/x/">'
            '<link rel="alternate" type="application/rss+xml" '
            'href="feed.xml"></head><body></body></html>')
    df = spark.createDataFrame(
        [("https://blog.example.org/posts/2024/a.html", page)],
        "url string, html string")
    [r] = discover_feeds(df).collect()
    assert r.feed_url == "https://blog.example.org/x/feed.xml"


def test_discover_feeds_plan_narrow(spark):
    from weakscraper_spark.operators.feeds import discover_feeds
    df = spark.createDataFrame(
        [("u", _PAGE_WITH_FEEDS)], "url string, html string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        discover_feeds(df).explain("formatted")
    names = [m.group(1) for m in
             re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)",
                         buf.getvalue(), re.M)]
    assert "Exchange" not in names, names
    assert "ArrowEvalPython" not in names, names
