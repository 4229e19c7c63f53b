"""Sitemap ingestion: urlset/sitemapindex parsing tolerances and the
narrow-map plan shape."""

import pytest

from weakscraper_spark.operators.sitemap import parse_sitemaps

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example/one</loc>
    <lastmod>2025-03-04</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <URL>
    <LOC>  <![CDATA[https://a.example/two?cdata=literal&amp;]]>  </LOC>
    <PRIORITY>bogus</PRIORITY>
  </URL>
  <url data-x="1">
    <loc>https://a.example/three?x=1&amp;y=2</loc></url>
  <url><lastmod>2025-01-01</lastmod></url>
</urlset>"""

_INDEX = """<sitemapindex>
  <sitemap><loc>https://a.example/maps/1.xml</loc>
    <lastmod>2025-02-03T04:05:06Z</lastmod></sitemap>
  <SiteMap><loc>https://a.example/maps/2.xml</loc></SiteMap>
</sitemapindex>"""


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        [("https://a.example/sitemap.xml", _URLSET),
         ("https://a.example/sitemap_index.xml", _INDEX)],
        "url string, xml string")
    return parse_sitemaps(df).collect()


def test_urlset_entries(parsed):
    urls = {r.loc: r for r in parsed if r.kind == "url"}
    # loc-less 4th entry dropped; CDATA stays literal (no entity
    # decode), plain text gets &amp; decoded
    assert set(urls) == {"https://a.example/one",
                         "https://a.example/two?cdata=literal&amp;",
                         "https://a.example/three?x=1&y=2"}
    one = urls["https://a.example/one"]
    assert (one.lastmod, one.changefreq, one.priority) == \
        ("2025-03-04", "daily", 0.8)
    # mixed-case tags + CDATA unwrap + non-numeric priority -> NULL
    two = urls["https://a.example/two?cdata=literal&amp;"]
    assert two.lastmod is None and two.priority is None
    # attributes on <url>; absent optional fields are NULL
    three = urls["https://a.example/three?x=1&y=2"]
    assert (three.lastmod, three.changefreq, three.priority) == \
        (None, None, None)


def test_index_children(parsed):
    idx = sorted((r.loc, r.lastmod) for r in parsed
                 if r.kind == "sitemap")
    assert idx == [("https://a.example/maps/1.xml",
                    "2025-02-03T04:05:06Z"),
                   ("https://a.example/maps/2.xml", None)]
    assert all(r.sitemap_url == "https://a.example/sitemap_index.xml"
               for r in parsed if r.kind == "sitemap")


def test_binary_xml_column(spark):
    df = spark.createDataFrame(
        [("u", _URLSET.encode())], "url string, xml binary")
    assert sum(r.kind == "url"
               for r in parse_sitemaps(df).collect()) == 3


def test_no_shuffle_plan(spark):
    df = spark.createDataFrame([("u", _URLSET)],
                               "url string, xml string")
    plan = parse_sitemaps(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_sitemap_urls_from_robots(spark):
    from weakscraper_spark.operators.sitemap import sitemap_urls
    txt_a = ("# robots\nUser-agent: *\nDisallow: /x\n"
             "Sitemap: https://a.example/s1.xml\n"
             "  SITEMAP:https://a.example/s2.xml trailing comment\n")
    txt_b = "User-agent: *\nAllow: /\n"      # no directive
    df = spark.createDataFrame(
        [("a.example", txt_a), ("b.example", txt_b)],
        "host string, robots_txt string")
    out = sorted((r.host, r.sitemap_url)
                 for r in sitemap_urls(df).collect())
    # case-insensitive, leading ws, multiple per file, value stops
    # at whitespace; hosts without a directive emit nothing
    assert out == [("a.example", "https://a.example/s1.xml"),
                   ("a.example", "https://a.example/s2.xml")]
