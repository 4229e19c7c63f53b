"""RSS 2.0 / Atom feed ingestion — the second crawl-tier discovery
source next to sitemaps (operators/sitemap.py): ``<item>`` /
``<entry>`` blocks parsed into frontier rows (entry id, link, title,
published, summary) that feed ``crawl_schedule`` /
``url_quality_filter``, plus per-feed header metadata.

Reference parity note: the weakscraper reference is a per-page
extraction library with no crawl tier (SURVEY §1); feed discovery
belongs to the web-pipeline family the build brief adds as
first-class scope, alongside robots/sitemap/urlnorm/links.

Scale shape: the ``parse_sitemaps`` discipline — a pure NARROW map.
Both block kinds are materialized as ONE tagged array column per
feed (Catalyst does not CSE inside lambda bodies), a single explode
fans out to per-entry rows, and every field extract runs on the slim
block string. Nothing leaves the JVM and nothing shuffles; the xml
column never crosses a stage boundary.

Format tolerances, all exercised in tests: mixed-case tags, CDATA
titles/descriptions, entity-escaped urls (in element text AND in
Atom ``href`` attribute values — both decode), ``<guid>`` attributes
(isPermaLink), multiple Atom ``<link>`` tags with the
rel="alternate"-or-bare preference rule, ``<published>`` falling back
to ``<updated>``, and missing optional fields (NULL, not '')."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .sitemap import _tag_text, decode_predefined_entities

#: one <item>…</item> of an RSS 2.0 channel
_ITEM_BLOCK_RE = r"(?is)<item[\s>].*?</item\s*>"
#: one <entry>…</entry> of an Atom feed
_ENTRY_BLOCK_RE = r"(?is)<entry[\s>].*?</entry\s*>"
#: any <link …> tag (Atom links carry the url in the href ATTRIBUTE)
_LINK_TAG_RE = r"(?is)<link\b[^>]*>"


#: r05 review: one shared entity decoder (sitemap.py) for all three
#: markup scanners
_decode_entities = decode_predefined_entities


def _atom_link(block: Column) -> Column:
    """The entry's alternate link: among the block's ``<link>`` tags
    prefer ``rel="alternate"``, else a tag with no ``rel`` at all
    (the Atom default), else NULL. Attribute values are entity-decoded
    (feeds MUST escape & inside href)."""
    links = F.regexp_extract_all(block, F.lit(_LINK_TAG_RE), 0)
    alt = F.filter(
        links, lambda t: t.rlike(r'(?is)rel\s*=\s*["\']alternate["\']'))
    bare = F.filter(links, lambda t: ~t.rlike(r"(?is)\brel\s*="))
    # F.get, not element_at: ANSI mode raises on an empty array,
    # get returns NULL (0-indexed).
    pick = F.coalesce(F.get(alt, 0), F.get(bare, 0))
    href = F.regexp_extract(pick, r'(?is)href\s*=\s*["\']([^"\']*)["\']', 1)
    return F.nullif(_decode_entities(href), F.lit(""))


def parse_feeds(df: DataFrame, xml_col: str = "xml",
                url_col: str = "url") -> DataFrame:
    """feed documents → one row per entry:

    (feed_url, kind, entry_id, link, title, published, summary)

    ``kind`` is ``'rss'`` for ``<item>`` blocks and ``'atom'`` for
    ``<entry>`` blocks (a document carrying both — nonconforming but
    seen in the wild — yields both). Field mapping:

    - entry_id:  RSS ``<guid>`` (attributes tolerated) / Atom ``<id>``
    - link:      RSS ``<link>`` element text / Atom ``<link href>``
                 with the rel="alternate"-or-bare preference
    - published: RSS ``<pubDate>`` / Atom ``<published>`` falling back
                 to ``<updated>`` — kept as STRINGS (RFC 822 vs RFC
                 3339; parsing to a type is the caller's policy, the
                 ``lastmod`` rule from parse_sitemaps)
    - summary:   RSS ``<description>`` / Atom ``<summary>`` falling
                 back to ``<content>``

    Entries with neither link nor entry_id are dropped — they identify
    nothing fetchable."""
    from .fanout import fan_out
    df = fan_out(df.select(url_col, xml_col))
    xml = F.col(xml_col)
    if dict(df.dtypes)[xml_col] == "binary":
        xml = xml.cast("string")
    entries = F.concat(
        F.transform(
            F.regexp_extract_all(xml, F.lit(_ITEM_BLOCK_RE), 0),
            lambda b: F.struct(F.lit("rss").alias("kind"),
                               b.alias("block"))),
        F.transform(
            F.regexp_extract_all(xml, F.lit(_ENTRY_BLOCK_RE), 0),
            lambda b: F.struct(F.lit("atom").alias("kind"),
                               b.alias("block"))))
    rows = df.select(F.col(url_col).alias("feed_url"),
                     F.explode(entries).alias("_e"))
    block = F.col("_e.block")
    kind = F.col("_e.kind")
    is_rss = kind == "rss"
    out = rows.select(
        "feed_url", kind.alias("kind"),
        F.when(is_rss, _tag_text(block, "guid"))
         .otherwise(_tag_text(block, "id")).alias("entry_id"),
        F.when(is_rss, _tag_text(block, "link"))
         .otherwise(_atom_link(block)).alias("link"),
        _tag_text(block, "title").alias("title"),
        F.when(is_rss, _tag_text(block, "pubDate"))
         .otherwise(F.coalesce(_tag_text(block, "published"),
                               _tag_text(block, "updated")))
         .alias("published"),
        F.when(is_rss, _tag_text(block, "description"))
         .otherwise(F.coalesce(_tag_text(block, "summary"),
                               _tag_text(block, "content")))
         .alias("summary"))
    return out.filter(F.col("link").isNotNull() |
                      F.col("entry_id").isNotNull())


def feed_meta(df: DataFrame, xml_col: str = "xml",
              url_col: str = "url") -> DataFrame:
    """Per-feed header metadata: (feed_url, kind, title, site_link) —
    ``kind`` is 'rss' / 'atom' / NULL (not a recognized feed). The
    entry blocks are stripped FIRST so an entry's title/link can never
    shadow the channel's. Narrow map, same discipline as above."""
    xml = F.col(xml_col)
    if dict(df.dtypes)[xml_col] == "binary":
        xml = xml.cast("string")
    hdr = F.regexp_replace(
        F.regexp_replace(xml, _ITEM_BLOCK_RE, ""), _ENTRY_BLOCK_RE, "")
    kind = (F.when(hdr.rlike(r"(?is)<rss[\s>]|<channel[\s>]"), "rss")
            .when(hdr.rlike(r"(?is)<feed[\s>]"), "atom"))
    return df.select(
        F.col(url_col).alias("feed_url"),
        kind.alias("kind"),
        _tag_text(hdr, "title").alias("title"),
        F.when(kind == "rss", _tag_text(hdr, "link"))
         .when(kind == "atom", _atom_link(hdr))
         .alias("site_link"))


#: any <link …> tag in the page head carrying a feed MIME type
_FEED_TYPE_RE = (r'(?is)type\s*=\s*["\']application/'
                 r'(?:rss|atom)\+xml["\']')


def discover_feeds(df: DataFrame, html_col: str = "html",
                   url_col: str = "url") -> DataFrame:
    """Feed AUTODISCOVERY (RSS Board / WHATWG convention): pages →
    (page_url, feed_url, feed_kind, feed_title) from
    ``<link rel="alternate" type="application/rss+xml|atom+xml"
    href=…>`` in the markup — the hand-off that closes the discovery
    loop: crawl → discover_feeds → fetch → ``parse_feeds`` →
    frontier. Relative hrefs are resolved against the page url via
    the links-family resolver (<base href> honored).

    Narrow map, the house discipline: one corpus-width scan
    materializes the page's <link> tags as an array, per-tag filters
    and extracts run on slim tag strings; entity decode on href
    (pages must escape & in attributes). Tags without an href, or
    without the feed MIME type, contribute nothing; rel=alternate is
    required (a rel="self" stylesheet link must not leak through)."""
    from .fanout import fan_out
    from .links import attr_value, page_base, resolve_href

    df = fan_out(df.select(url_col, html_col))
    html = F.col(html_col)
    if dict(df.dtypes)[html_col] == "binary":
        html = html.cast("string")
    tags = F.filter(
        F.regexp_extract_all(html, F.lit(_LINK_TAG_RE), 0),
        lambda t: t.rlike(_FEED_TYPE_RE) &
        t.rlike(r'(?is)rel\s*=\s*["\']alternate["\']'))
    # resolution base via the shared helper (r05 advice: a relative
    # <base href> resolves against the page url first; r06 review:
    # one implementation, not three drifting copies)
    rows = df.select(
        F.col(url_col).alias("page_url"),
        page_base(html, F.col(url_col)).alias("_base"),
        F.explode(tags).alias("_t"))
    # whitespace-anchored attribute extraction (r06 review: a bare
    # 'href=' substring match let data-href shadow the real one)
    href = F.nullif(_decode_entities(attr_value(F.col("_t"), "href")),
                    F.lit(""))
    kind = F.when(
        F.col("_t").rlike(r"(?is)application/rss\+xml"), "rss"
    ).otherwise("atom")
    title = F.nullif(
        _decode_entities(attr_value(F.col("_t"), "title")),
        F.lit(""))
    return (rows
            .select("page_url",
                    resolve_href(F.col("_base"), href).alias("feed_url"),
                    kind.alias("feed_kind"),
                    title.alias("feed_title"))
            .filter(F.col("feed_url").isNotNull()))
