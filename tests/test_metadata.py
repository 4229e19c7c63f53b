"""Scan-tier page-policy directives (r06): robots-meta
noindex/nofollow flags and canonical-link resolution/dedup — the
corpus-gating half of head metadata (the Python `page_metadata`
parser has its own ring in test_raw_pipeline)."""

# ---------------------------------------------------------------------------
# scan-tier page-policy directives (r06)
# ---------------------------------------------------------------------------

def test_robots_meta_flags(spark):
    from weakscraper_spark.operators.metadata import robots_meta_flags
    cases = [
        ("a", '<meta name="robots" content="noindex, follow">',
         True, False),
        # attribute order swapped + upper case
        ("b", '<META CONTENT="NOFOLLOW" NAME="robots">', False, True),
        ("c", '<meta name="robots" content="none">', True, True),
        ("d", '<meta name="robots" content="index, follow">',
         False, False),
        ("e", "", False, False),
        # token must be exact: 'index' is not 'noindex'; a
        # description meta mentioning noindex is not a directive
        ("f", '<meta name="description" content="noindex tips">',
         False, False),
        ("g", '<meta name="robots" content="max-snippet:-1,noindex">',
         True, False),
        # MULTIPLE robots metas combine, most restrictive wins (a CMS
        # tag + an SEO-plugin tag is the common real-world pair)
        ("h", '<meta name="robots" content="max-image-preview:large">'
              '<meta name="robots" content="noindex">', True, False),
        # attr-shadowing attempts (r06 review): x-content- prefixed
        # attr and a quoted value containing content= must not count
        ("i", '<meta name="robots" x-content="noindex">',
         False, False),
        ("j", '<meta data-x="content=\'none\'" name="robots" '
              'content="index">', False, False),
    ]
    df = spark.createDataFrame(
        [(u, f"<html><head>{m}</head><body></body></html>")
         for u, m, _, _ in cases], "url string, html string")
    got = {r.url: (r.noindex, r.nofollow)
           for r in robots_meta_flags(df).collect()}
    for u, _, ni, nf in cases:
        assert got[u] == (ni, nf), u


def test_canonical_target_resolution(spark):
    from weakscraper_spark.operators.metadata import canonical_target
    page = "https://site.example.org/p/a/1.html"
    cases = [
        ("abs", '<link rel="canonical" href="https://x.org/c?a=1&amp;b=2">',
         "https://x.org/c?a=1&b=2"),
        ("root", '<link href="/c" rel="canonical">',
         "https://site.example.org/c"),
        ("rel", '<link rel="canonical" href="c2">',
         "https://site.example.org/p/a/c2"),
        ("base", '<base href="/x/"><link rel="canonical" href="c3">',
         "https://site.example.org/x/c3"),
        ("none", "", page),
        # alternate link must not leak through
        ("alt", '<link rel="alternate" href="/alt">', page),
        # data-href must not shadow the real href (r06 review), and
        # stray attribute whitespace is trimmed
        ("shadow", '<link rel="canonical" data-href="https://evil/x"'
                   ' href="https://good/y">', "https://good/y"),
        ("ws", '<link rel="canonical" href=" /c/1 ">',
         "https://site.example.org/c/1"),
        # entity-escaped BASE href decodes before resolution
        ("entbase", '<base href="/x/?a=1&amp;b=2">'
                    '<link rel="canonical" href="c9">',
         "https://site.example.org/x/c9"),
    ]
    df = spark.createDataFrame(
        [(k, page, f"<html><head>{m}</head></html>")
         for k, m, _ in cases], "k string, url string, html string")
    got = {r.k: r.canonical_url
           for r in canonical_target(df).collect()}
    for k, _, want in cases:
        assert got[k] == want, (k, got[k], want)


def test_canonical_dedup_groups(spark):
    from weakscraper_spark.operators.metadata import canonical_dedup
    mk = ('<link rel="canonical" href="https://x.org/one">')
    df = spark.createDataFrame(
        [("https://a.org/1", f"<html><head>{mk}</head></html>"),
         ("https://b.org/2", f"<html><head>{mk}</head></html>"),
         ("https://x.org/one", "<html><head></head></html>"),
         ("https://c.org/solo", "<html><head></head></html>")],
        "url string, html string")
    got = {r.canonical_url: r for r in canonical_dedup(df).collect()}
    g = got["https://x.org/one"]
    assert g.n_pages == 3 and g.n_self == 1
    assert g.first_url == "https://a.org/1"
    assert got["https://c.org/solo"].n_self == 1
