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


def test_robots_canonical_unquoted_and_attacks_probe_ring(spark):
    """r07 adversarial probe ring, pinned. Bug found: quoted-only
    attribute matching dropped the opt-out of valid-HTML unquoted
    forms (<meta name=robots content=noindex>). Attacks stay
    rejected; spec-exact pin: '/' is part of an HTML5 bare attribute
    value, so content=noindex/> is the value 'noindex/' (no match),
    while a quoted "noindex"/> still matches."""
    from weakscraper_spark.operators.metadata import (
        canonical_target, robots_meta_flags)
    pages = [
        ("u1", '<meta name=robots content=noindex>', True, False),
        ("u2", '<META NAME=ROBOTS CONTENT="NOINDEX, NOFOLLOW">',
         True, True),
        ("u3", '<meta name=robots content="none">', True, True),
        ("a1", '<meta name=robotsx content=noindex>', False, False),
        ("a2", '<meta x-name="robots" content="noindex">',
         False, False),
        ("a3", '<meta content="name=robots noindex">', False, False),
        ("a5", '<meta name="robots2" content="noindex">',
         False, False),
        # exact-value pin: metadata names compare whole-string, a
        # space-padded " robots " is a different name
        ("w1", '<meta name=" robots " content="noindex">',
         False, False),
        ("s1", '<meta name=robots content=noindex/>', False, False),
        ("s2", '<meta name=robots content="noindex"/>', True, False),
    ]
    df = spark.createDataFrame(
        [(i, f"https://h.example/{i}", h) for i, h, _, _ in pages],
        "id string, url string, html string")
    got = {r["id"]: (r["noindex"], r["nofollow"])
           for r in robots_meta_flags(df).collect()}
    for i, _, noindex, nofollow in pages:
        assert got[i] == (noindex, nofollow), i

    links = [
        ("c1", '<link rel=canonical href="https://good.example/c1">',
         "https://good.example/c1"),
        ("c2", '<link data-rel="canonical" href="https://e.example/">',
         "https://h.example/c2"),
        ("c3", '<link rel=canonicalx href="https://e.example/">',
         "https://h.example/c3"),
        ("c4", '<link title="rel=canonical" href="https://e.example/">',
         "https://h.example/c4"),
    ]
    df2 = spark.createDataFrame(
        [(i, f"https://h.example/{i}", h) for i, h, _ in links],
        "id string, url string, html string")
    got2 = {r["id"]: r["canonical_url"]
            for r in canonical_target(df2).collect()}
    for i, _, want in links:
        assert got2[i] == want, i
