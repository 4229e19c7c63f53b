"""HTML → Markdown conversion: rule fixtures, generator round-trip,
operator semantics, and plan shape.

The generator (sources/synthmd.py) constructs markdown ground truth
INDEPENDENTLY of the converter, so the round-trip here pins the
converter's rules — the repo's probe-then-pin fixture style (the
reference implements template extraction only; markdown conversion
is a brief-mandated training-pipeline extension)."""

import contextlib
import io
import re

import pytest

from weakscraper_spark.enginelib.markdown import to_markdown


# ---------------------------------------------------------------------------
# rule fixtures
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("html,want", [
    ("<h1>Title</h1>", "# Title"),
    ("<h3>a  b\n c</h3>", "### a b c"),
    ("<p>alpha <b>beta</b> gamma</p>", "alpha **beta** gamma"),
    ("<p><em>x</em></p>", "*x*"),
    ("<p><code>f(x)</code></p>", "`f(x)`"),
    ('<p><a href="/y">link text</a></p>', "[link text](/y)"),
    ('<p><a>anchor no href</a></p>', "anchor no href"),
    ('<p><img src="/i.png" alt="pic"></p>', "![pic](/i.png)"),
    ("<hr>", "---"),
    ("<blockquote><p>q</p></blockquote>", "> q"),
    ("<blockquote><p>a</p><p>b</p></blockquote>", "> a\n>\n> b"),
    ("<ul><li>a</li><li>b</li></ul>", "- a\n- b"),
    ("<ol><li>a</li><li>b</li></ol>", "1. a\n2. b"),
    # nested list: tight join, padded by the bullet width
    ("<ul><li>a<ul><li>s1</li><li>s2</li></ul></li></ul>",
     "- a\n  - s1\n  - s2"),
    ("<table><tr><th>h1</th><th>h2</th></tr>"
     "<tr><td>a</td><td>b</td></tr></table>",
     "| h1 | h2 |\n| --- | --- |\n| a | b |"),
    # pre: bytes preserved, one bounding newline trimmed, entity decoded
    ("<pre>\nline1\n    x &lt; 2\n</pre>", "```\nline1\n    x < 2\n```"),
    # inline whitespace between styled runs survives collapse
    ("<p><b>x</b> <i>y</i></p>", "**x** *y*"),
    # br inside a paragraph
    ("<p>a<br>b</p>", "a\nb"),
    # ignored subtrees vanish
    ("<p>keep</p><script>drop()</script><style>p{}</style>"
     "<template><p>drop</p></template><svg><text>drop</text></svg>",
     "keep"),
    # block tag in inline position degrades to its inline text
    ("<p>a <div>b</div> c</p>", "a b c"),
    # bare inline run in a block container → implicit paragraph
    ("<body>loose text<div><p>para</p></div></body>",
     "loose text\n\npara"),
    # structural tags outside their parents render tolerantly
    ("<td>cell text</td>", "cell text"),
    # unknown inline tags are transparent
    ("<p><span>a</span> <u>b</u></p>", "a b"),
    # empty inline markers collapse away
    ("<p>a <b></b>b</p>", "a b"),
])
def test_rule(html, want):
    assert to_markdown(html) == want


def test_full_document_skeleton():
    html = ("<html><head><title>junk</title></head><body>"
            "<h2>T</h2><p>body text</p></body></html>")
    assert to_markdown(html) == "## T\n\nbody text"


def test_never_raises_on_malformed():
    for html in ["<p>a<b>b", "<<<>>>", "</div></div>", "<table><td>x",
                 "<ul><li>a<li>b</ul>", "\x00\xff", "<pre>a"]:
        to_markdown(html)  # must not raise


# ---------------------------------------------------------------------------
# generator round-trip (plain Python — no Spark session needed)
# ---------------------------------------------------------------------------

def test_generator_roundtrip_500():
    from weakscraper_spark.sources.synthmd import render_md_page
    for i in range(500):
        html, md, n_blocks = render_md_page(f"11:{i}")
        assert to_markdown(html) == md, f"page {i}"
        assert n_blocks >= 1


def test_generator_covers_all_block_types():
    """Hash-driven choice must exercise every block generator over a
    modest page budget (else the round-trip proves less than claimed)."""
    from weakscraper_spark.sources.synthmd import render_md_page
    seen = set()
    for i in range(200):
        _, md, _ = render_md_page(f"11:{i}")
        for b in md.split("\n\n"):
            if b.startswith("#"):
                seen.add("heading")
            elif b.startswith("- "):
                seen.add("ul")
            elif b.startswith("1. "):
                seen.add("ol")
            elif b.startswith("| "):
                seen.add("table")
            elif b.startswith("```"):
                seen.add("pre")
            elif b.startswith("> "):
                seen.add("quote")
            elif b == "---":
                seen.add("hr")
            else:
                seen.add("para")
    assert seen == {"heading", "ul", "ol", "table", "pre", "quote",
                    "hr", "para"}


# ---------------------------------------------------------------------------
# operator
# ---------------------------------------------------------------------------

def test_operator_roundtrip_and_errors(spark):
    from pyspark.sql import functions as F

    from weakscraper_spark.operators.markdown import html_to_markdown
    from weakscraper_spark.sources.synthmd import synth_md_pages

    pages = synth_md_pages(spark, 60)
    out = html_to_markdown(pages)
    joined = (out.join(pages.select(
                  "url", "md",
                  F.col("n_blocks").alias("n_blocks_truth")), "url")
              .select("status", "markdown", "md", "n_blocks",
                      "n_blocks_truth", "n_bytes")
              .collect())
    assert len(joined) == 60
    for r in joined:
        assert r.status == "ok"
        assert r.markdown == r.md
        # generator-side truth, not a '\n\n' re-count — fenced blocks
        # may legally contain blank lines (r05 review / r05 advice)
        assert r.n_blocks == r.n_blocks_truth
        assert r.n_bytes > 0


def test_operator_status_rows(spark):
    import datetime as dt

    from weakscraper_spark.operators.markdown import html_to_markdown

    deep = ("<div>" * 4000) + "x"
    rows = [("u1", dt.datetime(2026, 1, 1), None),
            ("u2", dt.datetime(2026, 1, 1), deep.encode()),
            ("u3", dt.datetime(2026, 1, 1), b"")]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    got = {r.url: r for r in html_to_markdown(df).collect()}
    # str-typed html column works too (true byte count still emitted)
    sdf = spark.createDataFrame(
        [("u4", dt.datetime(2026, 1, 1), "<p>str input</p>")],
        "url string, warc_ts timestamp, html string")
    got.update({r.url: r for r in html_to_markdown(sdf).collect()})
    assert got["u1"].status == "error:NullInput"
    assert got["u2"].status == "error:RecursionError"
    assert got["u3"].status == "empty"
    assert got["u4"].status == "ok"
    assert got["u4"].markdown == "str input"
    # true byte count even for str input
    assert got["u4"].n_bytes == len("<p>str input</p>")


def test_operator_plan_is_narrow_map(spark):
    """No shuffle, single Python stage — the conversion must stay a
    narrow map (same discipline as extract/heuristic/decode)."""
    from weakscraper_spark.operators.markdown import html_to_markdown
    from weakscraper_spark.sources.synthmd import synth_md_pages

    df = html_to_markdown(synth_md_pages(spark, 10))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    names = [m.group(1) for m in
             re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)",
                         buf.getvalue(), re.M)]
    assert "Exchange" not in names, names


def test_n_blocks_ignores_blank_lines_in_fences(spark):
    """r05 review: a <pre> with a blank line is ONE block — the old
    \\n\\n count reported two."""
    df = spark.createDataFrame(
        [("u", None, "<pre>a\n\nb</pre><p>tail</p>")],
        "url string, warc_ts timestamp, html string")
    from weakscraper_spark.operators.markdown import html_to_markdown
    r = html_to_markdown(df).collect()[0]
    assert r.n_blocks == 2
    assert "```\na\n\nb\n```" in r.markdown
