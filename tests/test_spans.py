"""Capture spans (north rule: "extracted text/spans per url"):
``extract(spans=True)`` returns, per captured field, the [start, end)
character offsets of the captured ELEMENT(S) in the source html.
Exactness is pinned two ways: hand-built slices, and a corpus-wide
self-consistency sweep — every span slice must re-parse to an element
whose single text child normalizes to the captured value (atomic
captures), across ALL parity fixtures that extract ok."""

from weakscraper_spark.enginelib.dom import is_text, parse_html
from weakscraper_spark.enginelib.match import extract
from weakscraper_spark.enginelib.scraper import TemplateScraper
from weakscraper_spark.enginelib.spec import compile_template
from weakscraper_spark.enginelib.textnorm import normalize_text

from fixtures.corpus import FIXTURES


def test_span_slices_exact_scalar_list_attrs():
    html = ('<div class="a"><h1>The Title</h1>'
            '<ul><li>one</li><li>two</li></ul></div>')
    tpl = ('<div class="a" wp-name-attrs="da"><h1 wp-name="title">x'
           '</h1><ul><li wp-list wp-name="items">x</li></ul></div>')
    r = extract(compile_template(tpl), html, spans=True)
    assert r["status"] == "ok"
    sp = r["spans"]
    assert html[slice(*sp["title"][0])] == "<h1>The Title</h1>"
    assert [html[slice(*s)] for s in sp["items"]] == \
        ["<li>one</li>", "<li>two</li>"]
    assert html[slice(*sp["da"][0])] == html  # the whole div element


def test_span_end_ignores_quoted_gt_in_attrs():
    """r04 review: '>' inside a quoted attribute value must not
    terminate a void element's span."""
    html = '<div><img title="a>b" src="s"><p>tail</p></div>'
    tpl = ('<div><img title="a>b" src="s" wp-name-attrs="m">'
           '<p wp-name="t">x</p></div>')
    r = extract(compile_template(tpl), html, spans=True)
    assert r["status"] == "ok"
    a, b = r["spans"]["m"][0]
    assert html[a:b] == '<img title="a>b" src="s">'


def test_spans_off_by_default_and_none_on_mismatch():
    s = TemplateScraper('<h1 wp-name="t">x</h1>')
    assert "spans" not in s.extract("<h1>A</h1>")
    r = s.extract("<h2>A</h2>", spans=True)
    assert r["status"].startswith("mismatch") and r["spans"] is None


def _flat_scalar_values(fields, out=None):
    """name → list of scalar string values, flattening list captures
    (list of str) so they align with the span lists."""
    out = {} if out is None else out
    for k, v in fields.items():
        if isinstance(v, str):
            out.setdefault(k, []).append(v)
        elif isinstance(v, list):
            for item in v:
                if isinstance(item, str):
                    out.setdefault(k, []).append(item)
                elif isinstance(item, dict):
                    _flat_scalar_values(item, out)
    return out


def test_spans_self_consistent_across_parity_corpus():
    """For every ok-extracting parity fixture: each span slice is a
    well-formed element; where a field is an atomic text capture, the
    slice's re-parsed single text child normalizes to exactly the
    captured value. Fields transformed by wp-function and recursive/
    nugget captures are checked only for well-formed slices."""
    checked = 0
    for fx in FIXTURES:
        tpl = compile_template(fx["template"])
        r = extract(tpl, fx["page"], spans=True)
        if r["status"] != "ok" or not r["spans"]:
            continue
        html = fx["page"]
        values = _flat_scalar_values(r["fields"])
        for name, span_list in r["spans"].items():
            for i, (a, b) in enumerate(span_list):
                piece = html[a:b]
                assert piece.startswith("<") and piece.endswith(">"), \
                    (fx["fixture_id"], name, piece)
                node = parse_html(piece)["children"]
                assert node, (fx["fixture_id"], name, piece)
                kids = node[0].get("children", [])
                if (name in values and len(span_list) ==
                        len(values[name]) and len(kids) == 1
                        and is_text(kids[0])):
                    got = normalize_text(kids[0]["content"])
                    want = values[name][i]
                    # wp-function may transform the raw text — only
                    # untransformed captures must round-trip exactly
                    if got == want:
                        checked += 1
    assert checked >= 10  # the sweep really exercised atomic captures


def test_extract_pages_spans_column(spark):
    from weakscraper_spark.operators.extract import extract_pages
    from weakscraper_spark.plans.pipeline import (
        attach_template, prepare_pages)
    from weakscraper_spark.sources.synth import (
        compiled_specs, synth_pages, synth_templates)
    import json
    pages = synth_pages(spark, 40)
    staged = attach_template(prepare_pages(pages),
                             synth_templates(spark))
    out = extract_pages(staged, compiled_specs(), spans=True)
    assert "spans_json" in out.columns
    rows = out.filter("status = 'ok'").collect()
    assert rows
    truth = {(r.url, r.warc_ts): bytes(r.html).decode("utf-8")
             for r in pages.collect()}
    n_span_checks = 0
    for r in rows[:25]:
        sp = json.loads(r.spans_json)
        assert sp, r.url
        html = truth[(r.url, r.warc_ts)]
        for name, span_list in sp.items():
            for a, b in span_list:
                piece = html[a:b]
                assert piece.startswith("<") and piece.endswith(">")
                n_span_checks += 1
    assert n_span_checks > 25
    # plain path unchanged
    plain = extract_pages(staged, compiled_specs())
    assert "spans_json" not in plain.columns


def test_heuristic_main_text_span_covers_content_block():
    """Boiler spans (north rule's heuristic leg): the selected content
    block's covering span re-segments to exactly the extracted text;
    plain calls don't pay for or carry spans."""
    from weakscraper_spark.enginelib.boiler import main_text, segment_blocks

    html = ('<html><body><nav><a href="/">home</a> <a href="/x">x</a>'
            '</nav><p>The long main paragraph with comfortably more '
            'than forty individual words of real sentence content '
            'so that the published decision rule for a block that '
            'follows a high link density navigation block still '
            'classifies this text as content rather than boilerplate '
            'for the classifier.</p><footer><a href="/c">c</a>'
            '</footer></body></html>')
    r = main_text(html, mode="largest", spans=True)
    assert r["text"].startswith("The long main paragraph")
    (a, b), = r["spans"]
    piece = html[a:b]
    reseg = segment_blocks(piece)
    assert " ".join(f.text for f in reseg) == r["text"]
    assert "spans" not in main_text(html, mode="largest")


def test_heuristic_block_spans_self_consistent_across_corpus():
    """Corpus-wide sweep (same discipline as the template-span sweep,
    extended per VERDICT r04 #5): for EVERY block of every parity
    fixture page — plus adversarial pages with entities, comments,
    unclosed scripts, and inline markup — re-segmenting the block's
    covering slice reproduces the block text byte-for-byte."""
    from weakscraper_spark.enginelib.boiler import segment_blocks

    adversarial = [
        '<p>a &amp; b<!-- c --> <b>d</b></p><div>tail &#65; end</div>',
        '<p>pre<script>var x = "</p>";</script>post</p>',
        'no markup at all, just loose top-level text with words',
        '<ul><li>one one</li>\n<li><a href="/">two</a> three</li></ul>',
        '<div>multi\nline\ntext block</div><p>x &lt;y&gt; z</p>',
    ]
    pages = [fx["page"] for fx in FIXTURES] + adversarial
    checked = 0
    for html in pages:
        for blk in segment_blocks(html, spans=True):
            assert blk.span is not None, html[:60]
            a, b = blk.span
            reseg = segment_blocks(html[a:b])
            assert " ".join(f.text for f in reseg) == blk.text, \
                (html[:60], blk.span, html[a:b])
            checked += 1
    assert checked >= 30


def test_heuristic_fallback_rows_carry_spans(spark):
    """extract_pages(fallback='heuristic', spans=True): rescued rows
    get a _main_text covering span that re-segments to the extracted
    text — both extractors now satisfy the text/spans contract."""
    import json

    from weakscraper_spark.operators.extract import extract_pages
    from weakscraper_spark.plans.pipeline import (
        attach_template, prepare_pages)
    from weakscraper_spark.sources.synth import synth_pages, \
        synth_templates
    from weakscraper_spark.enginelib.boiler import segment_blocks

    pages = synth_pages(spark, 30, min_words=48)
    staged = attach_template(prepare_pages(pages),
                             synth_templates(spark))
    # NO compiled specs registered → every row falls back
    out = extract_pages(staged, {}, fallback="heuristic", spans=True)
    rows = out.filter("status = 'ok_heuristic'").collect()
    assert rows
    truth = {(r.url, r.warc_ts): bytes(r.html).decode("utf-8")
             for r in pages.collect()}
    for r in rows[:15]:
        sp = json.loads(r.spans_json)
        assert list(sp.keys()) == ["_main_text"]
        html = truth[(r.url, r.warc_ts)]
        (a, b), = sp["_main_text"]
        reseg = segment_blocks(html[a:b])
        assert " ".join(f.text for f in reseg) == r.text
