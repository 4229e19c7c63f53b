"""Property-based ring (hypothesis, no Spark): the executor-safety
contract — ``extract`` must NEVER raise, for ANY input document — and
determinism/round-trip invariants. These are the properties that keep
one hostile page from failing a 100 TB job's Arrow batch."""

from hypothesis import given, settings, strategies as st

from weakscraper_spark.enginelib import (
    TemplateScraper, spec_from_json, spec_to_json)
from weakscraper_spark.enginelib.dom import parse_html, serialize_node
from weakscraper_spark.enginelib.match import extract
from weakscraper_spark.enginelib.textnorm import normalize_text
from weakscraper_spark.sources.synth import (
    SITE_TEMPLATES, make_slots, render_page)

SCRAPER = TemplateScraper(
    '<html><body><h1 wp-name="t">x</h1>'
    '<ul><li wp-list wp-name="xs">i</li></ul>'
    '<div wp-recursive wp-name="r">x</div><wp-ignore/></body></html>')


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=2000))
def test_extract_never_raises_on_arbitrary_text(doc):
    row = SCRAPER.extract(doc)
    assert row["status"] == "ok" or row["status"].startswith("mismatch:")
    assert isinstance(row["n_nodes"], int)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>/=\"' abceihlmtu&#;!-", max_size=400))
def test_parse_never_raises_on_taggy_garbage(doc):
    root = parse_html(doc)
    assert root["nodetype"] == "tag"
    # serialization of whatever tree came out must also never raise
    serialize_node(root)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once
    assert "  " not in once and once == once.strip()


@settings(max_examples=100, deadline=None)
@given(st.sampled_from(sorted(SITE_TEMPLATES)), st.integers(0, 10**9))
def test_render_extract_roundtrip(tid, seed):
    """Any rendered page of a site template extracts ok and recovers
    the main text byte-identically (the pipeline invariant, fuzzed
    over the slot-value space)."""
    slots = make_slots(tid, f"prop:{seed}")
    html, truth = render_page(tid, slots)
    scraper = TemplateScraper(SITE_TEMPLATES[tid])
    row = scraper.extract(html)
    assert row["status"] == "ok", row["error"]
    assert row["text"] == truth


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 10**9))
def test_spec_json_roundtrip_stable(seed):
    tid = sorted(SITE_TEMPLATES)[seed % 3]
    scraper = TemplateScraper(SITE_TEMPLATES[tid])
    js = spec_to_json(scraper.spec)
    assert spec_to_json(spec_from_json(js)) == js  # canonical fixpoint


def test_deep_nesting_maps_to_status_row():
    """A pathologically deep page must become a status row, never an
    exception escaping into the Arrow batch (A13 RecursionError
    mapping — the hostile-page contract at 100 TB)."""
    deep = "<div>" * 5000 + "x" + "</div>" * 5000
    row = SCRAPER.extract(f"<html><body><h1>t</h1><ul></ul>{deep}</body></html>")
    assert row["status"].startswith(("mismatch:", "ok"))
    row2 = SCRAPER.extract(deep)
    assert row2["status"].startswith("mismatch:")


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="<>/=\"' abcdehilmtu&#;!-", max_size=200),
                min_size=2, max_size=4))
def test_induction_never_raises_unexpectedly(samples):
    """Induction on arbitrary taggy garbage either yields a spec that
    re-extracts without raising, or fails with the declared
    TemplateError — nothing else."""
    from weakscraper_spark.enginelib import induce_template_robust
    from weakscraper_spark.enginelib.errors import TemplateError

    try:
        spec = induce_template_robust(samples)
    except TemplateError:
        return
    for s in samples:
        row = extract(spec, s)
        assert row["status"] == "ok" or row["status"].startswith("mismatch:")


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10**9))
def test_induction_deterministic(seed):
    from weakscraper_spark.enginelib import induce_template_robust

    samples = [render_page("t_article",
                           make_slots("t_article", f"d:{seed}:{i}"))[0]
               for i in range(3)]
    a = spec_to_json(induce_template_robust(samples))
    b = spec_to_json(induce_template_robust(samples))
    assert a == b


@given(st.text(max_size=2000))
def test_boiler_never_raises_on_arbitrary_text(doc):
    from weakscraper_spark.enginelib.boiler import main_text
    r = main_text(doc)
    assert isinstance(r["text"], str)
    assert r["n_content_blocks"] <= r["n_blocks"]


@given(st.text(alphabet="<>/=\"' abceihlmtu&#;!-nav", max_size=400))
def test_boiler_never_raises_on_taggy_garbage(doc):
    from weakscraper_spark.enginelib.boiler import main_text, segment_blocks
    main_text(doc, mode="all")
    for b in segment_blocks(doc):
        assert b.n_link_words <= b.n_words


@given(st.lists(st.text(alphabet=" abcdefgh\n", max_size=80),
                max_size=6))
def test_pdf_fake_container_roundtrip(pages):
    from weakscraper_spark.operators.pdf import (
        parse_any_pdf, render_fake_pdf)
    status, got = parse_any_pdf(render_fake_pdf(pages))
    assert status == "ok" and got == pages


@given(st.binary(max_size=200))
def test_pdf_parse_total_on_arbitrary_bytes(raw):
    from weakscraper_spark.operators.pdf import parse_any_pdf
    status, pages = parse_any_pdf(raw)
    assert isinstance(status, str) and isinstance(pages, list)


@given(st.binary(max_size=300))
def test_warc_parse_total_on_arbitrary_bytes(raw):
    from weakscraper_spark.sources.warc import iter_warc_records
    for rec in iter_warc_records(raw):
        assert isinstance(rec["status"], str)


@given(st.lists(
    st.fixed_dictionaries({
        "type": st.sampled_from(["response", "request", "metadata"]),
        "url": st.text(alphabet="abc:/._-", max_size=40),
        "date": st.just("2024-05-01T00:00:00Z"),
        "body": st.binary(max_size=200),
        "http_status": st.sampled_from([200, 301, 404]),
        "mime": st.sampled_from(["text/html", "image/png"]),
    }), max_size=5),
    st.booleans())
def test_warc_roundtrip_property(recs, gz):
    """Any record list survives build→parse with types, urls, bodies
    and statuses intact (construction path disjoint from parser)."""
    from weakscraper_spark.sources.warc import (
        build_warc, iter_warc_records)
    got = list(iter_warc_records(build_warc(recs, gzip_members=gz)))
    assert len(got) == len(recs)
    for r, g in zip(recs, got):
        assert g["status"] == "ok"
        assert g["record_type"] == r["type"]
        assert g["body"] == r["body"]
        if r["type"] == "response":
            assert g["http_status"] == r["http_status"]


@given(st.binary(max_size=300),
       st.one_of(st.none(), st.text(max_size=12)))
def test_sniff_decode_total(raw, label):
    from weakscraper_spark.operators.charset import sniff_decode
    t, enc, status = sniff_decode(raw, label)
    assert isinstance(t, str) and isinstance(enc, str)
    assert status.startswith("ok")


@given(st.text(alphabet="<>/=\"' abceihlmtu&#;!-nav", max_size=400))
def test_page_metadata_total_on_taggy_garbage(doc):
    from weakscraper_spark.operators.metadata import (
        page_metadata_fields)
    f = page_metadata_fields(doc)
    assert set(f) == {"title", "meta_description", "canonical",
                      "og_title", "lang_attr", "h1"}


@given(st.lists(st.text(
    alphabet=" abcdef()\\\n", max_size=60), min_size=1, max_size=4),
    st.booleans())
def test_pdf_real_roundtrip_property(pages, compress):
    """render_minimal_pdf → stdlib kernel round-trips ANY latin-1
    page text with parens/backslashes/newlines, compressed or not."""
    from weakscraper_spark.operators.pdf import (
        parse_any_pdf, render_minimal_pdf)
    # the renderer emits one Tj line per \n-split segment and the
    # parser joins non-empty lines — normalize expectation the same
    # way
    want = ["\n".join(s for s in p.split("\n") if s != "")
            for p in pages]
    status, got = parse_any_pdf(
        render_minimal_pdf(pages, compress=compress))
    assert status == "ok"
    assert got == want
