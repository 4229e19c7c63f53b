"""Redirect-chain resolution (operators/redirects.py): pointer-
doubling chains, cycle/budget give-up, Location resolution, and the
functional-edge guarantees."""

import pytest
from pyspark.sql import functions as F

from weakscraper_spark.operators.redirects import (redirect_edges,
                                                   resolve_redirects)


def _edges(spark, pairs):
    return spark.createDataFrame(
        list(pairs), "src_url string, dst_url string")


def test_chain_resolution_exact_hops(spark):
    out = {r.src_url: r for r in resolve_redirects(_edges(spark, [
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("x", "d"),
    ])).collect()}
    assert (out["a"].final_url, out["a"].n_hops,
            out["a"].status) == ("d", 3, "ok")
    assert (out["b"].final_url, out["b"].n_hops) == ("d", 2)
    assert (out["c"].final_url, out["c"].n_hops) == ("d", 1)
    assert (out["x"].final_url, out["x"].n_hops) == ("d", 1)
    assert set(out) == {"a", "b", "c", "x"}  # one row per SOURCE


@pytest.mark.parametrize("cycle", [
    [("a", "b"), ("b", "a")],                      # 2-cycle
    [("a", "b"), ("b", "c"), ("c", "a")],          # 3-cycle
    [("s", "a"), ("a", "b"), ("b", "a")],          # tail into a cycle
])
def test_cycles_are_unresolved_with_null_landing(spark, cycle):
    for r in resolve_redirects(_edges(spark, cycle)).collect():
        assert r.status == "unresolved"
        assert r.final_url is None and r.n_hops is None


def test_budget_exhaustion_gives_up_like_a_browser(spark):
    chain = [(f"u{i}", f"u{i+1}") for i in range(30)]
    out = {r.src_url: r for r in resolve_redirects(
        _edges(spark, chain), max_hops=16).collect()}
    assert out["u0"].status == "unresolved"     # 30 hops > budget
    assert out["u20"].status == "ok"            # 10 hops within it
    assert (out["u20"].final_url, out["u20"].n_hops) == ("u30", 10)
    # a chain of EXACTLY max_hops resolves
    assert out["u14"].status == "ok" and out["u14"].n_hops == 16


def test_redirect_edges_filters_and_resolves(spark):
    idx = spark.createDataFrame([
        ("https://h.example/a", 301, "/b"),             # root-relative
        ("https://h.example/b", 302, "https://o.example/c"),
        ("https://h.example/ok", 200, "/elsewhere"),    # not a 3xx
        ("https://h.example/null", 301, None),          # no Location
        ("https://h.example/blank", 301, "   "),
        ("https://h.example/self", 301, "https://h.example/self"),
    ], "url string, http_status int, location string")
    got = {r.src_url: r.dst_url for r in redirect_edges(idx).collect()}
    assert got == {
        "https://h.example/a": "https://h.example/b",
        "https://h.example/b": "https://o.example/c",
    }


def test_redirect_edges_is_functional(spark):
    idx = spark.createDataFrame([
        ("https://h.example/a", 301, "/z"),
        ("https://h.example/a", 301, "/b"),   # conflicting recapture
    ], "url string, http_status int, location string")
    rows = redirect_edges(idx).collect()
    assert len(rows) == 1
    assert rows[0].dst_url == "https://h.example/b"  # min, pinned


def test_end_to_end_from_index_rows(spark):
    idx = spark.createDataFrame([
        ("https://h.example/old", 301, "/mid"),
        ("https://h.example/mid", 302, "https://new.example/final"),
    ], "url string, http_status int, location string")
    out = {r.src_url: r for r in resolve_redirects(
        redirect_edges(idx)).collect()}
    r = out["https://h.example/old"]
    assert (r.final_url, r.n_hops, r.status) == \
        ("https://new.example/final", 2, "ok")


def test_redirects_from_real_warc_bytes(spark):
    """Whole-loop: WARC bytes with 3xx responses → index (location
    column) → edges → resolved chain."""
    from weakscraper_spark.sources.warc import (build_warc,
                                                warc_record_index)
    raw = build_warc([
        {"type": "response", "url": "https://h.example/old",
         "date": "2024-05-01T00:00:00Z", "http_status": 301,
         "location": "/mid", "body": b"moved"},
        {"type": "response", "url": "https://h.example/mid",
         "date": "2024-05-01T00:00:00Z", "http_status": 302,
         "location": "https://n.example/final", "body": b"found"},
        {"type": "response", "url": "https://n.example/final",
         "date": "2024-05-01T00:00:00Z", "http_status": 200,
         "body": b"<html>ok</html>"},
    ])
    files = spark.createDataFrame([("a.warc.gz", raw)],
                                  "path string, content binary")
    idx = warc_record_index(files)
    out = {r.src_url: r for r in resolve_redirects(
        redirect_edges(idx)).collect()}
    assert (out["https://h.example/old"].final_url,
            out["https://h.example/old"].n_hops) == \
        ("https://n.example/final", 2)
    assert out["https://h.example/mid"].status == "ok"


def test_canonical_resolved_through_redirects(spark):
    """Declared canonical pointing at a MOVED url collapses onto the
    landing page; a canonical whose chain is a cycle keeps the
    DECLARED target (never a mid-cycle url)."""
    from weakscraper_spark.operators.metadata import (
        canonical_dedup_resolved, canonical_resolved)
    pages = spark.createDataFrame([
        ("https://h.example/a1",
         '<link rel="canonical" href="/old">'),
        ("https://h.example/a2",
         '<link rel="canonical" href="/old">'),
        ("https://h.example/b1",
         '<link rel="canonical" href="/loop">'),
        ("https://h.example/c1", "<p>no canonical</p>"),
    ], "url string, html string")
    idx = spark.createDataFrame([
        ("https://h.example/old", 301, "/new"),
        ("https://h.example/loop", 301, "/loop2"),
        ("https://h.example/loop2", 301, "/loop"),
    ], "url string, http_status int, location string")
    resolved = resolve_redirects(redirect_edges(idx))
    out = {r.url: r.canonical_final
           for r in canonical_resolved(pages, resolved).collect()}
    assert out["https://h.example/a1"] == "https://h.example/new"
    assert out["https://h.example/a2"] == "https://h.example/new"
    assert out["https://h.example/b1"] == "https://h.example/loop"
    assert out["https://h.example/c1"] == "https://h.example/c1"
    roll = {r.canonical_final: r.n_pages
            for r in canonical_dedup_resolved(pages,
                                              resolved).collect()}
    assert roll["https://h.example/new"] == 2
