"""Link-graph family: href resolution, outlink extraction vs the
generator's ground truth, host-graph aggregation, PageRank (vs the
DuckDB twin AND hand-checked closed forms), anchor top-k, and the
domain-mixture sampler."""

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from weakscraper_spark.operators.links import (
    anchor_topk, extract_links, host_graph, pagerank, pagerank_sql)
from weakscraper_spark.sources.synth import synth_linked_pages


def _links_df(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, html=h) for u, h in rows], "url string, html string")


# ---------------------------------------------------------------------------
# href resolution + extraction
# ---------------------------------------------------------------------------

def test_resolve_href_forms(spark):
    base = "https://ex.com/a/b/page.html?q=1#frag"
    html = ("<p>"
            '<a href="https://other.com/x">abs</a>'
            '<a href="//cdn.com/y">proto</a>'
            '<a href="/root.html">root</a>'
            '<a href="rel.html">rel</a>'
            "</p>")
    out = (extract_links(_links_df(spark, [(base, html)]))
           .orderBy("anchor").collect())
    got = {r.anchor: r.dst_url for r in out}
    assert got == {
        "abs": "https://other.com/x",
        "proto": "https://cdn.com/y",
        "root": "https://ex.com/root.html",
        # path-relative joins the base DIRECTORY; the base's query
        # string and fragment must not leak into the join
        "rel": "https://ex.com/a/b/rel.html",
    }


def test_extract_links_rejects_pseudo_links_and_handles_quotes(spark):
    html = ('<a href="javascript:void(0)">j</a>'
            "<a href='mailto:x@y.z'>m</a>"
            '<a href="#top">t</a>'
            '<a href="tel:+123">p</a>'
            "<a class=k href='/ok'>keep <b>bold</b></a>")
    out = extract_links(
        _links_df(spark, [("https://h.com/p", html)])).collect()
    assert len(out) == 1
    assert out[0].dst_url == "https://h.com/ok"
    # nested markup stripped from the anchor, whitespace collapsed
    assert out[0].anchor == "keep bold"


def test_extract_links_base_tag_and_markup_variants(spark):
    """Crawl-HTML realities: a <base href> re-bases every relative
    reference (first base wins), tags/attrs come in any case, and
    hrefs may be unquoted."""
    html = ('<head><BASE HREF="https://cdn.net/lib/">'
            '<base href="https://ignored.net/"></head>'
            '<A HREF="/root">r</A>'
            "<a href=rel.html>p</a>"
            '<a href="HTTPS://ABS.com/x">a</a>')
    out = {r.anchor: r.dst_url for r in extract_links(
        _links_df(spark, [("https://ex.com/d/page", html)])).collect()}
    assert out == {
        "r": "https://cdn.net/root",        # base ORIGIN
        "p": "https://cdn.net/lib/rel.html",  # base DIRECTORY
        "a": "HTTPS://ABS.com/x",           # absolute untouched
    }


def test_extract_links_accepts_binary_html(spark):
    df = spark.createDataFrame(
        [("https://h.com/p",
          b'<a href="https://o.com/x">bin</a>')],
        "url string, html binary")
    out = extract_links(df).collect()
    assert [r.dst_url for r in out] == ["https://o.com/x"]


def test_extract_links_recovers_generator_truth(spark):
    """The end-to-end contract the staged-truth oracle checks: the
    extractor must recover EXACTLY the (resolved link, anchor) lists
    the generator rendered into the page, in document order."""
    pages = synth_linked_pages(spark, 120)
    got = (extract_links(pages)
           .groupBy("src_url")
           .agg(F.collect_list("dst_url").alias("links"),
                F.collect_list("anchor").alias("anchors")))
    truth = pages.select(F.col("url").alias("src_url"),
                         F.col("links").alias("t_links"),
                         F.col("anchors").alias("t_anchors"))
    bad = (got.join(truth, "src_url")
           .filter((F.col("links") != F.col("t_links"))
                   | (F.col("anchors") != F.col("t_anchors"))))
    assert truth.count() == 120 and got.count() == 120
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# host graph + pagerank
# ---------------------------------------------------------------------------

def _edges(spark, triples):
    return spark.createDataFrame(
        triples, "src_host string, dst_host string, weight long")


def test_host_graph_weights_and_self_loops(spark):
    html = ('<a href="https://b.com/1">x</a>'
            '<a href="https://b.com/2">y</a>'
            '<a href="/self">z</a>')
    pages = _links_df(spark, [("https://a.com/p", html)])
    e = host_graph(extract_links(pages)).collect()
    assert [(r.src_host, r.dst_host, r.weight) for r in e] == \
        [("a.com", "b.com", 2)]
    e2 = host_graph(extract_links(pages), drop_self=False).orderBy(
        "dst_host").collect()
    assert ("a.com", "a.com", 1) == (
        e2[0].src_host, e2[0].dst_host, e2[0].weight)


def test_pagerank_two_node_closed_form(spark):
    """a↔b symmetric: rank stays uniform (0.5, 0.5) at every
    iteration — exact closed form, no tolerance needed."""
    r = pagerank(_edges(spark, [("a", "b", 1), ("b", "a", 1)]),
                 iters=5).collect()
    assert {x.node: x.rank for x in r} == {"a": 0.5, "b": 0.5}


def test_pagerank_empty_edges_returns_empty(spark):
    """An empty edge list must yield an empty (node, rank) relation,
    not a ZeroDivisionError from the driver-side 1/N scalar (r08
    optimization guard)."""
    out = pagerank(_edges(spark, []), iters=3)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_pagerank_dangling_mass_is_conserved(spark):
    """a→b, b dangling: without the dangling term rank leaks each
    round; with it Σrank = 1 exactly (up to fp) and b > a."""
    r = pagerank(_edges(spark, [("a", "b", 1)]), iters=10).collect()
    ranks = {x.node: x.rank for x in r}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks["b"] > ranks["a"] > 0


def test_pagerank_weighted_outlinks_split_proportionally(spark):
    """c→a (w=3), c→b (w=1): after one iteration from uniform,
    a gets 3/4 of c's rank and b gets 1/4 — hand-computable.
    rank_1(a) = 0.05 + 0.85·(1/3·3/4 + dangling/3) with
    dangling = rank(a)+rank(b) = 2/3."""
    r = pagerank(_edges(spark, [("c", "a", 3), ("c", "b", 1)]),
                 damping=0.85, iters=1).collect()
    ranks = {x.node: x.rank for x in r}
    third = 1.0 / 3.0
    dang = 2 * third
    exp_a = 0.15 * third + 0.85 * (third * 0.75 + dang * third)
    exp_b = 0.15 * third + 0.85 * (third * 0.25 + dang * third)
    assert ranks["a"] == pytest.approx(exp_a, abs=1e-12)
    assert ranks["b"] == pytest.approx(exp_b, abs=1e-12)


def test_pagerank_matches_duckdb_twin(spark):
    """Same fixed-iteration recurrence, two engines, 8dp equality —
    on a graph with a hub, a cycle, and a dangling sink."""
    triples = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1),
               ("c", "a", 1), ("b", "d", 3)]  # d dangles
    spark_ranks = {
        r.node: r.rank
        for r in pagerank(_edges(spark, triples), iters=10).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE eg (src_host VARCHAR, dst_host VARCHAR,"
                " weight BIGINT)")
    con.executemany("INSERT INTO eg VALUES (?, ?, ?)", triples)
    duck = dict(con.execute(pagerank_sql("eg", iters=10)).fetchall())
    assert set(duck) == set(spark_ranks)
    for node, dr in duck.items():
        assert spark_ranks[node] == pytest.approx(dr, abs=1e-8), node


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------

def test_anchor_topk_counts_and_tiebreak(spark):
    rows = [("https://s.com/1",
             '<a href="https://t.com/a">deep model</a>'
             '<a href="https://t.com/b">deep net</a>'),
            ("https://s.com/2",
             '<a href="https://t.com/c">deep x</a>')]
    out = (anchor_topk(extract_links(_links_df(spark, rows)), k=2)
           .orderBy("rn").collect())
    assert [(r.term, r.n, r.rn) for r in out] == [
        ("deep", 3, 1), ("model", 1, 2)]  # tie at n=1 → 'model' < 'net'
    assert all(r.dst_host == "t.com" for r in out)
    # min_len drops the single-char token
    short = anchor_topk(extract_links(_links_df(
        spark, [("https://s.com/1",
                 '<a href="https://t.com/a">a bb</a>')])), k=5).collect()
    assert [r.term for r in short] == ["bb"]


# ---------------------------------------------------------------------------
# domain mixing
# ---------------------------------------------------------------------------

def _docs(spark):
    rows = []
    for i in range(60):
        dom = ["en", "es", "fr"][i % 3]
        rows.append(Row(doc_id=i, lang=dom,
                        text=" ".join(["w"] * (10 + i % 5))))
    return spark.createDataFrame(rows)


def test_mix_domains_rates_and_cap(spark):
    from weakscraper_spark.operators.corpus import mix_domains

    docs = _docs(spark)
    # en gets far more budget than its tokens → rate caps at 1.0
    # (taken whole); es gets a partial rate; fr has weight 0 → dropped
    out = mix_domains(docs, "lang", {"en": 0.9, "es": 0.1},
                      budget_tokens=1000)
    rates = {r.lang: r.rate for r in
             out.select("lang", "rate").distinct().collect()}
    assert rates["en"] == 1.0
    assert 0.0 < rates["es"] < 1.0
    assert "fr" not in rates
    # capped domain is taken WHOLE
    assert out.filter("lang = 'en'").count() == 20
    # rate formula: budget·share / domain_tokens
    es_toks = sum(10 + i % 5 for i in range(60) if i % 3 == 1)
    assert rates["es"] == pytest.approx(1000 * 0.1 / es_toks)


def test_mix_domains_is_deterministic_and_stable(spark):
    from weakscraper_spark.operators.corpus import mix_domains

    docs = _docs(spark)
    kw = dict(domain_col="lang", weights={"en": 0.5, "es": 0.5},
              budget_tokens=400)
    a = sorted(r.doc_id for r in mix_domains(docs, **kw).collect())
    b = sorted(r.doc_id for r in
               mix_domains(docs.repartition(7), **kw).collect())
    assert a == b and len(a) > 0


def test_data_href_never_hijacks(spark):
    """r05 review: href must start an attribute — data-href/ng-href
    suffixes must neither shadow a real href nor masquerade as one."""
    from weakscraper_spark.operators.links import extract_links
    df = spark.createDataFrame(
        [("https://s.org/p",
          '<a href="/real" data-href="/lazy">x</a>'
          '<a class="c" data-href="/ghost">y</a>'
          '<a data-href="/first" href="/second">z</a>'),
         ],
        "url string, html string")
    got = sorted(r.dst_url for r in extract_links(df).collect())
    assert got == ["https://s.org/real", "https://s.org/second"]
