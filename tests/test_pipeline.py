"""Pipeline ring 2 (SURVEY.md §6.2): synthesized CC-style table on
local Spark → full C1→C10 pipeline. Asserts:
- per-url byte-identical text vs the rendered ground truth (the
  BASELINE.json:6 acceptance bar, at pipeline level);
- mismatch/malformed rows surface as status rows, never failures;
- exactly-once resume (partial write → rerun → no duplicates, C9);
- salting invariance (same aggregates with S=1 vs S=16, C8);
- per-partition lineage metrics reconcile with output counts (C13).
"""

import pytest
from pyspark.sql import functions as F

from weakscraper_spark.plans.pipeline import (
    build_extract_plan,
    dedup_latest,
    host_stats_salted,
    partition_metrics,
    run_pipeline,
)
from weakscraper_spark.sources.synth import (
    compiled_specs,
    synth_pages,
    synth_templates,
)

N_PAGES = 400


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synth_pages(spark, N_PAGES).cache()
    templates = synth_templates(spark)
    specs = compiled_specs()
    return pages, templates, specs


@pytest.fixture(scope="module")
def extracted(spark, corpus):
    pages, templates, specs = corpus
    return build_extract_plan(pages, templates, specs).cache()


def test_row_accounting(spark, corpus, extracted):
    pages, _, _ = corpus
    n_urls = pages.select("url").distinct().count()
    assert extracted.count() == n_urls  # dedup C3: one row per url


def test_byte_identical_text(spark, corpus, extracted):
    """Every ok row's text equals the ground truth rendered into the
    page; every ground-truth-bearing url is extracted ok."""
    pages, _, _ = corpus
    latest = dedup_latest(pages).select("url", F.col("text").alias("want"))
    joined = extracted.join(latest, "url").cache()

    ok = joined.filter(F.col("status") == "ok")
    n_ok = ok.count()
    assert n_ok > 0.9 * N_PAGES * 0.94  # ~6% synthetic failures
    assert ok.filter(F.col("text") != F.col("want")).count() == 0

    # failure parity: rows with ground truth must not mismatch, rows
    # without (synthetic bad pages) must not be ok.
    assert joined.filter((F.col("want") != "") &
                         (F.col("status") != "ok")).count() == 0
    assert joined.filter((F.col("want") == "") &
                         (F.col("status") == "ok")).count() == 0


def test_status_taxonomy(extracted):
    statuses = {r["status"] for r in
                extracted.select("status").distinct().collect()}
    assert "ok" in statuses
    assert any(s.startswith("mismatch:") for s in statuses)
    # no template-less hosts in the synth registry
    assert "error:NoTemplate" not in statuses


def test_fields_json_exact(spark, extracted):
    """fields_json is canonical JSON with the captured slots."""
    import json

    row = (extracted.filter((F.col("status") == "ok") &
                            F.col("template_id").eqNullSafe("t_article"))
           .select("fields_json", "text").first())
    fields = json.loads(row["fields_json"])
    assert fields["text"] == row["text"]
    assert "title" in fields and "tags" in fields
    assert isinstance(fields["tags"], list)


def test_salted_plan_same_results(spark, corpus, extracted):
    """C8 at plan level: the salted-repartition variant (for
    host-clustered inputs) must produce the identical result set."""
    pages, templates, specs = corpus
    salted = build_extract_plan(pages, templates, specs, n_salts=8)
    base = {(r["url"], r["status"], r["text"])
            for r in extracted.select("url", "status", "text").collect()}
    got = {(r["url"], r["status"], r["text"])
           for r in salted.select("url", "status", "text").collect()}
    assert got == base


def test_salting_invariance(spark, corpus):
    """C8: aggregates are identical under S=1 and S=16 (deterministic
    salting changes layout, never results)."""
    pages, _, _ = corpus
    staged = pages.withColumn("host", F.parse_url("url", F.lit("HOST")))
    a = {r["host"]: (r["n_pages"], r["bytes_in"])
         for r in host_stats_salted(staged, n_salts=1).collect()}
    b = {r["host"]: (r["n_pages"], r["bytes_in"])
         for r in host_stats_salted(staged, n_salts=16).collect()}
    assert a == b
    # skew exists: head host carries ~30%
    total = sum(n for n, _ in a.values())
    head = max(n for n, _ in a.values())
    assert head / total > 0.2


def test_resume_exactly_once(spark, corpus, tmp_path):
    """C9: run on half the corpus, then on the full corpus into the
    same sink → every url exactly once, second run only adds the
    missing urls (re-presented superseded snapshots are skipped by
    the (url, done_ts) resume predicate)."""
    pages, templates, specs = corpus
    out_dir = str(tmp_path / "sink")

    first_half = pages.filter(F.xxhash64("url") % 2 == 0)
    r1 = run_pipeline(spark, first_half, templates, specs, out_dir,
                      run_id="r1")
    r2 = run_pipeline(spark, pages, templates, specs, out_dir,
                      run_id="r2")

    out = spark.read.parquet(r2["pages_out"])
    n_urls = pages.select("url").distinct().count()
    assert out.count() == n_urls
    assert out.groupBy("url").count().filter("count > 1").count() == 0
    assert r1["rows_written"] + r2["rows_written"] == n_urls

    # metrics are per-increment: summing the metrics table equals the
    # sink count exactly (no double counting across resume runs)
    m = spark.read.parquet(r2["metrics_out"])
    assert m.agg(F.sum("n_pages")).first()[0] == n_urls
    # same-run_id retry overwrites its own partition with the same
    # rows (resume excludes the current run from the done-set, so a
    # retry of a partial write re-processes its own share) — the sink
    # stays exactly-once per url
    r2b = run_pipeline(spark, pages, templates, specs, out_dir,
                       run_id="r2")
    assert r2b["rows_written"] == r2["rows_written"]
    out_b = spark.read.parquet(r2b["pages_out"])
    assert out_b.count() == n_urls
    assert out_b.groupBy("url").count().filter("count > 1").count() == 0


def test_resume_noop_run_writes_nothing(spark, corpus, tmp_path):
    """A NEW run over fully-done input is a clean no-op: 0-row
    increment (Observation counts included), sink unchanged."""
    pages, templates, specs = corpus
    out_dir = str(tmp_path / "sink")
    r1 = run_pipeline(spark, pages, templates, specs, out_dir,
                      run_id="a")
    r2 = run_pipeline(spark, pages, templates, specs, out_dir,
                      run_id="b")
    assert r2["rows_written"] == 0 and r2["ok_written"] == 0
    assert spark.read.parquet(r2["pages_out"]).count() == r1["rows_written"]


def test_resume_newer_snapshot_wins(spark, corpus, tmp_path):
    """Snapshot-granular resume: a warc_ts NEWER than the sink's
    latest for a url is re-extracted on a later run, and the
    latest-per-url serving view prefers it (url-granular resume
    silently discarded it — ADVICE r01)."""
    import datetime as dtmod
    import os

    from weakscraper_spark.sources.synth import (
        PAGES_SCHEMA, make_slots, render_page)

    pages, templates, specs = corpus
    out_dir = str(tmp_path / "sink")
    run_pipeline(spark, pages, templates, specs, out_dir, run_id="r1")

    sink_path = os.path.join(out_dir, "pages_out")
    row = (spark.read.parquet(sink_path).filter("status = 'ok'")
           .select("url", "warc_ts", "template_id").first())
    html, text = render_page(
        row["template_id"], make_slots(row["template_id"], "newer:snap"))
    newer = spark.createDataFrame(
        [(row["url"], row["warc_ts"] + dtmod.timedelta(days=1),
          html.encode("utf-8"), text, "en")], PAGES_SCHEMA)

    r2 = run_pipeline(spark, newer, templates, specs, out_dir,
                      run_id="r2")
    assert r2["rows_written"] == 1
    served = dedup_latest(spark.read.parquet(sink_path))
    got = served.filter(F.col("url") == row["url"]).first()
    assert got["text"] == text and got["status"] == "ok"

    # MERGE-shaped compaction collapses the superseded row; the
    # serving view is unchanged and the url count is exact
    from weakscraper_spark.plans.pipeline import compact_sink
    before = {(r["url"], r["text"]) for r in served.collect()}
    stats = compact_sink(spark, sink_path)
    after_df = spark.read.parquet(sink_path)
    assert stats["rows"] == after_df.count()
    assert after_df.groupBy("url").count().filter("count > 1").count() == 0
    assert {(r["url"], r["text"])
            for r in dedup_latest(after_df).collect()} == before


def test_compact_sink_crash_never_empties_sink(spark, corpus, tmp_path,
                                               monkeypatch):
    """Swap-order guard (ADVICE r02): compaction renames the staged
    partition IN before deleting superseded ones. A crash before the
    swap leaves the sink untouched (+ staged copy for recovery); a
    crash between add and delete leaves transient duplicates that the
    dedup_latest serving view collapses — no window where the sink
    reads as empty."""
    import os
    import shutil

    from weakscraper_spark.plans.pipeline import compact_sink

    pages, templates, specs = corpus
    out_dir = str(tmp_path / "sink")
    run_pipeline(spark, pages, templates, specs, out_dir, run_id="a")
    sink_path = os.path.join(out_dir, "pages_out")
    rows_before = spark.read.parquet(sink_path).count()
    served_before = {(r["url"], r["text"]) for r in
                     dedup_latest(spark.read.parquet(sink_path)).collect()}

    def boom(*a, **k):
        raise OSError("simulated crash")

    # crash 1: between staged write and swap-in
    monkeypatch.setattr(os, "rename", boom)
    with pytest.raises(OSError):
        compact_sink(spark, sink_path, run_id="c1")
    monkeypatch.undo()
    assert spark.read.parquet(sink_path).count() == rows_before
    assert os.path.isdir(sink_path + ".compact_c1")  # staged survives
    shutil.rmtree(sink_path + ".compact_c1")

    # crash 2: after swap-in, before superseded-partition delete
    monkeypatch.setattr(shutil, "rmtree", boom)
    with pytest.raises(OSError):
        compact_sink(spark, sink_path, run_id="c2")
    monkeypatch.undo()
    parts = {d for d in os.listdir(sink_path) if d.startswith("run_id=")}
    assert parts == {"run_id=a", "run_id=c2"}  # duplicates, never empty
    assert {(r["url"], r["text"]) for r in
            dedup_latest(spark.read.parquet(sink_path)).collect()} \
        == served_before

    # recovery = simply compact again
    compact_sink(spark, sink_path, run_id="c3")
    parts = {d for d in os.listdir(sink_path) if d.startswith("run_id=")}
    assert parts == {"run_id=c3"}
    assert {(r["url"], r["text"]) for r in
            dedup_latest(spark.read.parquet(sink_path)).collect()} \
        == served_before


def test_extract_n_bytes_is_bytes_for_string_input(spark):
    """Lineage fix (ADVICE r02): when the html column is a STRING,
    n_bytes must report UTF-8 bytes, not characters."""
    from weakscraper_spark.operators.extract import extract_pages
    from weakscraper_spark.sources.synth import compiled_specs

    html = "<html><body>héllo wörld 世界</body></html>"
    df = spark.createDataFrame(
        [("https://host00.example.com/p/0", None, "t_article", html)],
        "url string, warc_ts timestamp, template_id string, html string")
    row = extract_pages(df, compiled_specs()).first()
    assert row["n_bytes"] == len(html.encode("utf-8"))
    assert row["n_bytes"] > len(html)


def test_partition_metrics_reconcile(spark, extracted):
    m = partition_metrics(extracted, "runX")
    agg = m.agg(F.sum("n_pages").alias("p"), F.sum("n_ok").alias("ok"),
                F.sum("n_fail").alias("f")).first()
    assert agg["p"] == extracted.count()
    assert agg["ok"] == extracted.filter("status = 'ok'").count()
    assert agg["f"] == agg["p"] - agg["ok"]
    # extraction ran spread over partitions, not funneled into one
    assert m.count() > 1


def test_run_pipeline_with_heuristic_fallback(spark, corpus, tmp_path):
    """End-to-end: the fallback rescues mismatch pages into the SINK
    (status ok_heuristic with recovered text), resume still works."""
    pages, templates, specs = corpus
    out = str(tmp_path / "sink_fb")
    run_pipeline(spark, pages, templates, specs, out,
                 run_id="fb0", fallback="heuristic")
    sink = spark.read.parquet(f"{out}/pages_out")
    rescued = sink.filter("status = 'ok_heuristic'")
    assert rescued.count() > 0
    assert rescued.filter("text IS NULL OR text = ''").count() == 0
    # template successes unaffected by the fallback path
    base_ok = sink.filter("status = 'ok'").count()
    assert base_ok > 0


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    """pages → extract(+fallback) → clean: every extracted url gets a
    verdict, cleaned = kept verdicts exactly, reasons are from the
    documented set, and the heuristic-rescued rows participate."""
    from weakscraper_spark.plans.corpus_pipeline import build_corpus_plan
    from weakscraper_spark.sources.synth import (
        compiled_specs, synth_pages, synth_templates)
    pages = synth_pages(spark, 250, min_words=48)
    cleaned, verdict = build_corpus_plan(
        pages, synth_templates(spark), compiled_specs(),
        min_quality=0.2)
    v = verdict.cache()
    c = cleaned.cache()
    n_verdict = v.count()
    n_kept = v.filter("keep").count()
    assert c.count() == n_kept > 0
    reasons = {r.reason for r in v.select("reason").distinct().collect()}
    assert reasons <= {"quality", "exact_dup", "near_dup", "kept"}
    # rescued rows flow through the corpus stage
    assert c.filter("status = 'ok_heuristic'").count() > 0
    # verdict covers every successfully-extracted url
    from weakscraper_spark.plans.pipeline import build_extract_plan
    ok = build_extract_plan(pages, synth_templates(spark),
                            compiled_specs(), fallback="heuristic") \
        .filter("status IN ('ok', 'ok_heuristic')").count()
    assert n_verdict == ok
    v.unpersist(); c.unpersist()


def test_frontier_pipeline_end_to_end(spark):
    """raw urls → canonical dedup → robots filter → schedule: variant
    collapse, policy drops, and bounded slots all visible in one
    output."""
    from weakscraper_spark.plans.frontier import build_frontier_plan
    raw = spark.createDataFrame(
        [("HTTPS://WWW.A.com:443/x?utm_source=1",),   # variant 1
         ("https://a.com/x",),                         # variant 2
         ("https://a.com/private/1",),                 # robots-blocked
         ("https://b.com/y",), ("https://b.com/z",)],
        "url string")
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string")
    out = {r.url: r for r in
           build_frontier_plan(raw, robots, per_host=2).collect()}
    assert set(out) == {"https://a.com/x", "https://b.com/y",
                        "https://b.com/z"}
    assert out["https://a.com/x"].n_variants == 2
    assert all(0 <= r.slot < 2 and r.wave == 0 for r in out.values())


def test_catalog_parquet_seam(spark, tmp_path):
    """The Catalog read/append/overwrite seam on its executable
    (parquet) branch — the exact call sites prod swaps to Iceberg."""
    from weakscraper_spark.sources.tables import Catalog
    cat = Catalog(spark, fmt="parquet")
    ref = str(tmp_path / "t")
    df = spark.range(5).withColumnRenamed("id", "v")
    cat.append(df, ref)
    cat.append(df, ref)
    assert cat.read(ref).count() == 10
    cat.overwrite_partitions(df, ref)
    assert cat.read(ref).count() == 5
