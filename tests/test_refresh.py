"""End-to-end tests for the template-lifecycle loop
(plans/refresh.py): a planted redesign must be detected, re-induced,
re-extracted, and MEASURABLY recovered — including under noise, and
including the refreshed-registry artifact a next scheduled run would
consume."""

import json

import pytest
from pyspark.sql import functions as F

from weakscraper_spark.plans.refresh import (refresh_from_output,
                                             refresh_templates)
from weakscraper_spark.sources.synth import (
    compiled_specs, synth_drift_pages, synth_templates)

PLANTED = {"host01.example.com", "host05.example.com",
           "host09.example.com", "host13.example.com"}


@pytest.fixture(scope="module", params=["recompute", "from_table"])
def loop(request, spark, tmp_path_factory):
    """The whole suite runs under BOTH lifecycle entries (VERDICT r06
    #5): ``refresh_templates`` (pass 1 recomputed in-loop) and
    ``refresh_from_output`` (pass 1 read back from the serving table
    a weekly run already wrote) must produce identical artifacts."""
    pages = synth_drift_pages(spark, 600)
    templates = synth_templates(spark, 16)
    specs = compiled_specs()
    if request.param == "recompute":
        return refresh_templates(pages, templates, specs,
                                 min_jump=0.5, k=4)
    from weakscraper_spark.plans.pipeline import build_extract_plan
    sink = str(tmp_path_factory.mktemp("serving") / "out")
    build_extract_plan(pages, templates, specs) \
        .write.mode("overwrite").parquet(sink)
    return refresh_from_output(spark.read.parquet(sink), pages,
                               templates, specs, min_jump=0.5, k=4)


def test_detection_names_exactly_the_planted_hosts(loop):
    drift = {r.host: r for r in loop["drift"].collect()}
    assert set(drift) == PLANTED
    for r in drift.values():
        assert str(r.drift_day) == "2026-01-05"  # EPOCH + 4 days
        assert r.jump == pytest.approx(1.0)


def test_recovery_is_total_on_the_clean_scenario(loop):
    rows = loop["summary"].collect()
    assert {r.host for r in rows} == PLANTED
    for r in rows:
        assert r.rate_before_refresh == pytest.approx(1.0)
        assert r.rate_after_refresh == pytest.approx(0.0)
        # the SAME page set before and after — nothing vanished
        assert r.n_post == r.n_post_after > 0


def test_induced_registry_rows(loop):
    ind = {r.host_pattern: r for r in loop["induced"].collect()}
    assert set(ind) == PLANTED
    for host, r in ind.items():
        assert r.status == "ok"
        assert r.template_id == f"t_{host}"
        assert r.n_samples == 4
        assert r.template_json  # a real compiled spec payload


def test_refreshed_registry_covers_every_host_once(loop):
    reg = loop["registry"].collect()
    hosts = [r.host_pattern for r in reg]
    assert len(hosts) == len(set(hosts)) == 16
    by_host = {r.host_pattern: r.template_id for r in reg}
    for h in PLANTED:
        assert by_host[h] == f"t_{h}"
    # healthy hosts keep their original template assignment
    assert by_host["host00.example.com"] == "t_article"
    assert set(loop["specs"]) >= {f"t_{h}" for h in PLANTED} | {
        "t_article", "t_forum", "t_product"}


def test_next_run_with_refreshed_registry_recovers_text(spark, loop):
    """The registry artifact is USABLE: the NEXT scheduled run — the
    crawl window from the drift day on, which is what a weekly loop
    feeds forward — extracts every page ok under the refreshed
    registry, and the generator ground-truth text appears among the
    captured slots (induced slot names are synthetic, so membership
    is the right check — the induce_roundtrip query pins exact slot
    mapping). Historical pre-drift snapshots stay under the OLD
    registry's results; re-pointing them at the v2 template would be
    wrong by construction."""
    from weakscraper_spark.plans.pipeline import build_extract_plan

    pages = (synth_drift_pages(spark, 600)
             .filter(F.col("warc_ts").cast("date") >=
                     F.lit("2026-01-05").cast("date")))
    out = build_extract_plan(pages, loop["registry"], loop["specs"])
    rows = (out.withColumn("truth", F.col("url"))
            .join(pages.select("url", F.col("text").alias("want")),
                  "url")
            .collect())
    assert rows
    n_v2_checked = 0
    for r in rows:
        host = r.url.split("/")[2]
        assert r.status == "ok", (r.url, r.status, r.error)
        if host in PLANTED and r.fields_json:
            vals = set()
            for v in json.loads(r.fields_json).values():
                if isinstance(v, str):
                    vals.add(v)
                elif isinstance(v, list):
                    vals.update(x for x in v if isinstance(x, str))
            if r.want in vals:
                n_v2_checked += 1
    # every planted-host page (v1 pre-drift under its original
    # template, v2 post-drift under the induced one) recovers the
    # generator text among its captures
    n_planted = sum(1 for r in rows
                    if r.url.split("/")[2] in PLANTED)
    assert n_v2_checked == n_planted > 0


def test_loop_under_noise_still_recovers(spark):
    """With ~5% alien-skeleton pages planted on the healthy hosts,
    the loop must still detect and recover the redesigned hosts;
    any false-positive detections must not make things WORSE on
    their hosts (recovery is measured per host, never assumed)."""
    pages = synth_drift_pages(spark, 600, noise=True)
    r = refresh_templates(pages, synth_templates(spark, 16),
                          compiled_specs(), min_jump=0.5, k=4)
    summary = {s.host: s for s in r["summary"].collect()}
    assert PLANTED <= set(summary)
    for h in PLANTED:
        s = summary[h]
        assert s.rate_before_refresh == pytest.approx(1.0)
        assert s.rate_after_refresh == pytest.approx(0.0)
    for h, s in summary.items():
        if h not in PLANTED and s.n_post_after:
            assert (s.rate_after_refresh
                    <= s.rate_before_refresh + 1e-9)


def test_no_drift_no_changes(spark):
    """A healthy corpus round-trips: nothing detected, registry
    unchanged, empty summary."""
    from weakscraper_spark.sources.synth import synth_pages
    pages = synth_pages(spark, 200)
    templates = synth_templates(spark, 50)
    r = refresh_templates(pages, templates, compiled_specs(),
                          min_jump=0.5, k=4)
    assert r["drift"].count() == 0
    assert r["summary"].count() == 0
    assert r["registry"].count() == templates.count()
    assert set(r["specs"]) == set(compiled_specs())


def test_both_entries_identical_artifacts(spark, tmp_path):
    """Direct equality of the two entry modes on the same inputs:
    summary rows, refreshed registry, and induced specs all match —
    the serving-table read is a drop-in for the in-loop pass 1."""
    pages = synth_drift_pages(spark, 600)
    templates = synth_templates(spark, 16)
    specs = compiled_specs()
    from weakscraper_spark.plans.pipeline import build_extract_plan
    sink = str(tmp_path / "serving_out")
    build_extract_plan(pages, templates, specs) \
        .write.mode("overwrite").parquet(sink)
    a = refresh_templates(pages, templates, specs,
                          min_jump=0.5, k=4)
    b = refresh_from_output(spark.read.parquet(sink), pages,
                            templates, specs, min_jump=0.5, k=4)

    def srt(df, *cols):
        return [tuple(r) for r in df.orderBy(*cols).collect()]

    assert srt(a["summary"], "host") == srt(b["summary"], "host")
    assert srt(a["drift"], "host") == srt(b["drift"], "host")
    assert srt(a["registry"], "host_pattern") == \
        srt(b["registry"], "host_pattern")
    assert a["specs"] == b["specs"]
