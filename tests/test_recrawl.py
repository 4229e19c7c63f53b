"""Adaptive recrawl planner (plans/recrawl.py): quantile banding,
signal pairing, and the unknown-is-not-cold rule."""

from pyspark.sql import functions as F

from weakscraper_spark.plans.recrawl import plan_recrawl


def _plan(spark, ranks, churns, **kw):
    r = spark.createDataFrame(ranks, "node string, rank double")
    c = spark.createDataFrame(churns, "host string, change_rate double")
    return {x.host: x for x in plan_recrawl(r, c, **kw).collect()}


def test_banding_follows_score_quantiles(spark):
    ranks = [(f"h{i}", float(i)) for i in range(10)]
    churns = [(f"h{i}", 0.5) for i in range(10)]
    got = _plan(spark, ranks, churns)
    assert len(got) == 10
    # monotone: higher rank -> never a colder band
    ivals = [got[f"h{i}"].interval_days for i in range(10)]
    assert ivals == sorted(ivals, reverse=True)
    # top-quantile hosts are hot, bottom cold
    assert got["h9"].interval_days == 1
    assert got["h0"].interval_days == 30
    assert {r.interval_days for r in got.values()} == {1, 7, 30}


def test_churn_separates_equal_importance(spark):
    ranks = [(f"h{i}", 1.0) for i in range(4)]
    churns = [("h0", 0.0), ("h1", 0.2), ("h2", 0.9), ("h3", 1.0)]
    got = _plan(spark, ranks, churns)
    assert got["h3"].interval_days <= got["h1"].interval_days
    assert got["h0"].interval_days == 30


def test_unpaired_hosts_stay_visible(spark):
    """Full-outer pairing: a linked-but-uncrawled host (no churn row)
    and a crawled-but-unlinked host (no rank row) both get verdicts;
    unknown churn is assumed moderate (0.5), never coldest-by-
    default; rank absence means tail."""
    ranks = [("hub", 10.0), ("ghost", 5.0)]
    churns = [("hub", 0.5), ("orphan", 1.0)]
    got = _plan(spark, ranks, churns)
    assert set(got) == {"hub", "ghost", "orphan"}
    g = got["ghost"]
    assert g.change_rate is None
    # unknown churn: score = rank * (0.1 + 0.5), not rank * 0.1
    assert abs(g.score - 5.0 * 0.6) < 1e-9
    o = got["orphan"]
    assert o.rank is None and o.score == 0.0
    assert o.interval_days == 30
