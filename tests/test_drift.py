"""Template-drift detection: daily rates, adjacent-observation jumps,
tie-breaks, gap handling, and the host-partitioned window plan."""

import contextlib
import datetime as dt
import io
import re

import pytest

from weakscraper_spark.operators.drift import (drift_points,
                                               host_error_daily)


def _rows():
    # host A: clean until 2025-03-10, then a redesign: error rate
    # jumps 0.0 -> 0.75; a later smaller wobble must NOT win.
    rows = []
    for d, oks in [(1, [1, 1, 1, 1]), (2, [1, 1, 1, 1]),
                   (10, [0, 0, 0, 1]), (11, [0, 1, 0, 0]),
                   (20, [0, 0, 0, 0])]:
        for ok in oks:
            rows.append(("a.org", dt.date(2025, 3, d), bool(ok)))
    # host B: single observed day -> excluded (nothing to compare)
    rows += [("b.org", dt.date(2025, 3, 5), True)]
    # host C: two equal jumps (0 -> .5 on d3, .5 -> 1.0? no: make
    # them equal: 0,.5,.5,1.0 => jumps .5 on d2 and .5 on d4; the
    # EARLIEST day must win the tie.
    for d, oks in [(1, [1, 1]), (2, [1, 0]), (3, [1, 0]),
                   (4, [0, 0])]:
        for ok in oks:
            rows.append(("c.org", dt.date(2025, 3, d), bool(ok)))
    return rows


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        _rows(), "host string, ts date, ok boolean")


def test_daily_rates(df):
    got = {(r.host, str(r.day)): (r.n_pages, r.n_err, r.err_rate)
           for r in host_error_daily(df).collect()}
    assert got[("a.org", "2025-03-01")] == (4, 0, 0.0)
    assert got[("a.org", "2025-03-10")] == (4, 3, 0.75)
    assert got[("b.org", "2025-03-05")] == (1, 0, 0.0)


def test_drift_day_and_gap(df):
    got = {r.host: r for r in drift_points(df).collect()}
    a = got["a.org"]
    # the 03-02 -> 03-10 transition is adjacent-OBSERVATION (8-day
    # calendar gap): jump 0.0 -> 0.75
    assert str(a.drift_day) == "2025-03-10"
    assert a.rate_before == 0.0 and a.rate_after == 0.75
    assert abs(a.jump - 0.75) < 1e-12
    assert a.n_days == 5
    assert "b.org" not in got


def test_tie_breaks_earliest(df):
    c = {r.host: r for r in drift_points(df).collect()}["c.org"]
    assert str(c.drift_day) == "2025-03-02"
    assert abs(c.jump - 0.5) < 1e-12


def test_min_jump_filter(df):
    got = {r.host for r in drift_points(df, min_jump=0.7).collect()}
    assert got == {"a.org"}


def test_int_ok_column(spark):
    df = spark.createDataFrame(
        [("h", dt.date(2025, 1, 1), 1), ("h", dt.date(2025, 1, 2), 0)],
        "host string, ts date, ok int")
    r = drift_points(df).collect()[0]
    assert r.jump == 1.0


def test_window_partitioned_by_host(df):
    """No global (unpartitioned) window: the lag must run per host."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        drift_points(df).explain("formatted")
    txt = buf.getvalue()
    # every window spec in the plan must partition by host
    win_lines = [ln for ln in txt.splitlines()
                 if "windowspecdefinition" in ln.lower()]
    assert win_lines, txt
    assert all("host" in ln for ln in win_lines), win_lines


def test_snapshot_change_rate(spark):
    from weakscraper_spark.operators.drift import snapshot_change_rate
    old = spark.createDataFrame(
        [("h1", "u1", "a"), ("h1", "u2", "b"), ("h1", "u3", "c"),
         ("h2", "u4", "d")],
        "host string, url string, content_hash string")
    new = spark.createDataFrame(
        [("h1", "u1", "a"),            # same
         ("h1", "u2", "B"),            # changed
         # u3 removed
         ("h1", "u5", "e"),            # added
         ("h3", "u4", "d")],           # moved host, same content
        "host string, url string, content_hash string")
    got = {r.host: r for r in
           snapshot_change_rate(old, new).collect()}
    h1 = got["h1"]
    assert (h1.n_old, h1.n_new, h1.n_added, h1.n_removed,
            h1.n_changed, h1.n_same) == (3, 3, 1, 1, 1, 1)
    assert abs(h1.change_rate - 0.5) < 1e-12
    # u4 counts under its NEW host h3; old host h2 keeps nothing
    assert "h2" not in got
    h3 = got["h3"]
    assert (h3.n_old, h3.n_new, h3.n_changed, h3.n_same) == (1, 1, 0, 1)
    assert h3.change_rate == 0.0


def test_change_rate_null_when_no_overlap(spark):
    from weakscraper_spark.operators.drift import snapshot_change_rate
    old = spark.createDataFrame([("h", "u1", "a")],
                                "host string, url string, content_hash string")
    new = spark.createDataFrame([("h", "u2", "b")],
                                "host string, url string, content_hash string")
    r = snapshot_change_rate(old, new).collect()[0]
    assert r.change_rate is None
    assert (r.n_added, r.n_removed) == (1, 1)


def test_recovering_host_kept_by_default(spark):
    """r05 review: a host whose error rate only DECLINES has a
    negative max jump and must still appear in the default output."""
    import datetime as dt
    from weakscraper_spark.operators.drift import drift_points
    rows = [("r.org", dt.date(2025, 1, 1), False),
            ("r.org", dt.date(2025, 1, 2), True)]
    df = spark.createDataFrame(rows, "host string, ts date, ok boolean")
    got = {r.host: r for r in drift_points(df).collect()}
    assert "r.org" in got
    assert got["r.org"].jump == -1.0
    assert drift_points(df, min_jump=0.0).count() == 0


def test_change_rate_null_hashes(spark):
    """r05 review: presence is by snapshot side — NULL hashes count
    in their snapshot; NULL vs value = changed, NULL vs NULL = same."""
    from weakscraper_spark.operators.drift import snapshot_change_rate
    sch = "host string, url string, content_hash string"
    old = spark.createDataFrame(
        [("h", "u1", None), ("h", "u2", None), ("h", "u3", "a")], sch)
    new = spark.createDataFrame(
        [("h", "u1", "x"), ("h", "u2", None), ("h", "u3", "a")], sch)
    r = snapshot_change_rate(old, new).collect()[0]
    assert (r.n_old, r.n_new, r.n_added, r.n_removed) == (3, 3, 0, 0)
    assert (r.n_changed, r.n_same) == (1, 2)


def test_drift_points_daily_weights_exactly(spark):
    """The aggregate-consuming detector must weight by page counts —
    the r06 review scenario: a host with a 5% baseline error rate
    that redesigns to 100% must be detected with its TRUE jump
    (binarizing each window row to one ok flag pins every day at
    rate 1.0 and the jump vanishes), and sub-daily window rows must
    roll up into the day before rates are compared."""
    from weakscraper_spark.operators.drift import drift_points_daily
    rows = [
        # baseline days: 20 pages, 1 error each (rate 0.05)
        ("h.org", "2026-03-01", 20, 1),
        ("h.org", "2026-03-02", 20, 1),
        # redesign day: everything fails
        ("h.org", "2026-03-03", 20, 20),
        # a healthy host with one stray error is NOT a 0->1 jump
        ("ok.org", "2026-03-01", 50, 0),
        ("ok.org", "2026-03-02", 50, 1),
        # sub-daily windows for one (host, day) must re-aggregate:
        # two 12h windows of 10 pages / 1 err -> day rate 0.1
        ("w.org", "2026-03-01", 10, 1),
        ("w.org", "2026-03-01", 10, 1),
        ("w.org", "2026-03-02", 20, 2),
    ]
    daily = spark.createDataFrame(
        rows, "host string, day_s string, n_pages long, n_err long"
    ).selectExpr("host", "day_s::date AS day", "n_pages", "n_err")
    got = {r.host: r for r in drift_points_daily(daily).collect()}
    h = got["h.org"]
    assert str(h.drift_day) == "2026-03-03"
    assert h.rate_before == pytest.approx(0.05)
    assert h.rate_after == pytest.approx(1.0)
    assert h.jump == pytest.approx(0.95)
    assert got["ok.org"].jump == pytest.approx(0.02)
    # rolled-up w.org: 0.1 -> 0.1, jump exactly 0
    assert got["w.org"].jump == pytest.approx(0.0)
    # thresholded: only the redesign survives
    det = {r.host for r in
           drift_points_daily(daily, min_jump=0.5).collect()}
    assert det == {"h.org"}
