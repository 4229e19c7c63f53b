"""Composed relational operators (operators/relational.py): as-of
join (union-window form) and bounded range join (bucketed equi-join).
Each is checked against the semantic definition on hand-built frames
— equal-ts inclusivity, no-earlier-row NULL, gap boundaries — and
against a naive cross-join reference on a random-ish frame."""

import datetime as dt

from pyspark.sql import functions as F

from weakscraper_spark.operators.relational import (
    asof_join,
    range_join_buckets,
)

T0 = dt.datetime(2026, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 1, _ts(10)), ("u1", 2, _ts(20)), ("u1", 3, _ts(5)),
         ("u2", 4, _ts(10))],
        "user_id string, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts(10), 100.0),   # equal-ts: must match event 1
         ("u1", _ts(15), 200.0),
         ("u2", _ts(11), 999.0)],  # after u2's only click
        "user_id string, ts timestamp, v double")
    out = {r["event_id"]: r["v_asof"]
           for r in asof_join(left, right, on="user_id",
                              ts="ts").collect()}
    assert out[1] == 100.0          # <= is inclusive
    assert out[2] == 200.0          # most recent, not first
    assert out[3] is None           # nothing at or before
    assert out[4] is None           # right row strictly later


def test_asof_join_row_atomicity_and_nulls(spark):
    """ADVICE r02: right columns must be carried as ONE row, not
    per-column — a NULL field in the matched right row stays NULL
    (never backfilled from an older row), and multi-column output
    never mixes values from different right rows."""
    left = spark.createDataFrame(
        [("u1", 1, _ts(30))],
        "user_id string, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts(10), 1.0, None),     # older row: a=1.0, b=NULL
         ("u1", _ts(20), None, 2.0)],    # matched row: a=NULL, b=2.0
        "user_id string, ts timestamp, a double, b double")
    row = asof_join(left, right, on="user_id", ts="ts",
                    right_cols=["a", "b"]).first()
    assert row["b_asof"] == 2.0
    assert row["a_asof"] is None  # NOT 1.0 from the older right row


def test_asof_join_matches_naive(spark):
    import itertools
    lrows = [("u%d" % (i % 3), i, _ts(i * 7 % 97))
             for i in range(40)]
    rrows = [("u%d" % (j % 3), _ts(j * 13 % 89), float(j))
             for j in range(30)]
    # unique (key, ts) on the right — required by the contract
    seen, rdedup = set(), []
    for u, ts, v in rrows:
        if (u, ts) not in seen:
            seen.add((u, ts))
            rdedup.append((u, ts, v))
    left = spark.createDataFrame(
        lrows, "user_id string, event_id long, ts timestamp")
    right = spark.createDataFrame(
        rdedup, "user_id string, ts timestamp, v double")
    got = {r["event_id"]: r["v_asof"]
           for r in asof_join(left, right, on="user_id",
                              ts="ts").collect()}
    for u, eid, lts in lrows:
        cands = [(ts, v) for (ru, ts, v) in rdedup
                 if ru == u and ts <= lts]
        want = max(cands)[1] if cands else None
        assert got[eid] == want, (eid, got[eid], want)


def test_range_join_matches_naive(spark):
    gap = 900  # 15 min
    lrows = [("u%d" % (i % 2), i, _ts(i * 11 % 120)) for i in range(25)]
    rrows = [("u%d" % (j % 2), 1000 + j, _ts(j * 17 % 120))
             for j in range(25)]
    left = spark.createDataFrame(
        lrows, "user_id string, event_id long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "user_id string, err_id long, ts timestamp")
    got = {(r["event_id"], r["err_id_near"]) for r in
           range_join_buckets(left, right, on="user_id", ts="ts",
                              max_gap_s=gap,
                              right_cols=["err_id"]).collect()}
    want = {(i, rj) for (u, i, lts) in lrows
            for (ru, rj, rts) in rrows
            if u == ru and abs((lts - rts).total_seconds()) <= gap}
    assert got == want
    assert want  # non-vacuous


def test_range_join_no_cartesian_plan(spark):
    """The plan must be an equi-join on (key, bucket) — never a
    BroadcastNestedLoopJoin/CartesianProduct from the range
    predicate."""
    import contextlib
    import io

    ev = spark.createDataFrame(
        [("u1", 1, _ts(0))], "user_id string, event_id long, ts timestamp")
    out = range_join_buckets(ev, ev.withColumnRenamed("event_id", "err_id"),
                             on="user_id", ts="ts",
                             right_cols=["err_id"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
