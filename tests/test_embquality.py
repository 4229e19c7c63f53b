"""Embedding hygiene: per-vector diagnostics, degeneracy flags,
group z-scores, and the broadcast-join plan shape."""

import contextlib
import io
import math
import re

import pytest

from weakscraper_spark.operators.embquality import (embedding_stats,
                                                    norm_outliers)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [3.0, 4.0], "a"),            # norm 5
        (2, [0.0, 0.0], "a"),            # zero vector
        (3, [float("nan"), 1.0], "a"),   # NaN component
        (4, [float("inf"), 1.0], "a"),   # Inf component
        (5, [], "a"),                    # empty
        (6, None, "a"),                  # NULL
        (7, [6.0, 8.0], "b"),            # norm 10
        (8, [0.6, 0.8], "b"),            # norm 1
        (9, [3.3, 4.4], "b"),            # norm 5.5
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")


def test_stats_values(vecs):
    got = {r.vec_id: r for r in embedding_stats(vecs).collect()}
    assert got[1].dim == 2 and abs(got[1].l2_norm - 5.0) < 1e-12
    assert got[1].min_v == 3.0 and got[1].max_v == 4.0
    assert got[1].n_nonfinite == 0 and not got[1].is_degenerate


def test_degenerate_flags(vecs):
    got = {r.vec_id: r.is_degenerate
           for r in embedding_stats(vecs).collect()}
    assert got == {1: False, 2: True, 3: True, 4: True, 5: True,
                   6: True, 7: False, 8: False, 9: False}


def test_nonfinite_counts(vecs):
    got = {r.vec_id: r.n_nonfinite
           for r in embedding_stats(vecs).collect()}
    assert got[3] == 1 and got[4] == 1 and got[6] == 0


def test_outliers_exclude_degenerates(vecs):
    out = norm_outliers(vecs, group_col="label").collect()
    assert {r.vec_id for r in out} == {1, 7, 8, 9}


def test_zscores(vecs):
    out = {r.vec_id: r for r in
           norm_outliers(vecs, group_col="label").collect()}
    # group a surviving member: only vec 1 -> std 0 -> z NULL
    assert out[1].z is None
    # group b: norms {10, 1, 5.5}; mean 5.5, std_pop sqrt(27/2)
    # float32 inputs: values land within a few ulps of the ideal
    std = math.sqrt(((10 - 5.5) ** 2 + (1 - 5.5) ** 2 + 0) / 3)
    assert abs(out[7].group_mean - 5.5) < 1e-6
    assert abs(out[7].z - (10 - 5.5) / std) < 1e-6
    assert abs(out[9].z) < 1e-6


def test_stats_join_is_broadcast(vecs):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        norm_outliers(vecs, group_col="label").explain("formatted")
    txt = buf.getvalue()
    assert "BroadcastHashJoin" in txt, txt
    assert "SortMergeJoin" not in txt, txt


def test_stats_plan_is_narrow(vecs):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        embedding_stats(vecs).explain("formatted")
    names = [m.group(1) for m in
             re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)",
                         buf.getvalue(), re.M)]
    assert "Exchange" not in names, names
    assert "ArrowEvalPython" not in names, names
