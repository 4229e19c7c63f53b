"""Snapshot-log table semantics (sources/snaptable.py): atomic
commit point, time travel, incremental consumption, compaction
invariance, rollback, O_EXCL conflict behavior, Catalog integration."""

import os

import pytest
from pyspark.sql import functions as F

from weakscraper_spark.sources.snaptable import CommitConflict, SnapTable
from weakscraper_spark.sources.tables import Catalog


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v"))


def test_append_time_travel_and_history(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    v1 = t.commit_append(_df(spark, 0, 10))
    v2 = t.commit_append(_df(spark, 10, 15))
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 15
    assert t.read(version=1).count() == 10          # time travel
    assert sorted(r.id for r in t.read(version=1).collect()) == \
        list(range(10))
    hist = list(t.history())
    assert [h["op"] for h in hist] == ["append", "append"]
    assert hist[1]["parent"] == 1


def test_incremental_reads_only_added_files(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 10))
    t.commit_append(_df(spark, 10, 15))
    t.commit_append(_df(spark, 15, 18))
    inc = t.incremental(1)                          # commits 2..3
    assert sorted(r.id for r in inc.collect()) == list(range(10, 18))
    assert t.incremental(1, 2).count() == 5
    assert t.incremental(3).count() == 0            # nothing after 3


def test_empty_snapshot_reads_as_typed_empty(spark, tmp_path):
    """A snapshot whose file list is empty (first commit was an empty
    append) must read as a typed empty DataFrame from the manifest's
    recorded schema — not hand spark.read.parquet() zero paths
    (ADVICE r04). Incremental over the empty range follows suit, and
    later real appends still see the normal path."""
    t = SnapTable(spark, str(tmp_path / "t"))
    v1 = t.commit_append(_df(spark, 0, 0))          # zero rows
    got = t.read()
    assert got.count() == 0
    assert [f.name for f in got.schema] == ["id", "v"]
    assert t.incremental(0, v1).count() == 0
    t.commit_append(_df(spark, 0, 5))
    assert t.read().count() == 5
    assert t.read(version=v1).count() == 0          # time travel back


def test_incremental_overwrite_boundary_is_loud(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 10))
    t.commit_overwrite(_df(spark, 100, 103))
    with pytest.raises(ValueError, match="non-append"):
        t.incremental(1)
    # opt-in fallback: the full target snapshot
    assert sorted(r.id for r in
                  t.incremental(1, allow_overwrite=True).collect()) == \
        [100, 101, 102]


def test_compact_preserves_rows_and_old_versions(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 10).repartition(4))
    t.commit_append(_df(spark, 10, 20).repartition(4))
    before = sorted(map(tuple, t.read().collect()))
    n_files_before = len(t._manifest(t.current_version())["files"])
    v = t.compact(target_files=1)
    assert sorted(map(tuple, t.read().collect())) == before
    assert len(t._manifest(v)["files"]) < n_files_before
    # pinned old version still reads its exact original file list
    assert t.read(version=2).count() == 20
    # incremental across a compact adds no phantom rows
    assert t.incremental(2).count() == 0


def test_rollback_keeps_linear_history(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5))
    t.commit_append(_df(spark, 5, 9))
    v3 = t.rollback(1)
    assert v3 == 3
    assert t.read().count() == 5                    # contents of v1
    assert t.read(version=2).count() == 9           # history intact


def test_commit_conflict_single_winner(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5))
    # simulate a racing writer that claimed v2 directly
    t._write_manifest({"op": "append", "parent": 1,
                       "files": [], "added": [], "ts": 0}, 2)
    with pytest.raises(CommitConflict):
        t._write_manifest({"op": "append", "parent": 1,
                           "files": [], "added": [], "ts": 0}, 2)
    # the public API retries against the new parent and succeeds
    v = t.commit_append(_df(spark, 5, 8))
    assert v == 3


def test_stale_commit_conflicts_instead_of_dropping_rows(spark, tmp_path):
    """r04 review: a commit whose file list was derived from a stale
    parent must FAIL (claim parent+1, already taken) — the earlier
    recompute-version-at-commit-time form silently landed the stale
    list on a fresh version, erasing the concurrent winner's rows."""
    t = SnapTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5))                    # v1
    added_a = t._stage_files(_df(spark, 100, 103))       # A stages
    base_a = t._manifest(1)["files"]                     # A reads v1
    t.commit_append(_df(spark, 5, 8))                    # B wins v2
    with pytest.raises(CommitConflict):
        t._commit("append", base_a + added_a, added_a, parent=1)
    # nothing lost, and the retry path (public API shape) lands A
    parent = t.current_version()
    v = t._commit("append",
                  t._manifest(parent)["files"] + added_a, added_a,
                  parent)
    assert v == 3
    assert t.read().count() == 5 + 3 + 3                 # all rows


def test_crash_before_manifest_leaves_no_visible_rows(spark, tmp_path):
    t = SnapTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5))
    # stage files WITHOUT committing (the crash window)
    t._stage_files(_df(spark, 100, 105))
    assert t.read().count() == 5                    # orphans invisible
    assert t.current_version() == 1


def test_run_pipeline_snap_exactly_once(spark, tmp_path):
    """The snapshot-sink pipeline: run 1 commits an increment, run 2
    over a superset extracts ONLY the new urls, a duplicate run 3
    appends nothing; a crash-window staging leaves zero visible rows;
    time travel sees each increment."""
    from weakscraper_spark.plans.pipeline import run_pipeline_snap
    from weakscraper_spark.sources.snaptable import SnapTable
    from weakscraper_spark.sources.synth import (
        compiled_specs, synth_pages, synth_templates)
    root = str(tmp_path / "snap_sink")
    templates = synth_templates(spark)
    specs = compiled_specs()

    r1 = run_pipeline_snap(spark, synth_pages(spark, 60), templates,
                           specs, root)
    t = SnapTable(spark, root)
    n1 = t.read().count()
    assert r1["version"] == 1 and r1["rows_written"] == n1 > 0

    r2 = run_pipeline_snap(spark, synth_pages(spark, 90), templates,
                           specs, root)
    assert r2["version"] == 2
    assert r2["rows_written"] == t.read().count() - n1  # only new work
    assert t.incremental(1, 2).count() == r2["rows_written"]
    assert t.read(version=1).count() == n1              # time travel

    r3 = run_pipeline_snap(spark, synth_pages(spark, 90), templates,
                           specs, root)                  # duplicate
    assert r3["rows_written"] == 0
    assert t.read().count() == n1 + r2["rows_written"]

    # crash window: staged-but-uncommitted files stay invisible
    t._stage_files(synth_pages(spark, 5).limit(5))
    assert t.read().count() == n1 + r2["rows_written"]


def test_catalog_snap_roundtrip(spark, tmp_path):
    cat = Catalog(spark, fmt="snap")
    ref = str(tmp_path / "cat_t")
    cat.append(_df(spark, 0, 7), ref)
    cat.append(_df(spark, 7, 9), ref)
    assert cat.read(ref).count() == 9
    cat.overwrite_partitions(_df(spark, 0, 3), ref)
    assert cat.read(ref).count() == 3
    assert os.path.isdir(os.path.join(ref, "_log"))
