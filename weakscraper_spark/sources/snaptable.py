"""Snapshot-log table — the Iceberg-semantics stand-in the north
rule's pipeline is written against ("Iceberg output table",
checkpoint-based resume, incremental processing). The Catalog shim
(tables.py) maps `iceberg` refs to real Iceberg in prod; THIS module
gives the sandbox the same *semantics* on a plain filesystem so the
pipeline's snapshot-dependent behaviors (time travel, incremental
consumption, atomic commit, rollback, compaction) are exercised for
real instead of being a docstring.

Layout (mirrors the table-format papers' shape at 1/100 the moving
parts — a metadata log over immutable data files):

    <root>/data/<commit>-<i>.parquet     immutable data files
    <root>/_log/v00000001.json           manifest: full file list +
                                         op + parent + stats

Semantics:
- A COMMIT writes data files first, then claims the next manifest
  version with an O_EXCL create — the manifest IS the commit point
  (readers never see half a commit; a crash before the manifest
  leaves only unreferenced files, exactly Iceberg's orphan-file
  story). O_EXCL gives single-winner optimistic concurrency: a
  loser re-reads the log and retries against the new parent.
- READ resolves a manifest (latest or pinned ``version`` = time
  travel) and reads exactly its file list.
- INCREMENTAL(a, b) reads only files ADDED by commits a+1..b —
  append-only change capture; overwrite commits are flagged and
  raise unless the caller opts into full-diff semantics
  (``allow_overwrite=True`` degrades to "read b fully"), because
  silent append-semantics over an overwrite boundary would be wrong.
- COMPACT rewrites current data into fewer files and commits an
  ``op='compact'`` manifest with byte-identical rows — readers of
  any pinned older version still see their exact file list
  (immutability makes compaction safe, the whole point of the
  design).

Scale notes: the manifest holds one entry per file; at 10^12 rows /
~256 MB files that is ~10^5-10^6 entries — Iceberg splits this into
manifest FILES + a manifest list, and this module documents that
seam (`_write_manifest`) rather than reimplementing it; everything
above the manifest (planning = a file-list union, commits = one
rename-class operation) is the same shape.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer claimed the target version first."""


class SnapTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "_log"), exist_ok=True)

    # -- log ---------------------------------------------------------------

    def _log_dir(self) -> str:
        return os.path.join(self.root, "_log")

    def versions(self) -> list[int]:
        return sorted(
            int(f[1:9]) for f in os.listdir(self._log_dir())
            if f.startswith("v") and f.endswith(".json"))

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._log_dir(),
                               f"v{version:08d}.json")) as fh:
            return json.load(fh)

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    # -- commit ------------------------------------------------------------

    def _stage_files(self, df: DataFrame) -> list[str]:
        """Write df's rows as immutable files under data/ and return
        their table-relative paths. Files are invisible until a
        manifest references them."""
        commit_id = uuid.uuid4().hex[:12]
        stage = os.path.join(self.root, "_stage", commit_id)
        df.write.mode("overwrite").parquet(stage)
        rels = []
        for i, name in enumerate(sorted(os.listdir(stage))):
            if not name.endswith(".parquet"):
                continue
            rel = os.path.join("data", f"{commit_id}-{i:05d}.parquet")
            os.rename(os.path.join(stage, name),
                      os.path.join(self.root, rel))
            rels.append(rel)
        for leftover in os.listdir(stage):
            os.remove(os.path.join(stage, leftover))
        os.rmdir(stage)
        return rels

    def _write_manifest(self, manifest: dict, version: int) -> None:
        """O_EXCL create = the atomic commit point. (Prod-scale note:
        Iceberg swaps a manifest-list pointer in the catalog instead
        of writing the full file list — same semantics, O(1)
        metadata per commit.)"""
        path = os.path.join(self._log_dir(), f"v{version:08d}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise CommitConflict(
                f"version {version} already committed") from exc
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)

    def _commit(self, op: str, files: list[str], added: list[str],
                parent: int, schema_json: str | None = None) -> int:
        """Claim exactly ``parent + 1``. The caller must have derived
        ``files`` FROM ``parent``'s manifest — claiming parent+1 (not
        latest+1) is what makes the concurrency optimistic: if
        another writer committed first, parent+1 is taken, the O_EXCL
        create fails, and the loser recomputes against the new
        parent. (An earlier form recomputed the version here at
        commit time, which let a stale-based commit land on a fresh
        version number and silently drop the winner's rows —
        caught in the r04 review.)

        The manifest records the table SCHEMA (as Iceberg manifests
        do): writer commits pass the df's schema, derived ops
        (compact/rollback) inherit the parent's — so a snapshot whose
        file list is empty (first commit was an empty append) still
        reads as a typed empty DataFrame instead of handing
        spark.read.parquet() zero paths (ADVICE r04)."""
        if schema_json is None and parent:
            schema_json = self._manifest(parent).get("schema")
        version = parent + 1
        self._write_manifest(
            {"op": op, "parent": parent, "files": files,
             "added": added, "schema": schema_json,
             "ts": time.time()}, version)
        return version

    def commit_append(self, df: DataFrame, retries: int = 5) -> int:
        """Append df's rows as a new snapshot; returns the version.
        On a concurrency conflict the staged files are re-used
        against the new parent (data files are commit-agnostic)."""
        added = self._stage_files(df)
        for _ in range(retries + 1):
            parent = self.current_version()
            base = self._manifest(parent)["files"] if parent else []
            try:
                return self._commit("append", base + added, added,
                                    parent, df.schema.json())
            except CommitConflict:
                continue
        raise CommitConflict("append lost every retry")

    def commit_overwrite(self, df: DataFrame) -> int:
        """Replace the table contents with df's rows (the idempotent
        re-run story: same run_id → overwrite, never double rows)."""
        added = self._stage_files(df)
        while True:
            try:
                return self._commit("overwrite", added, added,
                                    self.current_version(),
                                    df.schema.json())
            except CommitConflict:
                continue

    def compact(self, target_files: int = 1,
                retries: int = 3) -> int:
        """Rewrite current data into ``target_files`` files —
        byte-identical rows, new snapshot, old versions untouched.
        The read→rewrite window is the widest conflict surface, so
        the whole read+stage is retried against the new parent on
        conflict (stale staged files become invisible orphans)."""
        for _ in range(retries + 1):
            parent = self.current_version()
            added = self._stage_files(
                self.read(parent).coalesce(target_files))
            try:
                return self._commit("compact", added, added, parent)
            except CommitConflict:
                continue
        raise CommitConflict("compact lost every retry")

    def rollback(self, version: int) -> int:
        """Commit a new snapshot whose contents are an older
        version's (history stays linear and append-only — the audit
        trail survives the rollback)."""
        m = self._manifest(version)
        while True:
            try:
                return self._commit("rollback", m["files"], [],
                                    self.current_version(),
                                    m.get("schema"))
            except CommitConflict:
                continue

    # -- read --------------------------------------------------------------

    def _paths(self, files: list[str]) -> list[str]:
        return [os.path.join(self.root, f) for f in files]

    def _empty(self, manifest: dict, v: int) -> DataFrame:
        """Typed empty DataFrame for a snapshot with no data files."""
        schema_json = manifest.get("schema")
        if not schema_json:
            raise ValueError(
                f"snapshot v{v} is empty and records no schema "
                "(committed by a pre-schema writer)")
        from pyspark.sql.types import StructType
        return self.spark.createDataFrame(
            [], StructType.fromJson(json.loads(schema_json)))

    def read(self, version: int | None = None) -> DataFrame:
        """Latest snapshot, or time travel to ``version``."""
        v = self.current_version() if version is None else version
        if v == 0:
            raise ValueError("table has no committed snapshots")
        m = self._manifest(v)
        if not m["files"]:
            return self._empty(m, v)
        return self.spark.read.parquet(*self._paths(m["files"]))

    def incremental(self, from_version: int,
                    to_version: int | None = None,
                    allow_overwrite: bool = False) -> DataFrame:
        """Rows ADDED by commits (from_version, to_version]. Raises
        on an overwrite/rollback boundary unless ``allow_overwrite``
        (then: the full target snapshot, the honest fallback)."""
        to_v = (self.current_version() if to_version is None
                else to_version)
        added: list[str] = []
        for v in range(from_version + 1, to_v + 1):
            m = self._manifest(v)
            if m["op"] in ("overwrite", "rollback"):
                if not allow_overwrite:
                    raise ValueError(
                        f"non-append commit v{v} ({m['op']}) inside "
                        "incremental range; pass allow_overwrite=True "
                        "to read the full target snapshot instead")
                return self.read(to_v)
            if m["op"] == "append":
                added.extend(m["added"])
            # compact adds no logical rows
        if not added:
            return self.read(to_v).limit(0)
        return self.spark.read.parquet(*self._paths(added))

    def history(self) -> Iterator[dict]:
        for v in self.versions():
            m = self._manifest(v)
            yield {"version": v, "op": m["op"], "parent": m["parent"],
                   "n_files": len(m["files"]),
                   "n_added": len(m["added"])}
