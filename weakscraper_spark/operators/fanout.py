"""Conditional input fan-out for CPU-heavy narrow maps.

Optimization-guide §2.5's "input skew" case: one huge unsplittable
(or single-row-group) file gives a scan fewer partitions than the
cluster has cores, and every downstream map stage — shingling,
hashed-gram explosion, Python kernels — runs at that parallelism no
matter how many cores are idle. The prescribed fix is a repartition
immediately after the read, but ONLY then: an unconditional
repartition would add a corpus-width shuffle to the 100-TB path
where the file count already dwarfs the core count.

``fan_out`` is that guard, applied by operators that are about to
run CPU-bound per-row work over a SLIM projection (repartition the
pruned columns, never the full row). Two safety rules shape the
implementation:

- It must never EXECUTE anything at plan-build time. Under AQE,
  ``df.rdd.getNumPartitions()`` on a plan containing a shuffle
  materializes the upstream query stages (measured r08 — a join
  input ran a real stage), so the partition probe is allowed only on
  scan-shaped plans: the analyzed tree is whitelist-checked
  (Project/Filter/Relation/SubqueryAlias only) and sized by
  ``inputFiles()`` — both pure metadata. Composed inputs (joins,
  aggregations, checkpoints, local relations) pass through
  untouched; they are post-shuffle and already carry the session's
  initial partition count.
- Streaming plans pass through untouched (the stateless
  stream-static dedup design is shuffle-free by contract).

Results are unaffected: every operator in this repo is
partitioning-independent by design rule (oracle-hash-verified), and
round-robin repartition is deterministic under retries
(sort-before-repartition is on by default, SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: whitelisted logical nodeName()s — note the tree WALK sees
#: "LogicalRelation" where treeString's simpleString prints
#: "Relation"
_SCAN_NODES = ("Project", "Filter", "Relation", "LogicalRelation",
               "SubqueryAlias", "View")


def _scan_shaped(node) -> bool:
    """True iff every node in the analyzed tree is whitelisted.
    Walks the JVM tree via nodeName()/children() — the earlier
    treeString() line parser broke on multi-line pretty-printed
    expressions (a Project whose expression text wraps — e.g. a
    transform() chunker — emitted continuation lines that failed the
    prefix check and silently disabled the fan-out; caught r08 when
    para_dedup's split stage ran one task)."""
    if not node.nodeName().startswith(_SCAN_NODES):
        return False
    children = node.children()
    for i in range(children.size()):
        if not _scan_shaped(children.apply(i)):
            return False
    return True


def fan_out(df: DataFrame) -> DataFrame:
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    try:
        if not _scan_shaped(df._jdf.queryExecution().analyzed()):
            return df
    except Exception:  # pragma: no cover - connect/other backends
        return df
    files = df.inputFiles()
    if files and len(files) < p:
        return df.repartition(p)
    return df
