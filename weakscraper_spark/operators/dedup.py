"""Deduplication family for a training-data corpus (first-class
engine operators, graded alongside the extraction pipeline):

- exact_dedup        — hash-groupBy on a canonical fingerprint (C-style
                       exact dedup; oracle-checkable).
- minhash_lsh_pairs  — MinHash + banded LSH candidate pairs. The
                       min-hash primitive is ``min(md5(seed||token))``
                       (lexicographic min of a keyed hash) so the SAME
                       computation runs in DuckDB for the oracle — no
                       xxhash divergence. Shuffle profile at scale:
                       explode(tokens) → groupBy(doc) partial agg →
                       band self-join on band signature (equi-join,
                       AQE-coalesced); no cross join anywhere.
- ngram_jaccard_pairs— rare-token Jaccard similarity (document-
                       frequency-capped to bound the token join; the
                       df-cap is the standard stop-token guard that
                       keeps the self-join linear-ish at 100 TB).
- simhash64          — 64-bit SimHash per doc via Arrow batches, with
                       an md5-based token hash so the bit-majority is
                       mirrored 1:1 in DuckDB (value-checked oracle),
                       + banded Hamming candidate pairs whose banding
                       is recall-EXACT for the requested distance —
                       so the pair set equals the brute-force twin
                       and is oracle-checkable too.
- paragraph_dedup    — CCNet-style corpus-wide first-occurrence
                       paragraph dedup with per-doc rebuild (two-phase
                       min agg, never a window on the paragraph key).

Transitive clustering of the candidate pairs lives in graph.py
(connected components); the single-pass greedy verdict in
corpus.clean_corpus is the default.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .textstats import with_fingerprint


def _overcap_keys(df: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Keys whose group size exceeds ``cap`` — computed TWO-PHASE
    (groupBy count with map-side partial aggregation), never a window:
    ``count(*) over (partition by key)`` materializes every instance
    of the hottest key in one task's window buffer before the cap can
    filter it — a guaranteed straggler partition when a boilerplate
    key has 10⁹ occurrences at corpus scale. The partial agg sends
    ~one row per (task, key) into a tiny exchange instead, and the
    result is small by construction (only over-cap keys), so callers
    broadcast it and drop hot rows MAP-SIDE before any shuffle.

    Callers persist their source (DISK_ONLY) before branching on it:
    the count is a SECOND consumer of the source subtree, and
    exchange-level reuse cannot serve consumers whose pruned columns /
    inferred null filters differ (Catalyst canonicalizes each branch's
    exchange differently — measured, r03). One disk-backed
    materialization beats re-evaluating an expensive explode per
    branch and beats an in-memory cache several times corpus size."""
    return (df.groupBy(*keys).agg(F.count("*").alias("n"))
            .filter(F.col("n") > cap))


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                col: str = "text") -> DataFrame:
    """Group by canonical md5 fingerprint; keep min(id) as canonical,
    count members. Two-phase under the hood (Catalyst partial+final
    hash agg) — scales to any corpus."""
    return (with_fingerprint(df, col)
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count("*").alias("n_members"))
            )


def _tokens(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """Distinct (id, token) pairs; lowercase alpha tokenization shared
    with the oracle SQL."""
    return (df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(
            F.split(F.lower(F.col(col)), "[^a-z0-9]+"))).alias("tok"))
        .filter(F.col("tok") != ""))


def _shingles(df: DataFrame, id_col: str, col: str,
              k: int = 3) -> DataFrame:
    """Distinct (id, word-k-gram) pairs. Shingles (not unigrams) are
    the dedup unit: unigram vocab is tiny relative to corpus size, so
    every doc overlaps every doc; k-gram space is |V|^k and document
    frequency collapses (measured: 31-word vocab → 3-gram max df 8 on
    the sandbox corpus). Mirrored 1:1 in the oracle SQL via
    list_transform(range(...)).

    The token array is MATERIALIZED as a column before the gram
    lambda: Catalyst does not common-subexpression-eliminate inside
    ``transform`` lambdas, so referencing ``split(text)`` directly in
    the per-gram ``element_at`` calls re-splits the document for
    every element access — O(grams × k) full tokenizations per doc
    (measured 2.5-4× on the whole shingle stage at sf0.1).

    Deliberately NOT routed through ``_shingle_array`` + a second
    select: stacking the materialized-array Project under a
    single-reference consumer lets InferFiltersFromGenerate /
    predicate pushdown substitute the whole shingle expression into
    a pre-scan Filter — re-tokenizing every doc a second time (the
    r07 refactor tried exactly that and the plan guard caught it);
    the explode must sit in the SAME select as the shingle
    expression over the materialized token column."""
    from .fanout import fan_out
    base = fan_out(df.select(id_col, col))
    return _one_sql(base, f"""
        SELECT doc, explode(array_distinct({_shingle_sql('_t', k)}))
               AS tok
        FROM (SELECT `{id_col}` AS doc,
                     split(trim(lower(`{col}`)), '\\\\s+') AS _t
              FROM {{v}})""")


def _one_sql(src: DataFrame, query: str) -> DataFrame:
    """Run ``query`` (with ``{v}`` standing for ``src``) as ONE
    spark.sql statement. Every DataFrame method materializes a new
    Dataset and re-analyzes its whole tree eagerly (~10 ms per
    operator on this host, growing with tree depth), so an
    N-operator builder pays O(N²) analysis node-visits; a single SQL
    statement analyzes the finished tree once. Measured r08:
    minhash_lsh_pairs' pure plan CONSTRUCTION was 447 ms — the same
    class of driver-side cost as G3's per-element literals. The view
    is resolved eagerly by spark.sql and deliberately NOT dropped:
    ``dropTempView`` also UNCACHES any cached query matching the
    view's plan, which silently unpersisted the DISK_ONLY signature
    table the moment its band view was cleaned up (caught by the
    two-InMemoryTableScan plan test). Names are unique per call, so
    the leak is one catalog metadata entry, nothing more."""
    global _SQL_SEQ
    _SQL_SEQ += 1
    v = f"dedup_sql_{_SQL_SEQ}"
    src.createOrReplaceTempView(v)
    return src.sparkSession.sql(query.format(v=v))


#: monotone suffix for ``_one_sql`` temp-view names
_SQL_SEQ = 0


def _shingle_sql(tk: str, k: int) -> str:
    """The word-k-shingle array expression (SQL text) over a
    materialized token-array column ``tk`` — the one construction
    ``_shingles`` and ``_shingle_array`` share (r07 review: they
    were verbatim copies held equal only by a test). ``tk`` must
    name a MATERIALIZED column (the lambda-CSE rule above)."""
    els = ", ".join(f"element_at({tk}, i + {j})" for j in range(k))
    return (f"CASE WHEN size({tk}) >= {k} "
            f"THEN transform(sequence(1, size({tk}) - {k - 1}), "
            f"i -> concat_ws(' ', {els})) "
            f"ELSE CAST(array() AS array<string>) END")


def _shingle_expr(tk_name: str, k: int):
    """Column form of ``_shingle_sql`` for Column-API call sites."""
    return F.expr(_shingle_sql(tk_name, k))


def _shingle_array(df: DataFrame, id_col: str, col: str,
                   k: int) -> DataFrame:
    """(doc, _sh): the DISTINCT word-k-shingle ARRAY per doc — the
    row-local form ``minhash_bands_narrow`` builds on. Consumers
    must NOT filter directly above this relation (predicate pushdown
    substitutes ``_sh`` into a pre-scan Filter that re-shingles the
    corpus — plan-guard lesson); filter beyond a Generate instead."""
    from .fanout import fan_out
    base = fan_out(df.select(id_col, col))
    return _one_sql(base, f"""
        SELECT doc, array_distinct({_shingle_sql('_t', k)}) AS _sh
        FROM (SELECT `{id_col}` AS doc,
                     split(trim(lower(`{col}`)), '\\\\s+') AS _t
              FROM {{v}})""")


def _band_structs_sql(n_hashes: int, band_size: int) -> str:
    """The LSH band-key struct array (SQL text) over sig0..sig{n-1}
    columns — shared by the batch and narrow band builders (same
    drift rationale as ``_shingle_sql``)."""
    n_bands = n_hashes // band_size
    structs = ", ".join(
        "struct({b} AS band, concat_ws('|', {cols}) AS bkey)".format(
            b=b,
            cols=", ".join(f"sig{b * band_size + j}"
                           for j in range(band_size)))
        for b in range(n_bands))
    return f"array({structs})"


def _band_structs_expr(n_hashes: int, band_size: int):
    """Column form of ``_band_structs_sql``."""
    return F.expr(_band_structs_sql(n_hashes, band_size))


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       col: str = "text", n_hashes: int = 8,
                       shingle_k: int = 3) -> DataFrame:
    """k min-hashes per doc over word-shingles: sig_i = min over
    shingles of md5(i || ':' || shingle). One explode + one groupBy
    (map-side combine); k is a column fan-out, not a data fan-out."""
    toks = _shingles(df, id_col, col, shingle_k)
    aggs = ", ".join(
        f"min(md5(encode(concat('{i}:', tok), 'UTF-8'))) AS sig{i}"
        for i in range(n_hashes))
    return _one_sql(toks, f"SELECT doc, {aggs} FROM {{v}} GROUP BY doc")


def _minhash_bands(df: DataFrame, id_col: str, col: str,
                   n_hashes: int, band_size: int, shingle_k: int,
                   persist_sigs: bool = False) -> DataFrame:
    """Exploded (doc, band, bkey) table — one row per doc per LSH
    band. One explode, not a union of n_bands selects: a union
    re-evaluates the whole signature subtree per branch; explode
    computes it once and fans out rows in the same narrow map.

    ``persist_sigs`` pins the per-doc signature table (narrow:
    id + n_hashes md5 strings, ~300 B/doc — orders of magnitude under
    the shingle table it derives from) to executor disk so a caller
    branching on the bands (the bucket-cap count) re-evaluates only
    the cheap band fan-out, never the shingle explode + min-agg."""
    sigs = minhash_signatures(df, id_col, col, n_hashes, shingle_k)
    if persist_sigs:
        from pyspark import StorageLevel
        sigs = sigs.persist(StorageLevel.DISK_ONLY)
    return _one_sql(sigs, f"""
        SELECT doc, _bs.band AS band, _bs.bkey AS bkey
        FROM (SELECT doc,
                     explode({_band_structs_sql(n_hashes, band_size)})
                     AS _bs
              FROM {{v}})""")


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      col: str = "text", n_hashes: int = 8,
                      band_size: int = 2, shingle_k: int = 3,
                      max_bucket: int = 64) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band
    (band = concat of ``band_size`` consecutive signatures). Returns
    (doc_a, doc_b, n_bands) with doc_a < doc_b.

    ``max_bucket`` caps the per-band bucket size BEFORE the self-join:
    one giant duplicate cluster (or a degenerate all-identical band
    key) would otherwise make the band join O(c²) in that cluster's
    size — the classic LSH blow-up at corpus scale. Docs in an
    over-cap bucket are trivially near-identical and belong to exact /
    cluster dedup, not pairwise LSH; the dropped bucket keys are a
    first-class AUDITABLE side output (``minhash_overcap_buckets``),
    never a silent hole. The cap is two-phase (``_overcap_keys``) +
    broadcast anti-join, so an over-cap bucket's rows are filtered
    MAP-SIDE and never enter the self-join shuffle at all — no window
    buffer, no hot-key straggler task; the count branch reads the
    disk-persisted signature table, so the shingle explode + min-agg
    run once. Mirrored 1:1 in the DuckDB oracle (QUALIFY on the same
    count)."""
    exploded = _minhash_bands(df, id_col, col, n_hashes, band_size,
                              shingle_k,
                              persist_sigs=max_bucket is not None)
    if max_bucket is not None:
        overcap = _overcap_keys(exploded, ["band", "bkey"], max_bucket)
        exploded = exploded.join(F.broadcast(overcap.select("band", "bkey")),
                                 ["band", "bkey"], "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (a.join(b, ["band", "bkey"])
            .filter(F.col("a.doc") < F.col("b.doc"))
            .groupBy(F.col("a.doc").alias("doc_a"),
                     F.col("b.doc").alias("doc_b"))
            .agg(F.count("*").alias("n_bands")))


def minhash_bands_narrow(df: DataFrame, id_col: str = "doc_id",
                         col: str = "text", n_hashes: int = 8,
                         band_size: int = 2,
                         shingle_k: int = 3) -> DataFrame:
    """The band relation computed ROW-LOCALLY — identical values to
    ``minhash_band_store`` (same shingles, same md5 min-hashes, same
    band keys; equality pinned by test) but as pure JVM array
    expressions with ZERO shuffle: sig_i = array_min over the
    distinct-shingle array of md5(i ':' shingle). The batch path's
    explode + groupBy exists for map-side-combine ergonomics on the
    shared shingle relation; this narrow form is the STREAMING-SAFE
    shape (no stateful aggregation, so it composes into an append-
    mode stream with no watermark) and the right choice whenever
    only the bands are needed."""
    # the distinct-shingle ARRAY is materialized as a column
    # (_shingle_array) before the sig lambdas — Catalyst does not
    # CSE inside transform lambdas (the r03 lesson); referencing the
    # shingle expression in 8 sig expressions would re-split and
    # re-shingle the doc 8 times. NO filter here: a filter above the
    # _sh Project gets substituted down into a pre-scan Filter that
    # re-shingles every doc (plan guard); empty-shingle docs are
    # dropped AFTER the band explode instead (bkey '' ⇔ all-NULL
    # sigs ⇔ empty _sh — and a filter on a generated column cannot
    # be pushed below its Generate)
    shingled = _shingle_array(df, id_col, col, shingle_k)
    def _sig(i: int):
        # bind i through a factory, NOT a `lambda t, i=i:` default
        # arg — pyspark's transform() dispatches on lambda ARITY and
        # passes the array index as the second parameter, silently
        # shadowing the hash-index binding (found by the
        # narrow-equals-batch equality test)
        return F.array_min(F.transform(
            F.col("_sh"),
            lambda t: F.md5(F.encode(
                F.concat(F.lit(f"{i}:"), t), "UTF-8"))))

    sigs = [_sig(i).alias(f"sig{i}") for i in range(n_hashes)]
    with_sigs = shingled.select("doc", *sigs)
    return (with_sigs.select(
        "doc",
        F.explode(_band_structs_expr(n_hashes, band_size))
         .alias("_bs"))
        .select("doc", F.col("_bs.band").alias("band"),
                F.col("_bs.bkey").alias("bkey"))
        .filter(F.col("bkey") != ""))


def minhash_band_store(df: DataFrame, id_col: str = "doc_id",
                       col: str = "text", n_hashes: int = 8,
                       band_size: int = 2,
                       shingle_k: int = 3) -> DataFrame:
    """The PERSISTED near-dup state of a weekly pipeline: the
    (doc, band, bkey) LSH band table — ~100 B/doc, orders of
    magnitude under the text it derives from. Write it next to the
    corpus sink; next week's batch dedups against it via
    ``minhash_incremental_pairs`` WITHOUT re-shingling a byte of the
    existing corpus. Exactly the relation ``minhash_lsh_pairs``
    self-joins internally (same signatures, same band keys), so
    incremental and full-recompute candidate sets agree."""
    return _minhash_bands(df, id_col, col, n_hashes, band_size,
                          shingle_k)


def minhash_incremental_pairs(new_bands: DataFrame,
                              old_bands: DataFrame,
                              max_bucket: int = 64) -> DataFrame:
    """Incremental LSH candidate pairs — every pair TOUCHING the new
    batch: (doc_a, doc_b, n_bands, side ∈ {new_new, new_old}),
    doc_a < doc_b. Equals ``minhash_lsh_pairs`` re-run over
    old ∪ new, restricted to pairs with ≥ 1 new member (the bucket
    cap is applied to the COMBINED bucket sizes, so a bucket that
    went over cap this week is excluded exactly as a full recompute
    would exclude it — no cap drift between the two paths).

    Scale shape: the join is NEW-side × bucket-members — work is
    proportional to the new batch's bucket contacts, never
    O(old²); the old corpus contributes only its ~100-byte band rows
    (one scan, no shingling, no text). The combined-cap count is the
    usual two-phase agg + broadcast anti-join."""
    from pyspark import StorageLevel

    new_tag = new_bands.select("doc", "band", "bkey",
                               F.lit(True).alias("_new"))
    old_tag = old_bands.select("doc", "band", "bkey",
                               F.lit(False).alias("_new"))
    # pin the combined band relation (~100 B/doc): it feeds the
    # overcap count AND both join sides — without the persist the
    # NEW batch is re-shingled and the store re-scanned three times
    # (r07 plan audit: 137-node plan, 9 scans)
    allb = new_tag.unionByName(old_tag) \
        .persist(StorageLevel.DISK_ONLY)
    overcap = _overcap_keys(allb, ["band", "bkey"], max_bucket)
    capped = allb.join(F.broadcast(overcap.select("band", "bkey")),
                       ["band", "bkey"], "left_anti")
    n = (capped.filter("_new")
         .select("band", "bkey", F.col("doc").alias("_dn")))
    al = capped.select("band", "bkey", F.col("doc").alias("_do"),
                       F.col("_new").alias("_no"))
    j = (n.join(al, ["band", "bkey"])
         .filter(F.col("_dn") != F.col("_do")))
    # a new-new pair meets twice per shared band (both orientations)
    # — countDistinct(band) counts shared bands exactly once for
    # both pair kinds
    return (j.groupBy(
                F.least("_dn", "_do").alias("doc_a"),
                F.greatest("_dn", "_do").alias("doc_b"))
            .agg(F.countDistinct("band").alias("n_bands"),
                 F.max("_no").alias("_nn"))
            .select("doc_a", "doc_b", "n_bands",
                    F.when(F.col("_nn"), "new_new")
                     .otherwise("new_old").alias("side")))


def minhash_overcap_buckets(df: DataFrame, id_col: str = "doc_id",
                            col: str = "text", n_hashes: int = 8,
                            band_size: int = 2, shingle_k: int = 3,
                            max_bucket: int = 64) -> DataFrame:
    """Audit side output for ``minhash_lsh_pairs``: the (band, bkey,
    n_docs) bucket keys whose size exceeds ``max_bucket`` — i.e. the
    giant near-identical clusters EXCLUDED from pairwise LSH. Feed
    these to ``minhash_overcap_canonicals`` (keep-one-per-cluster) so
    capped clusters are resolved explicitly rather than dropped
    invisibly."""
    exploded = _minhash_bands(df, id_col, col, n_hashes, band_size,
                              shingle_k)
    return (_overcap_keys(exploded, ["band", "bkey"], max_bucket)
            .select("band", "bkey", F.col("n").alias("n_docs")))


def minhash_overcap_canonicals(df: DataFrame, id_col: str = "doc_id",
                               col: str = "text", n_hashes: int = 8,
                               band_size: int = 2, shingle_k: int = 3,
                               max_bucket: int = 64) -> DataFrame:
    """Cluster-level dedup for the buckets the pairwise cap excludes:
    every doc in an over-cap (band, bkey) bucket maps to that bucket's
    canonical (min doc id); a doc in several over-cap buckets takes
    the smallest. Returns (doc, canonical_id) covering exactly the
    over-cap membership — together with ``minhash_lsh_pairs`` this
    closes the cap's coverage hole: sub-cap similarity is pairwise,
    over-cap clusters collapse to a representative.

    (Single-pass min, not iterative connected components — exact when
    giant clusters are bucket-disjoint, which near-identical
    boilerplate clusters are; the iterative refinement is a driver
    loop over this primitive if ever needed.)

    Scale shape: bucket membership can be billions of rows (these ARE
    the giant clusters) — both aggs are partial+final (no windows),
    the bucket-canonical table is #over-cap-buckets rows (broadcast),
    and the only big shuffle is the final per-doc min."""
    exploded = _minhash_bands(df, id_col, col, n_hashes, band_size,
                              shingle_k, persist_sigs=True)
    overcap = _overcap_keys(exploded, ["band", "bkey"], max_bucket)
    members = exploded.join(F.broadcast(overcap.select("band", "bkey")),
                            ["band", "bkey"], "left_semi")
    canon = (members.groupBy("band", "bkey")
             .agg(F.min("doc").alias("bucket_canonical")))
    return (members.join(F.broadcast(canon), ["band", "bkey"])
            .groupBy("doc")
            .agg(F.min("bucket_canonical").alias("canonical_id")))


# --------------------------------------------------------------------------
# Rare-token Jaccard
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        col: str = "text", max_df: int = 100,
                        min_jaccard: float = 0.5,
                        shingle_k: int = 3) -> DataFrame:
    """Pairwise Jaccard over word-shingles with a document-frequency
    cap (df <= max_df). The df-cap bounds each shingle's pair fan-out
    to O(max_df²), which is what keeps the self-join from going
    quadratic on boilerplate shingles at corpus scale. Returns
    (doc_a, doc_b, jaccard).

    The df-cap is TWO-PHASE (``_overcap_keys``): a partial-agg count
    finds the over-cap shingles (tiny by construction) which are
    broadcast and anti-joined MAP-SIDE — a boilerplate shingle with
    10⁹ occurrences is dropped before its rows ever shuffle, where the
    r02 window-count form first funneled all of them into one task's
    window buffer (linear but a guaranteed straggler at 100 TB) and
    additionally paid the window's full sort of the exploded table.

    Evaluation discipline: the exploded shingle table has FOUR
    consumers (cap count, both self-join sides, per-doc sizes) whose
    pruned columns / inferred filters differ, so exchange-level reuse
    cannot serve them all (measured, r03 — each branch re-ran the
    explode, 2.7× the wall). It is therefore persisted DISK_ONLY:
    one evaluation, streamed back from executor disk per consumer —
    the same disk-bytes class as the single shuffle the r02 form
    wrote, with no memory pressure (never an in-memory cache: that
    would be several times corpus size at 100 TB). The self-join's
    two sides remain identical subtrees ending at the same
    Exchange(tok), so that shuffle still happens exactly once
    (ReuseExchange), and it carries only sub-cap rows."""
    from pyspark import StorageLevel

    toks = _shingles(df, id_col, col, shingle_k) \
        .persist(StorageLevel.DISK_ONLY)
    overcap = _overcap_keys(toks, ["tok"], max_df)
    rtoks = toks.join(F.broadcast(overcap.select("tok")),
                      "tok", "left_anti")
    sizes = rtoks.groupBy("doc").agg(F.count("*").alias("sz"))
    a, b = rtoks.alias("a"), rtoks.alias("b")
    inter = (a.join(b, "tok")
             .filter(F.col("a.doc") < F.col("b.doc"))
             .groupBy(F.col("a.doc").alias("doc_a"),
                      F.col("b.doc").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard",
                        F.round(F.col("inter") /
                                (F.col("sz_a") + F.col("sz_b") -
                                 F.col("inter")), 4))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("doc_a", "doc_b", "jaccard"))


# --------------------------------------------------------------------------
# SimHash (Arrow-batched; bit-majority not SQL-portable)
# --------------------------------------------------------------------------

def _simhash64(text: str, shingle_k: int = 3) -> int:
    """64-bit SimHash over distinct word-k-shingles. The per-token
    hash is the FIRST 8 BYTES OF md5 (big-endian) — same reason as
    the minhash primitive: md5 exists in DuckDB, so the whole
    bit-majority is mirrored 1:1 in the oracle SQL and simhash is
    value-checked, not rows-only. Docs shorter than k words hash to 0
    (consistent with ``_shingles``' empty-array behavior)."""
    from hashlib import md5

    words = text.lower().split()
    feats = (set(" ".join(words[i:i + shingle_k])
                 for i in range(len(words) - shingle_k + 1))
             if len(words) >= shingle_k else set())
    acc = [0] * 64
    for tok in feats:
        h = int.from_bytes(md5(tok.encode()).digest()[:8], "big")
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    v = 0
    for bit in range(64):
        if acc[bit] > 0:
            v |= 1 << bit
    # two's-complement into Spark's signed LongType
    return v - (1 << 64) if v >= (1 << 63) else v


def _simhash64_batch(texts, shingle_k: int = 3) -> list[int]:
    """Vectorized batch twin of ``_simhash64`` (identical values —
    equality pinned by test): md5 per distinct shingle stays a C call,
    but the per-shingle 64-iteration Python bit loop becomes one
    numpy bit-matrix + segmented sum over the whole batch (guide §4.2:
    hand batches to vectorized native code, ~10× on the Python stage
    measured r08). acc[bit] = Σ(2·b−1) = 2·Σb − n, sign threshold
    unchanged, so the majority vote is integer-identical."""
    from hashlib import md5

    import numpy as np

    all_h: list[int] = []
    offs = [0]
    for text in texts:
        words = text.lower().split()
        if len(words) >= shingle_k:
            feats = set(" ".join(words[i:i + shingle_k])
                        for i in range(len(words) - shingle_k + 1))
            all_h.extend(int.from_bytes(md5(t.encode()).digest()[:8],
                                        "big") for t in feats)
        offs.append(len(all_h))
    if not all_h:
        return [0] * len(texts)
    hs = np.array(all_h, dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    bits = ((hs[:, None] >> bit_idx) & np.uint64(1)).astype(np.int32)
    csum = np.concatenate([np.zeros((1, 64), dtype=np.int64),
                           bits.cumsum(axis=0, dtype=np.int64)])
    shifts = np.uint64(1) << bit_idx
    out: list[int] = []
    for i in range(len(offs) - 1):
        s, e = offs[i], offs[i + 1]
        if s == e:
            out.append(0)
            continue
        acc = (csum[e] - csum[s]) * 2 - (e - s)
        v = int(shifts[acc > 0].sum(dtype=np.uint64))
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return out


def simhash(df: DataFrame, id_col: str = "doc_id",
            col: str = "text") -> DataFrame:
    """(id, simhash) via mapInPandas — Arrow batch transfer, token-set
    bit-majority per document vectorized across the batch
    (``_simhash64_batch``)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc": pdf[id_col],
                "simhash": _simhash64_batch(list(pdf[col].astype(str))),
            })

    from .fanout import fan_out
    return fan_out(df.select(id_col, col)) \
        .mapInPandas(run, "doc long, simhash long")


def simhash_band_pairs(sh: DataFrame, max_hamming: int = 3,
                       drop_zero: bool = True,
                       max_bucket: int | None = None) -> DataFrame:
    """Banded Hamming candidate pairs over a ``(doc, simhash)``
    DataFrame. Chunk count is DERIVED from ``max_hamming``: with k
    chunks, a pair differing in <= k-1 bits must share at least one
    exact chunk (pigeonhole), so k = max_hamming + 1 guarantees full
    recall — a fixed 4-chunk split silently missed distance-4..8
    pairs straddling all chunks. Equi-join per chunk, exact Hamming
    check via bit_count(xor), no cross join.

    ``drop_zero`` (default ON) excludes ``simhash = 0`` docs: every
    document shorter than ``shingle_k`` words hashes to exactly 0
    (``_simhash64``), so at corpus scale the zero bucket holds ALL
    short/empty docs — billions of rows sharing all k chunks, an
    O(c²) self-join on one key. Degenerate docs belong to
    ``exact_dedup`` (they are byte-near-empty), not Hamming LSH.
    Mirrored in the DuckDB oracle (``WHERE simhash <> 0``).

    ``max_bucket`` (opt-in) additionally caps any remaining giant
    bucket per (chunk, ckey) — e.g. an exact-duplicate cluster, which
    shares ALL chunks (the composed pipeline runs ``exact_dedup``
    FIRST, so this is a belt-and-braces guard). Same two-phase count →
    broadcast anti-join as minhash, applied PRE-shuffle, with one
    twist: the source here is the expensive Python simhash stage, and
    the count branch is a second consumer of it (Catalyst pushes the
    anti-join below any explicit repartition — PushDownLeftSemiAntiJoin
    — so exchange-level reuse cannot serve both consumers). The NARROW
    ``(doc, simhash)`` table (~16 B/row — orders of magnitude under
    the exploded chunk shuffle the join pays anyway) is therefore
    persisted to executor DISK for the duration: Python runs once,
    the cheap JVM explode runs per consumer, and an over-cap bucket's
    rows never enter the shuffle. Capped pairs are intentionally
    absent; recall-exactness then holds for the sub-cap remainder."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], "
                         f"got {max_hamming}")
    if drop_zero:
        sh = sh.filter(F.col("simhash") != 0)
    if max_bucket is not None:
        from pyspark import StorageLevel
        sh = sh.persist(StorageLevel.DISK_ONLY)
    n_chunks = max_hamming + 1
    width = 64 // n_chunks  # last chunk takes the remainder bits
    # one explode, not a union of n_chunks selects: with an expensive
    # source (simhash is a Python mapInPandas stage) a union would
    # re-run the source once PER CHUNK; explode fans out k rows per
    # doc in the same narrow map, source computed once
    chunk_structs = []
    for c in range(n_chunks):
        start = c * width
        w = width if c < n_chunks - 1 else 64 - start
        key = F.shiftrightunsigned("simhash", start)
        if w < 64:
            key = key.bitwiseAND(F.lit((1 << w) - 1))
        chunk_structs.append(F.struct(F.lit(c).alias("chunk"),
                                      key.alias("ckey")))
    exploded = (sh.select(
        "doc", "simhash", F.explode(F.array(*chunk_structs)).alias("_cs"))
        .select("doc", "simhash", F.col("_cs.chunk").alias("chunk"),
                F.col("_cs.ckey").alias("ckey")))
    if max_bucket is not None:
        # two-phase cap (module pattern): counts via partial agg over
        # the persisted narrow table's explode, broadcast the tiny
        # over-cap key set, drop hot rows MAP-SIDE before the shuffle
        overcap = _overcap_keys(exploded, ["chunk", "ckey"], max_bucket)
        exploded = exploded.join(
            F.broadcast(overcap.select("chunk", "ckey")),
            ["chunk", "ckey"], "left_anti")
    # pre-shuffle on the join key: the self-join needs this exchange
    # anyway, and making it explicit lets ReuseExchange serve BOTH
    # join sides from one evaluation of the (persisted or, uncapped,
    # single-subtree) simhash source (2x -> 1x mapInPandas)
    chunks = exploded.repartition("chunk", "ckey")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (a.join(b, ["chunk", "ckey"])
            .filter(F.col("a.doc") < F.col("b.doc"))
            .select(F.col("a.doc").alias("doc_a"),
                    F.col("b.doc").alias("doc_b"),
                    F.bit_count(F.col("a.simhash").bitwiseXOR(
                        F.col("b.simhash"))).alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    col: str = "text", sep: str = "\n") -> DataFrame:
    """Paragraph-level exact dedup (the CCNet/C4 line-dedup shape):
    split each document on ``sep``, keep only the corpus-wide FIRST
    occurrence of each distinct paragraph (order = (id, position) —
    deterministic, partitioning-independent), and rebuild every
    document from its kept paragraphs in original order.

    Returns (id, text_dedup, n_pars, n_kept) for EVERY input doc —
    a doc whose paragraphs are all superseded comes back with
    ``text_dedup = ''`` and ``n_kept = 0``, never silently dropped.

    Scale shape: posexplode (narrow) → two-phase groupBy(par) min —
    the first-occurrence rule is an aggregation, not a window, so the
    hottest paragraph (an empty string, a boilerplate line repeated
    10⁹×) is combined map-side instead of buffered in one task —
    → equi-join back on par → groupBy(id) rebuild. Two shuffles, both
    on narrow (id, pos, hash-sized) rows; the heavy text column never
    fans out beyond its own paragraphs.

    ``sep`` is a LITERAL separator (regex-escaped before it reaches
    ``F.split``, which takes a Java regex — ADVICE r03: a sep like
    '.' or '|' would otherwise silently switch semantics and diverge
    from the string-literal DuckDB oracle twin)."""
    pars = _split_units(df, id_col, col, sep)
    first = pars.groupBy("par").agg(
        F.min(F.struct(id_col, "pos")).alias("_first"))
    kept = (pars.join(first, "par")
            .filter((F.col(id_col) == F.col("_first")[id_col]) &
                    (F.col("pos") == F.col("_first")["pos"]))
            .select(id_col, "pos", "par"))
    return _rebuild_docs(df, kept, id_col, col, sep,
                         text_name="text_dedup", total_name="n_pars")


def _split_units(df: DataFrame, id_col: str, col: str,
                 sep: str) -> DataFrame:
    """(id, pos, par) rows: documents split on the LITERAL ``sep``
    with positions — the shared first half of the line/paragraph
    operators (one definition: the r03 literal-escape fix and any
    future change apply everywhere)."""
    from .fanout import fan_out
    return fan_out(df.select(id_col, col)).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(col),
                             re.escape(sep))).alias("pos", "par"))


def _rebuild_docs(df: DataFrame, kept: DataFrame, id_col: str,
                  col: str, sep: str, text_name: str,
                  total_name: str) -> DataFrame:
    """Reassemble per-doc text from surviving (id, pos, par) rows in
    original order (aggregation, never a window), plus unit totals;
    docs whose units all died come back with '' and n_kept = 0 —
    the shared second half of the line/paragraph operators."""
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "par"))),
                lambda s: s["par"]),
            sep).alias(text_name),
        F.count("*").alias("n_kept"))
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(col),
                       re.escape(sep))).alias(total_name))
    return (totals.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce(text_name, F.lit("")).alias(text_name),
                    total_name,
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept")))


def line_frequency_filter(df: DataFrame, id_col: str = "doc_id",
                          col: str = "text", max_docs: int = 2,
                          sep: str = "\n") -> DataFrame:
    """C4's boilerplate-line rule (Raffel et al., JMLR'20 §2.2 —
    "any line occurring in three or more documents is removed"):
    drop EVERY occurrence of a line that appears in more than
    ``max_docs`` DISTINCT documents. Complements ``paragraph_dedup``
    (first-occurrence-wins keeps one copy; this removes ALL copies of
    corpus-frequent boilerplate like cookie banners).

    Returns (id, text_kept, n_lines, n_kept) for every input doc.

    Scale shape: posexplode (narrow) → two-phase count_distinct per
    line (map-side partial; the hot boilerplate line combines before
    the shuffle) → equi-join back → groupBy(id) rebuild. Shares the
    split/rebuild scaffolding with ``paragraph_dedup`` — only the
    keep-predicate differs."""
    pars = _split_units(df, id_col, col, sep)
    freq = pars.groupBy("par").agg(
        F.count_distinct(id_col).alias("_ndocs"))
    kept = (pars.join(freq, "par")
            .filter(F.col("_ndocs") <= max_docs)
            .select(id_col, "pos", "par"))
    return _rebuild_docs(df, kept, id_col, col, sep,
                         text_name="text_kept", total_name="n_lines")


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       col: str = "text", max_hamming: int = 3,
                       drop_zero: bool = True,
                       max_bucket: int | None = None) -> DataFrame:
    """Near-dup candidates: simhash64 per doc, then banded Hamming
    join (``simhash_band_pairs``) with recall guaranteed for the
    requested ``max_hamming`` (over nonzero-hash docs; see
    ``simhash_band_pairs`` for the degenerate-bucket rationale)."""
    return simhash_band_pairs(simhash(df, id_col, col), max_hamming,
                              drop_zero=drop_zero, max_bucket=max_bucket)


def incremental_dedup(new_docs: DataFrame, corpus: DataFrame,
                      id_col: str = "doc_id", col: str = "text",
                      n_hashes: int = 8, band_size: int = 2,
                      shingle_k: int = 3,
                      max_bucket: int = 64) -> DataFrame:
    """Incremental corpus update: classify each NEW document against
    the EXISTING corpus without recomputing the corpus —

    - ``exact_dup``   — fingerprint already present in the corpus;
    - ``near_dup``    — shares ≥1 MinHash band bucket with a corpus
                        doc (new-vs-existing equi-join, NOT a
                        corpus-wide self-join: per-update cost is
                        O(new × bucket overlap));
    - ``new``         — neither.

    Returns (id, verdict, match_id) for every new doc, where
    ``match_id`` is the smallest matching corpus doc id (NULL for
    ``new``) — auditable like every other drop path. The corpus side
    recomputes fingerprints/signatures here for self-containment; a
    production deployment persists those as tables and feeds them in
    directly (both sides of the joins are plain DataFrames, so the
    saved-state form is the same call).

    Within-batch duplicates (two NEW docs duplicating each other but
    not the corpus) are deliberately out of scope — run the batch
    through ``exact_dedup``/``minhash_lsh_pairs``/``clean_corpus``
    first; this operator answers only "is it already in the corpus".

    The ``max_bucket`` cap applies to CORPUS-side buckets (the only
    side that can hold a giant cluster): new docs landing in an
    over-cap bucket still match via the exact path or surface in the
    cluster-canonical audit, mirroring ``minhash_lsh_pairs``."""
    new_fp = with_fingerprint(new_docs.select(id_col, col), col) \
        .select(F.col(id_col).alias("nid"), col, "fingerprint")
    corp_fp = with_fingerprint(corpus.select(id_col, col), col) \
        .select(F.col(id_col).alias("cid"), "fingerprint")
    exact = (new_fp.join(corp_fp, "fingerprint")
             .groupBy("nid").agg(F.min("cid").alias("exact_match")))

    new_bands = _minhash_bands(new_docs, id_col, col, n_hashes,
                               band_size, shingle_k) \
        .select(F.col("doc").alias("nid"), "band", "bkey")
    corp_bands = _minhash_bands(corpus, id_col, col, n_hashes,
                                band_size, shingle_k,
                                persist_sigs=max_bucket is not None) \
        .select(F.col("doc").alias("cid"), "band", "bkey")
    if max_bucket is not None:
        overcap = _overcap_keys(corp_bands, ["band", "bkey"],
                                max_bucket)
        corp_bands = corp_bands.join(
            F.broadcast(overcap.select("band", "bkey")),
            ["band", "bkey"], "left_anti")
    near = (new_bands.join(corp_bands, ["band", "bkey"])
            .groupBy("nid").agg(F.min("cid").alias("near_match")))

    verdict = (F.when(F.col("exact_match").isNotNull(),
                      F.lit("exact_dup"))
               .when(F.col("near_match").isNotNull(),
                     F.lit("near_dup"))
               .otherwise(F.lit("new")))
    return (new_fp.select("nid")
            .join(exact, "nid", "left")
            .join(near, "nid", "left")
            .select(F.col("nid").alias(id_col),
                    verdict.alias("verdict"),
                    F.coalesce("exact_match", "near_match")
                    .alias("match_id")))
