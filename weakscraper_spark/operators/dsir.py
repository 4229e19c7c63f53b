"""DSIR — Data Selection with Importance Resampling (Xie et al.
2023, arXiv:2302.03169, public): score every raw document by how
target-like it is under two bag-of-hashed-n-grams models, then keep
the top mass. The standard pretraining-data selection step when a
small high-quality target corpus (e.g. curated reference text)
should steer selection over a huge raw crawl.

Model: unigram+bigram features hashed into ``n_buckets`` buckets
(the paper's hashed n-gram features); per side, add-α-smoothed
bucket probabilities; per raw document,

    log w(doc) = Σ_instances [ln p_target(b) − ln p_raw(b)]

Everything is JVM column expressions over the repo's mirrored
tokenization and md5-bucket draw, so weights and selection are
value-checked against a DuckDB twin end-to-end.

Scale shape (10^12 raw docs): ONE corpus-width explode of gram
instances (tokens materialized as a column first — Catalyst does not
CSE inside lambdas); bucket id is a narrow md5 map; the raw model is
a map-side-combinable groupBy on the bucket key (B buckets — tiny);
the target side is small by definition; the per-bucket log-ratio
table is O(B) and BROADCAST back onto the instance stream; the only
doc-keyed shuffle is the final per-doc sum. The selection threshold
is one interpolated percentile over the weight relation (no corpus
sort), broadcast back — the ``prune_by_quantile`` discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(gram: Column, n_buckets: int, seed: int) -> Column:
    """The repo's md5-uniform draw, folded to a bucket id — mirrored
    verbatim in DuckDB as ('0x' || substr(md5(...), 1, 15))::UBIGINT
    % B (15 hex chars < 2^60, exact in BIGINT both sides)."""
    return (F.conv(F.substring(
                F.md5(F.encode(F.concat(F.lit(f"{seed}:g:"), gram),
                               "UTF-8")), 1, 15), 16, 10)
            .cast("long") % n_buckets)


def _gram_instances(df: DataFrame, id_col: str, col: str,
                    n_buckets: int, seed: int) -> DataFrame:
    """(doc, b) — one row per unigram AND bigram instance, bucketed.
    Tokens materialized as a column before the gram lambdas (the
    lambda-CSE trap); bigrams via zip_with over two shifted slices
    (equal lengths, no padding)."""
    from .fanout import fan_out
    tk = (fan_out(df.select(id_col, col))
          .select(F.col(id_col).alias("doc"),
                  F.split(F.trim(F.lower(F.col(col))),
                          r"\s+").alias("_t"))
          .withColumn("_n", F.size("_t")))
    unis = tk.select("doc", F.explode("_t").alias("g"))
    bis = (tk.filter(F.col("_n") >= 2)
           .select("doc", F.explode(F.zip_with(
               F.slice("_t", 1, F.col("_n") - 1),
               F.slice("_t", 2, F.col("_n") - 1),
               lambda a, b: F.concat(a, F.lit(" "), b))).alias("g")))
    return (unis.unionByName(bis)
            .select("doc", _bucket(F.col("g"), n_buckets, seed)
                    .alias("b")))


def _bucket_counts(inst: DataFrame) -> DataFrame:
    return inst.groupBy("b").agg(F.count("*").alias("c"))


def dsir_weights(raw: DataFrame, target: DataFrame,
                 id_col: str = "doc_id", col: str = "text",
                 n_buckets: int = 1024, alpha: float = 1.0,
                 seed: int = 42) -> DataFrame:
    """(id, n_grams, logw) for every RAW document. ``logw`` is the
    summed per-instance log probability ratio, rounded to 6dp so the
    value (and any threshold derived from it) hashes identically
    across engines. Docs with NULL text produce no gram rows and get
    n_grams 0 / logw 0.0 — visible, not dropped; note the mirrored
    tokenization maps '' to [''] (one empty-string unigram), so an
    empty-TEXT doc scores that one bucket like every other engine
    surface in this repo does.

    Weights are LENGTH-PROPORTIONAL sums (the paper's form — longer
    docs accumulate more evidence either way). Sizing note: pick
    ``alpha``/``n_buckets`` so the smoothing mass α·B is small
    against each side's total gram count — when α·B dominates (tiny
    corpora), every per-instance ratio is pulled toward the
    ln((Cr+αB)/(Ct+αB)) constant and long docs sink regardless of
    content. At corpus scale the default is fine; tests/tiny runs
    want alpha ≈ 0.01."""
    from pyspark import StorageLevel

    # the RAW gram stream feeds TWO consumers (the raw model's bucket
    # count and the per-doc ratio sum) whose pruned columns differ, so
    # exchange reuse can't serve both — without a persist the corpus-
    # width tokenize + explode + md5-bucket map runs twice (measured
    # r08: the duplicated gram stage was ~40% of dsir_select's wall).
    # DISK_ONLY, same size class and rationale as the jaccard shingle
    # persist; the target side has one consumer and stays lazy.
    inst_r = _gram_instances(raw, id_col, col, n_buckets, seed) \
        .persist(StorageLevel.DISK_ONLY)
    inst_t = _gram_instances(target, id_col, col, n_buckets, seed)
    cr = _bucket_counts(inst_r)
    ct = _bucket_counts(inst_t)
    # coalesce: an EMPTY side sums to NULL, which would null every
    # ratio and silently zero every weight (r06 review: an empty
    # target then made dsir_select keep 100% of the corpus); with 0
    # the smoothed model degrades gracefully to uniform
    tot_r = cr.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("Cr"))
    tot_t = ct.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("Ct"))
    a = float(alpha)
    ab = a * n_buckets
    ratios = (cr.withColumnRenamed("c", "c_r")
              .join(ct.withColumnRenamed("c", "c_t"), "b", "full")
              .select("b",
                      F.coalesce("c_r", F.lit(0)).alias("c_r"),
                      F.coalesce("c_t", F.lit(0)).alias("c_t"))
              .crossJoin(F.broadcast(tot_r))
              .crossJoin(F.broadcast(tot_t))
              .select("b",
                      (F.log(F.col("c_t") + a)
                       - F.log(F.col("Ct") + ab)
                       - F.log(F.col("c_r") + a)
                       + F.log(F.col("Cr") + ab)).alias("ratio")))
    per_doc = (inst_r.join(F.broadcast(ratios), "b")
               .groupBy("doc")
               .agg(F.count("*").alias("n_grams"),
                    F.round(F.sum("ratio"), 6).alias("logw")))
    return (raw.select(F.col(id_col).alias("doc"))
            .join(per_doc, "doc", "left")
            .select(F.col("doc").alias(id_col),
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                     .alias("n_grams"),
                    F.coalesce("logw", F.lit(0.0)).alias("logw")))


def dsir_select(raw: DataFrame, target: DataFrame,
                keep_frac: float = 0.5, id_col: str = "doc_id",
                col: str = "text", n_buckets: int = 1024,
                alpha: float = 1.0, seed: int = 42) -> DataFrame:
    """The selection verdict: (id, n_grams, logw, threshold, keep) —
    ``keep`` marks the top ``keep_frac`` of raw docs by importance
    weight. Threshold = the exact interpolated (1−keep_frac)
    percentile of the (6dp-rounded) weights — F.percentile matches
    DuckDB quantile_cont bit-for-bit (r05) — computed once and
    broadcast back; no corpus sort, no window."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got "
                         f"{keep_frac}")  # prune_by_quantile contract
    w = dsir_weights(raw, target, id_col, col, n_buckets, alpha,
                     seed)
    thr = w.agg(F.percentile("logw",
                             F.lit(1.0 - keep_frac)).alias("thr"))
    return (w.crossJoin(F.broadcast(thr))
            .select(id_col, "n_grams", "logw",
                    F.col("thr").alias("threshold"),
                    (F.col("logw") >= F.col("thr")).alias("keep")))
