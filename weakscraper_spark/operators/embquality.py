"""Embedding-column hygiene — the QA pass a corpus runs BEFORE the
similarity/ANN family (similarity.py) will behave: zero vectors land
every doc in one SRP bucket, NaN/Inf poison every dot product, and
norm outliers distort cosine thresholds. At 100 TB these are not
hypothetical — encoder OOM rows, truncation bugs, and all-pad inputs
produce exactly these degeneracies.

- ``embedding_stats``: per-vector diagnostics (dim, l2_norm, min/max
  component, n_nonfinite, is_degenerate) — the filter predicate feed.
- ``norm_outliers``: per-group (label/source) z-score of the L2 norm
  — the distribution-level screen for batch-level encoder faults
  (one bad shard shifts its whole group).

Scale shape: ``embedding_stats`` is a pure narrow map — JVM
``aggregate``/``filter`` lambdas over the vector, every float cast to
double BEFORE the fold so both engines sum identical doubles in array
order (bit-stable cross-engine). ``norm_outliers`` adds one tiny
groupBy over |groups| keys whose result broadcasts back — the corpus
never shuffles."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _l2(vec: Column) -> Column:
    """Σx² folded in array order over doubles, then sqrt — the same
    sequential semantics DuckDB's list_sum gives, so values hash-match
    cross-engine at full precision before any rounding."""
    return F.sqrt(F.aggregate(
        vec, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))


def embedding_stats(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, dim, l2_norm, min_v, max_v, n_nonfinite, is_degenerate)

    ``is_degenerate`` = NULL/empty vector, any non-finite component,
    or zero norm — the rows the ANN family must never see.
    ``array_min``/``array_max`` are NaN-poisoned in both engines only
    when NaN is present, which is_degenerate already flags."""
    vec = F.col(vec_col)
    nonfinite = F.size(F.filter(
        vec, lambda x: F.isnan(x.cast("double")) |
        (F.abs(x.cast("double")) == float("inf"))))
    l2 = _l2(vec)
    return df.select(
        F.col(id_col),
        F.coalesce(F.size(vec), F.lit(0)).cast("int").alias("dim"),
        l2.alias("l2_norm"),
        F.array_min(vec).cast("double").alias("min_v"),
        F.array_max(vec).cast("double").alias("max_v"),
        F.coalesce(nonfinite, F.lit(0)).cast("int").alias("n_nonfinite"),
        (vec.isNull() | (F.coalesce(F.size(vec), F.lit(0)) == 0) |
         (F.coalesce(nonfinite, F.lit(0)) > 0) | F.isnan(l2) |
         (l2 == 0.0)).alias("is_degenerate"))


def norm_outliers(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  group_col: str = "label") -> DataFrame:
    """(id, group, l2_norm, group_mean, group_std, z) — the L2 norm's
    z-score against its GROUP's population stats (stddev_pop: the
    group is the whole population, not a sample). Degenerate vectors
    (embedding_stats) are excluded from both the stats and the
    output; a single-member or constant-norm group has std 0 and
    yields z NULL (no evidence, not an outlier)."""
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(group_col).alias("grp"),
                      _l2(F.col(vec_col)).alias("l2_norm"),
                      F.col(vec_col).alias("_v"))
            .filter(F.col("l2_norm").isNotNull() &
                    ~F.isnan("l2_norm") & (F.col("l2_norm") > 0.0) &
                    (F.size(F.filter(
                        F.col("_v"),
                        lambda x: F.isnan(x.cast("double")) |
                        (F.abs(x.cast("double")) == float("inf"))))
                     == 0))
            .drop("_v"))
    stats = base.groupBy("grp").agg(
        F.avg("l2_norm").alias("group_mean"),
        F.stddev_pop("l2_norm").alias("group_std"))
    return (base.join(F.broadcast(stats), "grp")
            .select(F.col("id").alias(id_col),
                    F.col("grp").alias(group_col),
                    "l2_norm", "group_mean", "group_std",
                    F.when(F.col("group_std") > 0.0,
                           (F.col("l2_norm") - F.col("group_mean")) /
                           F.col("group_std")).alias("z")))
