"""Model-based quality classification — the distributed Naive-Bayes
log-odds scorer that stands in for the fastText-style linear
classifiers production corpus pipelines use for model-based
filtering (CCNet's LM filter, DCLM's fastText quality classifier,
RefinedWeb's URL classifier). A bag-of-tokens NB classifier IS a
linear model over token counts, trains in two map-side-combinable
aggregations, and — unlike SGD-trained weights — is bit-for-bit
deterministic, so the whole train+score path is value-checked
against a DuckDB twin rather than rows-only.

Reference parity note: the weakscraper reference (pure per-page
extraction library, SURVEY §1) has no classifier; this belongs to
the training-data-pipeline family the build brief adds.

Scale shape: token counts per class are one explode + one groupBy
(map-side combine on the token key); the class totals and vocab size
are single-row aggregates broadcast via a cross join; scoring joins
each doc's tokens against the per-token log-odds relation on the
token key — the same shuffle pattern as ``bigram_logprob``, no
windows, no driver collects. Hot tokens ("the") are absorbed by
map-side combine during training; at scoring time the join key is
the token, whose skew is bounded by AQE skew-join handling, and the
per-doc re-agg key is the doc id (uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def nb_token_logodds(df: DataFrame, label_col: str,
                     col: str = "text",
                     alpha: float = 0.5) -> DataFrame:
    """Train: per-token add-alpha log-odds relation
    (token, c_pos, c_neg, logodds) from a corpus whose ``label_col``
    is 1 (positive / keep-worthy) or 0.

    logodds(w) = ln((c_pos + a) / (N_pos + a*V))
               - ln((c_neg + a) / (N_neg + a*V))

    with V = |vocab over BOTH classes|, N_c = total token count in
    class c. Tokens seen in only one class get the smoothed floor on
    the other side — no -inf, no dropped vocabulary."""
    tok = (df.select(F.col(label_col).cast("int").alias("_y"),
                     F.explode(F.split(F.trim(F.lower(F.col(col))),
                                       r"\s+")).alias("w")))
    counts = (tok.groupBy("w")
              .agg(F.sum("_y").alias("c_pos"),
                   F.sum(1 - F.col("_y")).alias("c_neg")))
    totals = counts.agg(F.sum("c_pos").alias("n_pos"),
                        F.sum("c_neg").alias("n_neg"),
                        F.count("*").alias("v"))
    return (counts.crossJoin(F.broadcast(totals))
            .select("w",
                    F.col("c_pos").cast("long").alias("c_pos"),
                    F.col("c_neg").cast("long").alias("c_neg"),
                    (F.log((F.col("c_pos") + alpha) /
                           (F.col("n_pos") + alpha * F.col("v"))) -
                     F.log((F.col("c_neg") + alpha) /
                           (F.col("n_neg") + alpha * F.col("v"))))
                    .alias("logodds")))


def nb_score(df: DataFrame, model: DataFrame,
             id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Score every document against a trained log-odds relation:
    (id, n_scored, nb_score) where nb_score is the MEAN log-odds of
    the doc's tokens that appear in the model vocabulary (mean, not
    sum, so the score is length-invariant — the fastText convention
    for quality thresholds). Docs with zero in-vocabulary tokens
    return n_scored = 0 and NULL nb_score — visible, not defaulted."""
    tok = (df.select(F.col(id_col).alias("doc"),
                     F.explode(F.split(F.trim(F.lower(F.col(col))),
                                       r"\s+")).alias("w")))
    scored = (tok.join(model.select("w", "logodds"), "w")
              .groupBy("doc")
              .agg(F.count("*").alias("n_scored"),
                   F.avg("logodds").alias("nb_score")))
    return (df.select(F.col(id_col).alias("doc")).distinct()
            .join(scored, "doc", "left")
            .select(F.col("doc").alias(id_col),
                    F.coalesce("n_scored", F.lit(0))
                    .cast("long").alias("n_scored"),
                    "nb_score"))


def nb_quality_filter(df: DataFrame, label_col: str,
                      id_col: str = "doc_id", col: str = "text",
                      alpha: float = 0.5,
                      threshold: float = 0.0) -> DataFrame:
    """Self-train-and-score composition (the CCNet pattern: the
    labeled seed IS part of the corpus): train log-odds on ``df``'s
    own ``label_col``, score every doc, and emit the keep verdict
    (id, n_scored, nb_score, keep). ``keep`` is score > threshold —
    mean-log-odds 0.0 is the class-indifference point."""
    model = nb_token_logodds(df, label_col, col=col, alpha=alpha)
    out = nb_score(df, model, id_col=id_col, col=col)
    return out.withColumn(
        "keep", (F.col("nb_score") > threshold).cast("boolean"))
