"""Keyword relevance search over the corpus: Okapi BM25 (Robertson &
Spärck Jones probabilistic relevance framework — the standard lexical
ranking function) as a declarative Spark plan, complementing the
embedding-side ANN operators (similarity.py) with the lexical half of
a hybrid retrieval stack.

Scale shape (the part that matters at 10^12 docs):
- the corpus-wide token explode is FILTERED TO THE QUERY TERMS
  map-side before any shuffle — only matching (doc, term) rows ever
  enter an exchange (per-query data volume is O(postings of the query
  terms), not O(corpus tokens));
- document frequency is a groupBy over ≤|query| keys → broadcast;
- corpus scalars (N, avgdl) ride a 1-row crossJoin broadcast — no
  driver-side action, the whole plan stays lazy;
- tf aggregation is map-side combinable.

Everything is JVM expressions with DuckDB-portable semantics (ln,
same tokenization as the dedup family), so scores are value-checked
against an oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", col: str = "text",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(id, n_hits, score) for every document matching ≥1 query term.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the standard Okapi
    form; dl/avgdl use whitespace token counts over the full corpus.
    """
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(F.lower(F.col(col))), r"\s+").alias("_t"))
    stats = base.select(F.size("_t").alias("dl")) \
                .agg(F.count("*").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))

    # dl rides the postings rows through the explode: after the
    # map-side term filter every surviving row already carries its
    # document length, so no join against a corpus-width (doc, dl)
    # relation is ever needed (VERDICT r03 #3 — at 10^12 docs that
    # join was a full-corpus shuffle per query). dl is functionally
    # dependent on doc, so adding it to the tf grouping key changes
    # nothing about the aggregation.
    hits = (base.select("doc", F.size("_t").alias("dl"),
                        F.explode("_t").alias("term"))
            .filter(F.col("term").isin(query_terms)))
    tf = hits.groupBy("doc", "dl", "term").agg(F.count("*").alias("tf"))
    df_t = hits.groupBy("term").agg(
        F.count_distinct("doc").alias("df"))

    scored = (tf
              .join(F.broadcast(df_t), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) /
                (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    return (scored
            .withColumn("_s", idf * tf_part)
            .groupBy("doc")
            .agg(F.count("*").alias("n_hits"),
                 F.sum("_s").alias("score"))
            .select(F.col("doc").alias(id_col), "n_hits", "score"))


def tfidf_topk(docs: DataFrame, id_col: str = "doc_id",
               col: str = "text", k: int = 5,
               min_len: int = 2) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the classic document
    summarization / tag-extraction primitive (Spärck Jones 1972 idf):

    (id, term, tf, score, rn)
    score = tf · (ln((N + 1)/(df + 1)) + 1)

    — the smoothed idf with the additive 1 (the scikit-learn
    formulation), which keeps corpus-wide terms (df = N) at weight
    tf · 1 instead of zero, so a doc made only of universal terms
    still ranks keywords by tf. Ties break by term asc — fully
    deterministic, oracle-replayable.

    Scale shape: tf is a map-side-combinable (doc, term) count; df is
    a groupBy over the VOCAB (≪ corpus) whose result joins back on
    the term key — vocab-sized build side, never corpus-width; N
    rides a 1-row broadcast. The rank window runs over the (doc,
    term) AGGREGATE with WindowGroupLimit planting the per-doc top-k
    map-side (the dedup_latest/anchor_topk rule — never a window over
    raw token rows)."""
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(F.lower(F.col(col))), r"\s+").alias("_t"))
    n_docs = base.agg(F.count("*").alias("n_docs"))
    terms = (base.select("doc", F.explode("_t").alias("term"))
             .filter(F.length("term") >= min_len))
    tf = terms.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    df_t = (tf.groupBy("term")
            .agg(F.count("*").alias("df")))  # tf rows are distinct
    scored = (tf.join(df_t, "term")
              .crossJoin(F.broadcast(n_docs))
              .select("doc", "term", "tf",
                      (F.col("tf") * (F.log(
                          (F.col("n_docs") + 1.0) /
                          (F.col("df") + 1.0)) + 1.0)).alias("score")))
    from pyspark.sql import Window
    w = Window.partitionBy("doc").orderBy(F.desc("score"), "term")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(F.col("doc").alias(id_col), "term", "tf",
                    "score", "rn"))


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09):
    fused score = Σ_lists 1/(k + rank). The standard way to combine a
    lexical (BM25) and a vector (cosine ANN) ranking into one hybrid
    retrieval result — rank-based, so the two scorers' incomparable
    score scales never need calibration.

    Each input carries (id, rank) with rank 1-based; k=60 is the
    published default. Scale shape: inputs are top-k lists (small by
    construction) — union + one groupBy on the id key."""
    parts = [r.select(F.col(id_col),
                      (1.0 / (k + F.col("rank"))).alias("_c"))
             for r in rankings]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (allp.groupBy(id_col)
            .agg(F.count("*").alias("n_lists"),
                 F.sum("_c").alias("rrf_score")))
