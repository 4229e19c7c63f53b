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
