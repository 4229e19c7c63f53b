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
    # normalize at the API boundary: document tokens are lowercased,
    # so a case-carrying query would otherwise match nothing and be
    # indistinguishable from a true miss (r05 review)
    query_terms = [t.lower() for t in query_terms]
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


def build_postings(docs: DataFrame, terms: list[str] | None = None,
                   id_col: str = "doc_id",
                   col: str = "text") -> DataFrame:
    """Positional inverted index — the retrieval structure BM25's
    postings implicitly stream through, materialized as a table:

    (term, id, tf, positions)   positions = sorted array<int>, 1-based

    ``terms`` restricts the index to a term subset with the BM25
    map-side discipline: the filter runs on the exploded token rows
    BEFORE the groupBy, so only matching (doc, term, pos) rows ever
    enter the shuffle — per-call volume is O(postings of the listed
    terms), not O(corpus tokens). ``terms=None`` builds the full
    index (the one-off offline artifact; same plan, no filter).
    Tokenization mirrors the dedup/BM25 family (lower + whitespace
    split) so DuckDB twins check values bit-for-bit."""
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(col))), r"\s+"))
         .alias("p0", "term"))
    if terms is not None:
        # lowercase at the boundary — tokens are lowercased (r05 review)
        base = base.filter(F.col("term").isin(
            [t.lower() for t in terms]))
    return (base
            .groupBy("term", "doc")
            .agg(F.count("*").cast("int").alias("tf"),
                 F.sort_array(F.collect_list(
                     (F.col("p0") + 1).cast("int"))).alias("positions"))
            .select("term", F.col("doc").alias(id_col), "tf",
                    "positions"))


def phrase_search(docs: DataFrame, phrase: list[str],
                  id_col: str = "doc_id",
                  col: str = "text") -> DataFrame:
    """Exact-phrase retrieval over the positional index:

    (id, n_matches, first_positions)   for docs containing the
    adjacent token sequence ``phrase``; ``first_positions`` is the
    sorted 1-based positions where the phrase STARTS.

    Plan: one postings build filtered map-side to the phrase's
    (deduplicated) terms, then a left-deep chain of |phrase|−1
    equi-joins on doc — each step intersects the previous match
    positions shifted by one with the next term's postings, so a
    repeated-term phrase ("batch batch") gets overlapping
    occurrences right by construction. Every joined relation is the
    postings of ONE term (corpus-frequency-bounded, far below doc
    count for real queries); the intersect math is JVM array
    expressions."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    phrase = [t.lower() for t in phrase]
    p = build_postings(docs, terms=sorted(set(phrase)),
                       id_col=id_col, col=col)
    cur = (p.filter(F.col("term") == phrase[0])
           .select(F.col(id_col).alias("doc"),
                   F.col("positions").alias("_m")))
    for i, t in enumerate(phrase[1:], start=1):
        nxt = (p.filter(F.col("term") == t)
               .select(F.col(id_col).alias("doc"),
                       F.col("positions").alias(f"_p{i}")))
        cur = (cur.join(nxt, "doc")
               .select("doc", F.array_intersect(
                   F.transform("_m", lambda x: x + 1),
                   F.col(f"_p{i}")).alias("_m"))
               .filter(F.size("_m") > 0))
    # _m holds the LAST term's positions; shift back to phrase starts
    off = len(phrase) - 1
    return cur.select(
        F.col("doc").alias(id_col),
        F.size("_m").cast("int").alias("n_matches"),
        F.sort_array(F.transform(
            "_m", lambda x: x - off)).alias("first_positions"))
