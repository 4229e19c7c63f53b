"""Similarity search over an embedding column (``array<float>``).

- cosine_topk      — brute-force top-k (the correctness baseline;
                     oracle-checked against DuckDB list_cosine_similarity).
                     Dot products via ``F.zip_with`` + ``F.aggregate``
                     in float64 — JVM-side, no Python.
- lsh_cosine_topk  — the scale path: random-hyperplane (SRP) bucket
                     signatures from DETERMINISTIC hash-derived planes,
                     equi-join on bucket prefix, exact re-rank inside
                     buckets. At 100 TB the brute-force cross join is
                     O(Q×N); SRP turns it into O(Q×N/2^bits) per probe
                     with identical output for all but boundary
                     neighbors (recall check in tests).
"""

from __future__ import annotations

from hashlib import blake2b

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    """Float64 dot product of two array columns (index-order fold —
    deterministic summation order, matching the oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def with_cosine(df: DataFrame, a: str, b: str,
                out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbors for each query vector. ``queries`` is
    small (broadcast side); candidates = full table scan. Returns
    (query_id, neighbor_id, rank) — rank by cosine desc, neighbor id
    asc tie-break (deterministic)."""
    q = queries.select(F.col(qid_col), F.col(vec_col).alias("_qv"))
    cand = emb.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"))
    scored = (cand.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col(qid_col))
              .withColumn("_sim", _dot(F.col("_qv"), F.col("_cv")) /
                          (_norm(F.col("_qv")) * _norm(F.col("_cv")))))
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, "neighbor_id", "rank"))


# --------------------------------------------------------------------------
# Signed-random-projection LSH (scale path)
# --------------------------------------------------------------------------

def _plane(seed: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: ±1 entries from a keyed
    hash — reproducible on every executor with no RNG state."""
    return [
        1.0 if blake2b(f"{seed}:{plane}:{d}".encode(),
                       digest_size=4).digest()[0] & 1 else -1.0
        for d in range(dim)
    ]


def srp_signature(df: DataFrame, vec_col: str = "embedding",
                  n_planes: int = 8, dim: int = 64,
                  seed: int = 42) -> DataFrame:
    """Append an n_planes-bit bucket id: bit i = sign(v · plane_i).
    Planes are literal arrays folded JVM-side — no Python, no shuffle."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array([F.lit(x) for x in _plane(seed, p, dim)])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
        sig = sig + F.shiftleft(bit, p)
    return df.withColumn("bucket", sig)


def cosine_near_pairs(emb: DataFrame, threshold: float = 0.9,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT: every (a, b) with
    cosine >= threshold, doc order a < b. This is the correctness
    baseline (oracle-checked against DuckDB list_cosine_similarity);
    it is an all-pairs comparison and therefore the small-N path —
    the scale path is ``srp_cosine_near_pairs``. Cosine rounded to
    4dp so Spark and the oracle hash identically."""
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("_vb"))
    return (a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine",
                        F.round(_dot(F.col("_va"), F.col("_vb")) /
                                (_norm(F.col("_va")) * _norm(F.col("_vb"))),
                                4))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def srp_cosine_near_pairs(emb: DataFrame, threshold: float = 0.9,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Embedding-cosine near-dup pairs, SCALE path: SRP-bucket
    equi-self-join (candidates share all n_planes sign bits), exact
    cosine check inside buckets. O(sum of bucket²) instead of O(N²);
    at cosine >= 0.9 the angle is < 26°, so most true pairs share
    buckets — recall-bounded (tested), not exact: pairs straddling a
    hyperplane are missed, which is the standard LSH trade."""
    sig = srp_signature(emb, vec_col, n_planes, dim)
    a = sig.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("_va"), "bucket")
    b = sig.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("_vb"), "bucket")
    return (a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine",
                        F.round(_dot(F.col("_va"), F.col("_vb")) /
                                (_norm(F.col("_va")) * _norm(F.col("_vb"))),
                                4))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
            .distinct())


def lsh_cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id", n_planes: int = 8,
                    dim: int = 64) -> DataFrame:
    """ANN top-k: candidates share the query's SRP bucket (equi-join on
    bucket), exact cosine re-rank inside. Trade recall for a
    2^n_planes candidate reduction; neighbors straddling a hyperplane
    can be missed (tested recall bound, not exactness)."""
    e = srp_signature(emb, vec_col, n_planes, dim).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        "bucket")
    q = srp_signature(queries, vec_col, n_planes, dim).select(
        F.col(qid_col), F.col(vec_col).alias("_qv"), "bucket")
    scored = (e.join(F.broadcast(q), "bucket")
              .filter(F.col("neighbor_id") != F.col(qid_col))
              .withColumn("_sim", _dot(F.col("_qv"), F.col("_cv")) /
                          (_norm(F.col("_qv")) * _norm(F.col("_cv")))))
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, "neighbor_id", "rank"))
