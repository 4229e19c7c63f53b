"""Distributed connected components over candidate-duplicate pairs —
the step that turns pairwise near-dup evidence (MinHash/SimHash/SRP
buckets) into DUPLICATE CLUSTERS with a canonical representative, so
corpus dedup is transitive (a~b, b~c ⇒ one cluster) instead of the
single-pass greedy verdict ``clean_corpus`` uses by default.

Algorithm: iterative min-label propagation — every node repeatedly
takes the minimum label among itself and its neighbors until no
label changes. Converges in O(graph diameter) rounds; duplicate
clusters in web corpora are near-cliques (diameter ≤ ~3 via the
shared bucket/band structure), so 3-5 rounds close them. Each round
is one equi-join + groupBy-min (map-side combinable) — no windows,
no driver-side graph. Lineage is truncated per round (an iterative
plan would otherwise grow exponentially and re-execute every prior
round) — ``localCheckpoint`` by default, reliable ``checkpoint``
into ``checkpoint_dir`` when given (localCheckpoint pins lineage
blocks to executor storage: lost on executor death, so preemptible
clusters should pass a durable dir); the per-round convergence
check is one count action. For adversarial long-chain graphs at
10^12 edges, ``algorithm="star"`` switches to the published
O(log n)-round alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) behind the same signature — a path of 2^k nodes converges
in O(k) alternations instead of 2^k propagation rounds (tested).
Min-propagation stays the default because it is deterministic,
simple to audit, and exactly mirrorable as a DuckDB recursive CTE —
which makes cluster assignment VALUE-CHECKED, not just plausible;
both algorithms produce the identical (node → min id) labeling.

Determinism: labels are node ids, min is total, iteration count
depends only on the graph — same output on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .iterstate import ckpt as _ckpt




def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 25,
                         algorithm: str = "minprop",
                         checkpoint_dir: str | None = None) -> DataFrame:
    """(src, dst) pair rows → (node, component) where ``component``
    is the minimum node id reachable from ``node``. Output covers
    every node appearing in ``edges`` (isolated docs never enter a
    pair list; union them back as their own component if needed).

    ``algorithm``: "minprop" (default, O(diameter) rounds) or "star"
    (alternating large-star/small-star, O(log n) rounds — the
    adversarial-long-chain choice; module docstring). Identical
    output either way.

    Sandbox timing note: per-round wall here is dominated by fixed
    job/stage scheduling on near-empty partitions (the candidate
    graph is tiny at test scale); that overhead amortizes away
    exactly when the graph is big enough to matter. A conf-scoped
    "size shuffles to the graph" variant was measured and did NOT
    beat the plain form on this host — kept simple on purpose.

    Raises after ``max_iter`` non-converged rounds rather than
    returning a silently-partial clustering."""
    if algorithm == "star":
        return _connected_components_star(edges, src, dst, max_iter,
                                          checkpoint_dir)
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = _ckpt(sym.distinct(), checkpoint_dir)
    # seed labels with min(node, direct neighbors) — the first
    # propagation round for free inside the node derivation (cliques
    # and stars then converge on the first convergence check)
    labels = (sym.groupBy("a")
              .agg(F.least(F.first("a"), F.min("b")).alias("lbl"))
              .select(F.col("a").alias("node"), "lbl"))
    # STATIC planning for the round loop (iterstate.static_loop, r08):
    # under AQE every per-round exchange is its own scheduler job;
    # statically the convergence count is the round's ONE job and the
    # lazy checkpoint cascades into it. Partitions = the materialized
    # edge set's count (data-derived). Labels are integer/string mins
    # — identical under any partitioning.
    from .iterstate import static_loop
    with static_loop(edges.sparkSession, sym.rdd.getNumPartitions()):
        for _ in range(max_iter):
            nbr_min = (sym.join(labels.select(F.col("node").alias("b"),
                                              F.col("lbl").alias("nlbl")),
                                "b")
                       .groupBy("a").agg(F.min("nlbl").alias("min_nbr")))
            # the changed-flag rides the update row itself — the
            # convergence check is a filter-count over the checkpointed
            # result, not a second join against the old labels (one
            # fewer shuffle per round, measured ~40% of the per-round
            # wall)
            upd = F.least(F.col("lbl"),
                          F.coalesce(F.col("min_nbr"), F.col("lbl")))
            # lazy truncation: the convergence count right below scans
            # the full relation and materializes the checkpoint as a
            # side effect — no dedicated materialization job per round
            # (r08)
            new = _ckpt(labels.join(nbr_min,
                                    labels["node"] == nbr_min["a"],
                                    "left")
                        .select(F.col("node"), upd.alias("new_lbl"),
                                (upd < F.col("lbl")).alias("_changed")),
                        checkpoint_dir, eager=False)
            n_changed = new.filter(F.col("_changed")).count()
            labels = new.select("node", F.col("new_lbl").alias("lbl"))
            if n_changed == 0:
                return labels.select("node",
                                     F.col("lbl").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


def _large_star(e: DataFrame) -> DataFrame:
    """Kiveris et al. large-star: for each node u over its full
    (symmetrized) neighborhood, m = min(Γ(u) ∪ {u}); emit (v, m) for
    every strictly-larger neighbor v. Output edges satisfy a > b."""
    adj = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    m = adj.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m"))
    return (adj.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Kiveris et al. small-star over edges oriented a > b: group by
    the larger endpoint u, m = min(Γ(u)); emit (v, m) for every
    v ∈ Γ(u) ∪ {u} except m itself. Output edges satisfy a > b
    (every emitted v is ≥ m with v ≠ m)."""
    m = e.groupBy("a").agg(F.min("b").alias("m"))
    joined = e.join(m, "a")
    out = (joined.select(F.col("b").alias("v"), "m")
           .union(m.select(F.col("a").alias("v"), "m"))
           .filter(F.col("v") != F.col("m"))
           .select(F.col("v").alias("a"), F.col("m").alias("b"))
           .distinct())
    return out


def _connected_components_star(edges: DataFrame, src: str, dst: str,
                               max_iter: int,
                               checkpoint_dir: str | None) -> DataFrame:
    """Alternating large-star/small-star (SoCC'14): converges in
    O(log n) alternations on ANY graph — a path of 2^k nodes closes
    in ~k rounds where min-propagation needs 2^k. Convergence = the
    oriented edge set reaches a fixpoint (checked exactly: equal
    counts + empty set-difference, both cheap actions on the deduped
    edge set); at the fixpoint every edge is (node, component-min),
    i.e. a star forest rooted at component minima."""
    pairs = (edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
             .filter(F.col("x") != F.col("y")))
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct())
    e = _ckpt(pairs.select(F.greatest("x", "y").alias("a"),
                           F.least("x", "y").alias("b")).distinct(),
              checkpoint_dir)
    n_prev = e.count()
    # static planning for the alternation loop — same rationale as
    # the minprop loop above (one job per round instead of one per
    # exchange); the oriented edge set is a deterministic set, so
    # partitioning cannot change the fixpoint.
    from .iterstate import static_loop
    with static_loop(edges.sparkSession, e.rdd.getNumPartitions()):
        for _ in range(max_iter):
            e_new = _ckpt(_small_star(_large_star(e)), checkpoint_dir,
                          eager=False)
            n_new = e_new.count()
            if n_new == n_prev and e_new.subtract(e).count() == 0:
                e = e_new
                break
            e, n_prev = e_new, n_new
        else:
            raise RuntimeError(
                f"star connected_components did not converge in "
                f"{max_iter} rounds")
    parents = e.groupBy("a").agg(F.min("b").alias("parent"))
    return (nodes.join(parents, nodes["node"] == parents["a"], "left")
            .select("node",
                    F.coalesce("parent", "node").alias("component")))


def dedup_clusters(pairs: DataFrame, id_a: str = "doc_a",
                   id_b: str = "doc_b") -> DataFrame:
    """Candidate pairs → per-doc cluster verdict:
    (doc_id, component, is_canonical). The canonical doc of a cluster
    is its minimum id (same deterministic convention as
    ``exact_dedup``/``minhash_overcap_canonicals``); dropping every
    ``is_canonical = false`` row is full transitive near-dup removal."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("node").alias("doc_id"), "component",
        (F.col("node") == F.col("component")).alias("is_canonical"))
