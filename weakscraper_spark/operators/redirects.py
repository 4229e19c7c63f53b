"""Redirect-chain resolution over crawl index rows — the
canonicalization signal a fetch tier extracts from its 3xx responses
(public conventions: RFC 9110 §15.4 Location semantics; browsers and
crawlers cap chains at ~20 hops and give up).

Pipeline role: a Common-Crawl-scale corpus is full of moved URLs;
the redirect map (src → final landing url) feeds canonical grouping
(``canonical_dedup``), frontier dedup (don't fetch both ends), and
link-graph rewriting (credit the landing page). Everything here runs
over ~100-byte index rows (``sources.warc.warc_record_index`` now
carries ``location`` for 3xx responses) — payloads are never read.

Scale shape: the redirect graph is FUNCTIONAL (one Location per
source url after latest-capture dedup), so chains resolve by POINTER
DOUBLING — O(log max_hops) self-joins on the url key, not
O(chain-length) rounds and never a per-row loop. At 10^12 index rows
the 3xx subset is typically ~1-3%, each round is one equi-join +
narrow map, and the relation stays ~(src, current, hops)-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def redirect_edges(index: DataFrame, url_col: str = "url",
                   loc_col: str = "location",
                   status_col: str = "http_status") -> DataFrame:
    """3xx index rows → functional edge list (src_url, dst_url):
    Location resolved against the source url (relative Location is
    legal per RFC 9110), self-redirects dropped (a → a resolves to
    nothing and would cycle every chain through it), and one edge
    per source kept deterministically (min dst — callers that want
    latest-capture semantics dedup upstream with
    ``cdx_digest_dedup``/``dedup_latest`` first)."""
    from .links import resolve_href

    e = (index
         .filter(F.col(status_col).between(300, 399) &
                 F.col(loc_col).isNotNull() &
                 (F.trim(F.col(loc_col)) != ""))
         .select(F.col(url_col).alias("src_url"),
                 resolve_href(F.col(url_col),
                              F.trim(F.col(loc_col))).alias("dst_url")))
    return (e.filter(F.col("src_url") != F.col("dst_url"))
            .groupBy("src_url")
            .agg(F.min("dst_url").alias("dst_url")))


def resolve_redirects(edges: DataFrame, src: str = "src_url",
                      dst: str = "dst_url",
                      max_hops: int = 16) -> DataFrame:
    """One row per redirect SOURCE:

    (src_url, final_url, n_hops, status ∈ {ok, unresolved})

    ``ok``: the chain lands on a non-redirecting url within
    ``max_hops`` — ``final_url``/``n_hops`` are exact. ``unresolved``:
    the walk is still on a redirecting url after ``max_hops`` (a
    cycle, or a longer-than-budget chain — the same give-up rule
    browsers apply); final_url/n_hops are NULL so downstream joins
    cannot silently canonicalize onto a mid-cycle url.

    Pointer doubling: after round k every source knows the node
    min(chain_len, 2^k) steps ahead and the exact distance walked;
    ceil(log2(max_hops)) + 1 rounds cover the budget. The input must
    be FUNCTIONAL (one dst per src — ``redirect_edges`` guarantees
    it); hop counts saturate at max_hops + 1 so cycles cannot grow
    the accumulator unboundedly."""
    cap = max_hops + 1
    cur = edges.select(F.col(src).alias("u"),
                       F.col(dst).alias("v"),
                       F.lit(1).alias("hops"))
    rounds = max(1, (max_hops - 1).bit_length())
    # truncate lineage per round: each doubling joins cur AGAINST
    # ITSELF, so without a barrier the un-truncated plan re-derives
    # the edge subtree 2^rounds times (r07 plan audit: 199 nodes /
    # 17 Exchanges at rounds=4) — the same per-round eager
    # localCheckpoint discipline as the connected-components loop
    cur = cur.localCheckpoint(eager=True)
    for _ in range(rounds):
        nxt = cur.select(F.col("u").alias("_ju"),
                         F.col("v").alias("_jv"),
                         F.col("hops").alias("_jh"))
        cur = (cur.join(nxt, cur["v"] == nxt["_ju"], "left")
               .select("u",
                       F.coalesce("_jv", "v").alias("v"),
                       F.least(F.col("hops") +
                               F.coalesce("_jh", F.lit(0)),
                               F.lit(cap)).alias("hops"))
               .localCheckpoint(eager=True))
    # a landing url that is itself a redirect source means the walk
    # has not terminated (mid-chain budget exhaustion or a cycle);
    # derive sources from the CHECKPOINTED round-0 relation, not the
    # original edges subtree (one less re-derivation of the 3xx scan)
    # (cur carries exactly one row per source, so no distinct needed)
    srcs = cur.select(F.col("u").alias("v"),
                      F.lit(True).alias("_is_src"))
    out = cur.join(srcs, "v", "left")
    resolved = F.col("_is_src").isNull() & (F.col("hops") <= max_hops)
    return out.select(
        F.col("u").alias("src_url"),
        F.when(resolved, F.col("v")).alias("final_url"),
        F.when(resolved, F.col("hops")).cast("long").alias("n_hops"),
        F.when(resolved, F.lit("ok")).otherwise("unresolved")
         .alias("status"))
