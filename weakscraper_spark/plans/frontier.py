"""Crawl-frontier pipeline: the crawl-side composition feeding the
extraction pipeline, built from the urlnorm/robots operators —

    raw url list → canonicalize + url-level dedup → robots policy
    filter → politeness wave/slot schedule.

Mirrors corpus_pipeline.py on the fetch side: every stage's drop is
auditable (url_dedup keeps variant counts, robots_filter keeps the
allowed flag), and the output is exactly what a fetch fleet consumes:
one row per fetchable canonical url with its (host, wave, slot)
assignment.

Scale shape: canonicalization is a narrow map; dedup is one hash agg
on the canonical key; robots is a broadcast join + Arrow batch;
scheduling is a hash assignment with a broadcast per-host count — no
corpus-hot windows anywhere (the head host of a CC crawl flows
through ordinary hash partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.robots import robots_filter
from ..operators.urlnorm import crawl_schedule, url_dedup


def build_frontier_plan(urls: DataFrame, robots: DataFrame,
                        per_host: int = 2,
                        url_col: str = "url",
                        agent: str = "*") -> DataFrame:
    """Returns the fetchable frontier lazily: (url, host, wave, slot,
    n_variants) — ``url`` is the canonical form, ``n_variants`` how
    many raw variants collapsed into it (lineage for the dedup)."""
    canon = url_dedup(urls, url_col).select(
        F.col("url_canon").alias("url"), "n_variants")
    allowed = (robots_filter(canon, robots, agent=agent)
               .filter(F.col("allowed")).select("url"))
    sched = crawl_schedule(allowed, per_host=per_host)
    return sched.join(canon, "url").select(
        "url", "host", "wave", "slot", "n_variants")
