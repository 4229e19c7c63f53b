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
through ordinary hash partitioning), and lineage columns
(n_variants, crawl_delay) RIDE the rows through the passthrough
operators instead of a corpus-width re-join at the end (r04: the
old plan re-joined the schedule against the full canonical set just
to recover n_variants — one whole url-keyed shuffle for a column
the rows already had upstream).
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
    n_variants, crawl_delay) — ``url`` is the canonical form,
    ``n_variants`` how many raw variants collapsed into it (lineage
    for the dedup), ``crawl_delay`` the host policy's fetch spacing
    (NULL → scheduler default)."""
    canon = url_dedup(urls, url_col).select(
        F.col("url_canon").alias("url"), "n_variants")
    allowed = (robots_filter(canon, robots, agent=agent)
               .filter(F.col("allowed")))
    sched = crawl_schedule(allowed, per_host=per_host)
    return sched.select("url", "host", "wave", "slot", "n_variants",
                        "crawl_delay")
