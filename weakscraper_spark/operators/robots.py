"""robots.txt policy filtering for the crawl frontier — the step
between URL canonicalization/dedup (urlnorm.py) and fetch scheduling
(crawl_schedule): drop urls the host's robots policy disallows.

Semantics come from the stdlib ``urllib.robotparser`` (the canonical
implementation of the Robots Exclusion Protocol, RFC 9309 family) —
NOT re-implemented; this module only distributes it:

- the robots dim table is (host, robots_txt) — one row per host,
  tiny relative to the frontier → broadcast join, map-side;
- parsing happens in Arrow batches with a per-worker parser cache
  keyed by the robots text (hosts repeat heavily within a batch at
  CC ratios, and worker reuse amortizes across tasks);
- a host with no robots row, an empty file, or an unparseable file
  is ALLOWED (the crawl convention: no policy → fetch).
"""

from __future__ import annotations

from typing import Iterator
from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import DataFrame, functions as F

ROBOTS_SCHEMA = "url string, host string, allowed boolean"

_PARSER_CACHE: dict[str, RobotFileParser] = {}


def _parser(txt: str) -> RobotFileParser:
    p = _PARSER_CACHE.get(txt)
    if p is None:
        p = RobotFileParser()
        p.parse(txt.splitlines())
        _PARSER_CACHE[txt] = p
    return p


def allowed_by(txt: str | None, url: str, agent: str = "*") -> bool:
    """Pure per-row decision (tested directly): None/empty/broken
    robots → allowed."""
    if not txt:
        return True
    try:
        return _parser(txt).can_fetch(agent, url)
    except Exception:
        return True


def robots_filter(df: DataFrame, robots: DataFrame,
                  url_col: str = "url", agent: str = "*") -> DataFrame:
    """urls × (host, robots_txt) → (url, host, allowed). Callers
    ``filter("allowed")`` for the fetchable frontier; the full flag
    set keeps the drop auditable (same discipline as clean_corpus)."""
    rows = (df.select(F.col(url_col).alias("url"))
            .withColumn("host",  # try_: bad url → NULL host → left
                        F.try_parse_url("url", F.lit("HOST")))  # join keeps it, robots_txt NULL → allowed
            .join(F.broadcast(robots.select("host", "robots_txt")),
                  "host", "left"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            txts = pdf["robots_txt"].tolist()
            urls = pdf["url"].tolist()
            yield pd.DataFrame({
                "url": urls,
                "host": pdf["host"].tolist(),
                "allowed": [allowed_by(t if isinstance(t, str) else None,
                                       u, agent)
                            for t, u in zip(txts, urls)],
            })

    return rows.mapInPandas(run, ROBOTS_SCHEMA)
