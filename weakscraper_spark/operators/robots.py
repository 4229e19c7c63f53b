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


def delay_of(txt: str | None, agent: str = "*") -> float | None:
    """Crawl-delay for ``agent`` (RFC 9309 extension the fetch fleet
    must honor per host): None when absent/unparseable — the
    scheduler then uses its politeness default."""
    if not txt:
        return None
    try:
        d = _parser(txt).crawl_delay(agent)
        return None if d is None else float(d)
    except Exception:
        return None


def robots_filter(df: DataFrame, robots: DataFrame,
                  url_col: str = "url", agent: str = "*") -> DataFrame:
    """urls × (host, robots_txt) → input columns + (host, allowed,
    crawl_delay). Callers ``filter("allowed")`` for the fetchable
    frontier; the full flag set keeps the drop auditable (same
    discipline as clean_corpus). Input columns PASS THROUGH so
    upstream lineage (e.g. url_dedup's n_variants) rides the rows —
    no corpus-width re-join downstream. ``try_parse_url``: a bad url
    gets a NULL host, the left join keeps it, NULL policy → allowed."""
    # this operator's own output names ("allowed"/"crawl_delay") and
    # the join-side "robots_txt" are dropped from the input first:
    # re-applying the filter to its own output (e.g. a second agent
    # pass) would otherwise produce duplicate column names and an
    # AnalysisException from the stacked mapInPandas schema (ADVICE
    # r04) — the old flags are stale by definition, recompute wins
    df = df.drop("allowed", "crawl_delay", "robots_txt")
    in_cols = [c for c in df.columns if c != "host"]
    # reuse a host column the caller already derived (passthrough
    # chains — r04 review: recomputing produced a duplicate column
    # that broke the Arrow schema); either way coalesce NULL host to
    # the "" sentinel so unparseable urls survive downstream
    # equi-joins on host ("" matches no robots row → NULL policy →
    # allowed, same verdict as before)
    host = (F.col("host") if "host" in df.columns
            else F.try_parse_url(url_col, F.lit("HOST")))
    rows = (df.withColumn("host", F.coalesce(host, F.lit("")))
            .join(F.broadcast(robots.select("host", "robots_txt")),
                  "host", "left"))
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
        if f.name != "host"
    ) + ", host string, allowed boolean, crawl_delay double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols + ["host"]].copy()
            urls = pdf[url_col].tolist()
            norm = [t if isinstance(t, str) else None
                    for t in pdf["robots_txt"]]
            out["allowed"] = [allowed_by(t, u, agent)
                              for t, u in zip(norm, urls)]
            out["crawl_delay"] = [delay_of(t, agent) for t in norm]
            yield out

    return rows.mapInPandas(run, schema)
