"""Distributed template induction — the north-star's "template-
induction STAGE" as a Spark operator, not just a driver-side helper
(enginelib/induce.py is the per-host kernel).

Shape at 100 TB: induction needs only k sample pages per host, so the
stage is (a) a window top-k per host — one shuffle over only the rows
that survive the sample limit via WindowGroupLimit map-side pruning —
then (b) one ``applyInPandas`` call per host group emitting a single
template-registry row. The registry output is O(#hosts), i.e. tiny,
and feeds straight into ``attach_template`` (C5 broadcast join).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

INDUCED_SCHEMA = ("host_pattern string, template_id string, "
                  "template_json string, n_samples int, status string")


def induce_templates(pages: DataFrame, k: int = 4,
                     host_col: str = "host") -> DataFrame:
    """Learn one template per host from k deterministic sample pages.

    Returns template-registry rows ``(host_pattern, template_id,
    template_json, n_samples, status)``; hosts whose samples cannot be
    tree-aligned (or with < 2 samples) carry an ``error:*`` status row
    instead of failing the job — the extract stage then reports their
    pages as ``error:NoTemplate`` (audit-friendly, A13 style)."""
    from ..enginelib.induce import induce_template_robust
    from ..enginelib.spec import spec_to_json

    w = Window.partitionBy(host_col).orderBy(F.xxhash64("url"), "url")
    samples = (pages
               .withColumn("_rk", F.row_number().over(w))
               .filter(F.col("_rk") <= k)
               .select(F.col(host_col).alias("host_pattern"), "html"))

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        host = key[0]
        htmls = [raw if isinstance(raw, str)
                 else bytes(raw).decode("utf-8", errors="replace")
                 for raw in pdf["html"]]
        try:
            spec = induce_template_robust(htmls)
            row = (host, f"t_{host}", spec_to_json(spec),
                   len(htmls), "ok")
        except Exception as e:  # alignment failure → status row
            row = (host, None, None, len(htmls),
                   f"error:{type(e).__name__}")
        return pd.DataFrame(
            [row], columns=["host_pattern", "template_id",
                            "template_json", "n_samples", "status"])

    return samples.groupBy("host_pattern").applyInPandas(
        run, INDUCED_SCHEMA)
