"""HTML → Markdown conversion operator: structure-preserving text
extraction (enginelib/markdown.py) as the same Arrow-batched
``mapInPandas`` stage shape as the template extractor
(operators/extract.py) and the boilerplate stripper
(operators/heuristic.py).

Training-pipeline role: where ``heuristic_extract`` flattens a page
to its main prose, this stage keeps document STRUCTURE — headings,
lists, tables, code fences, links — as lightweight markdown, the
form webtext corpus pipelines feed to pretraining when layout carries
signal. Compose with the boilerplate stripper upstream (strip chrome
first, convert the content subtree) or run standalone on
content-dominated corpora.

Scale shape: narrow map only — no shuffle, no broadcast, one
JVM↔Python crossing; per-row cost is one streaming HTML parse plus
one tree render. Lineage mirrors extract.py: n_bytes (true bytes
even for str input), parse_ms, partition_id. Errors (pathological
nesting depth → RecursionError) become status rows, never task
failures — the A13 error-taxonomy discipline.
"""

from __future__ import annotations

from time import perf_counter
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

from ..enginelib.markdown import to_markdown_blocks

MARKDOWN_SCHEMA = (
    "url string, warc_ts timestamp, status string, markdown string, "
    "n_blocks int, n_chars int, n_bytes int, parse_ms double, "
    "partition_id int"
)


def html_to_markdown(df: DataFrame,
                     html_col: str = "html") -> DataFrame:
    """(url, warc_ts, html) → markdown rows. ``status`` is 'ok' when
    the document yields at least one block, 'empty' when it renders to
    nothing, 'error:NullInput' / 'error:RecursionError' otherwise
    (never a batch failure). ``n_blocks`` counts top-level markdown
    blocks (blank-line-separated)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            n = len(pdf)
            out = {
                "url": pdf["url"].tolist(),
                "warc_ts": pdf["warc_ts"].tolist(),
                "status": [""] * n, "markdown": [None] * n,
                "n_blocks": [0] * n, "n_chars": [0] * n,
                "n_bytes": [0] * n, "parse_ms": [0.0] * n,
                "partition_id": [pid] * n,
            }
            htmls = pdf[html_col].tolist()
            for j in range(n):
                raw = htmls[j]
                if raw is None:
                    out["status"][j] = "error:NullInput"
                    out["markdown"][j] = ""
                    continue
                if isinstance(raw, str):
                    html = raw
                    out["n_bytes"][j] = len(raw.encode("utf-8"))
                else:
                    html = bytes(raw).decode("utf-8", errors="replace")
                    out["n_bytes"][j] = len(raw)
                t0 = perf_counter()
                try:
                    blocks = to_markdown_blocks(html)
                    md = "\n\n".join(blocks)
                except RecursionError:
                    out["parse_ms"][j] = (perf_counter() - t0) * 1e3
                    out["status"][j] = "error:RecursionError"
                    out["markdown"][j] = ""
                    continue
                out["parse_ms"][j] = (perf_counter() - t0) * 1e3
                out["status"][j] = "ok" if md else "empty"
                out["markdown"][j] = md
                # len(blocks), not a \n\n count: a fenced code
                # block may itself contain blank lines (r05 review)
                out["n_blocks"][j] = len(blocks) if md else 0
                out["n_chars"][j] = len(md)
            yield pd.DataFrame(out)

    return df.select("url", "warc_ts", html_col).mapInPandas(
        run, MARKDOWN_SCHEMA)
