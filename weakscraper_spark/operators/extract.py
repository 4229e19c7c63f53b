"""C6 ``extract`` — the core operator (SURVEY.md §3C):
``mapInPandas(extract_batch, schema)`` with the compiled template
spec(s) broadcast to executors.

Execution model (SURVEY §4.2 flagship trace):
- The ONLY JVM↔Python crossing in the pipeline: Arrow record batches
  in, Arrow record batches out. No per-row ``F.udf`` anywhere
  (BASELINE.json:15 mandate).
- Specs travel as JSON strings inside a ``sc.broadcast`` and are
  deserialized ONCE PER PYTHON WORKER via a module-level cache keyed
  by content hash. The cache amortizes when workers are reused
  (cluster mode, and the bench job, set
  ``spark.python.worker.reuse=true``); under session.py's local-mode
  default (reuse off) it still dedups within a worker's task.
- One bad document can never fail a batch: ``enginelib.match.extract``
  maps every CompareError/RecursionError to a status row (A13).
- C13 lineage: each output row carries its ``partition_id`` (from
  TaskContext), so per-partition lineage/metrics are a cheap JVM-side
  groupBy downstream — no second Python pass.

Output schema is FIXED (dynamic captures live in ``fields_json``,
SURVEY §2.1):
    url, template_id, status, error, text, fields_json, n_nodes,
    n_bytes, parse_ms, partition_id
"""

from __future__ import annotations

import json
from time import perf_counter
from typing import Callable, Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

from ..enginelib.boiler import main_text as _main_text
from ..enginelib.match import extract as _extract_doc
from ..enginelib.spec import Spec, spec_from_json

#: statuses that count as an extraction SUCCESS — the one place the
#: taxonomy's ok-side is defined (refresh loop, streaming monitor,
#: and any future consumer import this rather than restating the
#: literals; a new success status added here propagates everywhere)
OK_STATUSES = ("ok", "ok_heuristic")

EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, template_id string, status string, "
    "error string, text string, fields_json string, n_nodes int, "
    "n_bytes int, parse_ms double, partition_id int"
)

# spans=True appends the field→[[start,end),...] source-offset map
# (north rule: "extracted text/spans per url")
EXTRACT_SPANS_SCHEMA = EXTRACT_SCHEMA + ", spans_json string"

# Per-worker compiled-spec cache (worker reuse makes this amortize).
_SPEC_CACHE: dict[str, Spec] = {}


def _spec_for(spec_json: str) -> Spec:
    spec = _SPEC_CACHE.get(spec_json)
    if spec is None:
        spec = spec_from_json(spec_json)
        _SPEC_CACHE[spec_json] = spec
    return spec


def _heuristic_rescue(out: dict, j: int, html: str,
                      spans: bool = False) -> None:
    """Boilerplate-strip fallback for one failed row, in-place. Only
    upgrades the row when the heuristic finds content; the template
    error string is preserved for audit either way. With ``spans``,
    rescued rows carry the content block's covering source span under
    the reserved ``_main_text`` key (heuristics have no field names),
    so the north rule's text/spans leg covers BOTH extractors
    (VERDICT r04 #5)."""
    t0 = perf_counter()
    r = _main_text(html, mode="largest", spans=spans)
    out["parse_ms"][j] += (perf_counter() - t0) * 1e3
    if r["n_content_blocks"]:
        out["status"][j] = "ok_heuristic"
        out["text"][j] = r["text"]
        if spans:
            out["spans_json"][j] = json.dumps(
                {"_main_text": r["spans"]}, sort_keys=True)


def extract_pages(df: DataFrame,
                  spec_json_by_tid: dict[str, str],
                  functions: dict[str, Callable] | None = None,
                  text_key: str = "text",
                  fallback: str | None = None,
                  spans: bool = False) -> DataFrame:
    """Apply broadcast compiled templates to ``(url, warc_ts,
    template_id, html)`` rows. Extra columns are dropped (column
    pruning: don't ship what the Python worker won't read);
    ``warc_ts`` is echoed through so the snapshot dedup can run on the
    NARROW output rows after extraction (shuffle-minimal pipeline,
    plans/pipeline.py).

    ``fallback='heuristic'`` runs the boilerplate-strip extractor
    (enginelib/boiler.py) on rows the template path could NOT extract
    (no registered template, structural mismatch, malformed page) —
    INSIDE the same Python stage, while the html bytes are already in
    worker memory. Recovering failed rows via a second pass
    (join-back on url to refetch html) would re-shuffle the corpus
    width; in-stage fallback costs one extra local parse for the
    ~5-10% failing rows and nothing else. Recovered rows get status
    ``'ok_heuristic'`` with the template error preserved in ``error``
    for audit; unrecovered rows keep their template status.

    ``spans=True`` adds a ``spans_json`` column: per captured field,
    the [start, end) character offsets of the captured element(s) in
    the SOURCE html (enginelib.match.extract(spans=True)) — the
    labeling/audit artifact the north rule's "text/spans per url"
    names. Off by default: the span parse annotates every tag node,
    and the plain contract columns must not change shape."""
    if fallback not in (None, "heuristic"):
        raise ValueError(f"unknown fallback {fallback!r}")
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(spec_json_by_tid)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        specs = bc.value
        for pdf in batches:
            n = len(pdf)
            out = {
                "url": pdf["url"].tolist(),
                "warc_ts": pdf["warc_ts"].tolist(),
                "template_id": pdf["template_id"].tolist(),
                "status": [""] * n, "error": [""] * n,
                "text": [None] * n, "fields_json": [None] * n,
                "n_nodes": [0] * n, "n_bytes": [0] * n,
                "parse_ms": [0.0] * n,
                "partition_id": [pid] * n,
            }
            if spans:
                out["spans_json"] = [None] * n
            htmls = pdf["html"].tolist()
            for j in range(n):
                raw = htmls[j]
                if raw is None:
                    # a NULL html cell must become a status row, not a
                    # TypeError that fails the whole Arrow batch (the
                    # pipeline filters NULLs upstream; the OPERATOR
                    # contract is one-bad-doc-never-fails-a-batch)
                    out["status"][j] = "error:NullInput"
                    out["error"][j] = "html is NULL"
                    continue
                if isinstance(raw, str):
                    # lineage bytes_in must be BYTES even for string
                    # inputs (len(str) undercounts multi-byte UTF-8)
                    html = raw
                    out["n_bytes"][j] = len(raw.encode("utf-8"))
                else:
                    html = bytes(raw).decode("utf-8", errors="replace")
                    out["n_bytes"][j] = len(raw)
                tid = out["template_id"][j]
                spec_json = specs.get(tid) if tid is not None else None
                if spec_json is None:
                    out["status"][j] = "error:NoTemplate"
                    out["error"][j] = f"no compiled template for {tid!r}"
                    if fallback == "heuristic":
                        _heuristic_rescue(out, j, html, spans)
                    continue
                t0 = perf_counter()
                row = _extract_doc(_spec_for(spec_json), html,
                                   functions, text_key, spans=spans)
                out["parse_ms"][j] = (perf_counter() - t0) * 1e3
                if spans and row.get("spans") is not None:
                    out["spans_json"][j] = json.dumps(
                        row["spans"], sort_keys=True)
                out["status"][j] = row["status"]
                out["error"][j] = row["error"]
                out["text"][j] = row["text"]
                out["n_nodes"][j] = row["n_nodes"]
                if row["fields"] is not None:
                    out["fields_json"][j] = json.dumps(
                        row["fields"], sort_keys=True, ensure_ascii=False,
                        default=str)
                if fallback == "heuristic" and row["status"] != "ok":
                    _heuristic_rescue(out, j, html, spans)
            yield pd.DataFrame(out)

    return df.select("url", "warc_ts", "template_id", "html").mapInPandas(
        run, EXTRACT_SPANS_SCHEMA if spans else EXTRACT_SCHEMA)
