"""PDF / layout parsing plumbing — the north rule's "PDF/layout
parse" leg, following the same honest-stub convention as
multimodal.py: the sandbox ships no PDF library, so the REAL decode
kernel is gated behind an import-try and deliberately raises when a
true ``%PDF-`` blob arrives without a parser; the Spark-side plumbing
(binary column in, per-PAGE rows out — a flat map — schema, Arrow
batching, lineage, never-raise status taxonomy) is real and tested
via a deterministic fake-PDF container.

Fake container (test stand-in): ``%FPDF`` magic + UTF-8 JSON
``{"pages": [...]}``. ``render_fake_pdf``/``parse_any_pdf`` round-trip
it exactly; a production deployment replaces ``_parse_real_pdf`` with
pypdf/pdfium and nothing else changes.

Layout rows: per page, each text line becomes a deterministic layout
box (line index → y offset, char count → width) serialized as JSON —
the shape a real layout model (e.g. a pdfminer LTTextBox walk) emits,
so downstream schema/consumers are exercised for real.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

FAKE_MAGIC = b"%FPDF"

PDF_PAGES_SCHEMA = (
    "doc_id long, page_no int, status string, text string, "
    "n_lines int, layout_json string, n_bytes int, partition_id int"
)

try:  # pragma: no cover - not present in this environment
    import pypdf  # noqa: F401
    _HAVE_PDF_LIB = True
except Exception:
    _HAVE_PDF_LIB = False


def render_fake_pdf(pages: list[str]) -> bytes:
    """Deterministic stand-in PDF: magic + JSON page list."""
    return FAKE_MAGIC + json.dumps({"pages": pages},
                                   ensure_ascii=False).encode("utf-8")


def _parse_real_pdf(raw: bytes) -> list[str]:
    """REAL parse would go here (pypdf / pdfium page-text walk).
    Deliberately stubbed: no PDF library in this environment."""
    raise NotImplementedError(
        "real PDF parse requires a PDF library not present in this "
        "environment; use render_fake_pdf blobs for plumbing tests")


def parse_any_pdf(raw: bytes) -> tuple[str, list[str]]:
    """(status, pages). Total function — never raises on input bytes:
    unknown containers and lib-less real PDFs come back as status
    rows, the same taxonomy discipline as the HTML extractor (A13)."""
    if raw.startswith(FAKE_MAGIC):
        try:
            return "ok", json.loads(raw[len(FAKE_MAGIC):].decode(
                "utf-8"))["pages"]
        except Exception as exc:  # malformed fake container
            return f"error:BadContainer:{type(exc).__name__}", []
    if raw.startswith(b"%PDF-"):
        if not _HAVE_PDF_LIB:
            return "error:NoPdfLib", []
        return "ok", _parse_real_pdf(raw)
    return "error:NotPdf", []


def _layout_boxes(page_text: str) -> list[dict]:
    """Deterministic per-line layout boxes (the real-layout-model
    output shape): line i sits at y = 720 - 12*i, width tracks char
    count at 6 units/char, x fixed at 72 (1-inch margin)."""
    return [
        {"line": i, "x": 72, "y": 720 - 12 * i,
         "w": 6 * len(line), "h": 12}
        for i, line in enumerate(page_text.split("\n"))
    ]


def pdf_extract(df: DataFrame, id_col: str = "doc_id",
                blob_col: str = "blob") -> DataFrame:
    """(id, pdf-bytes) → one row PER PAGE with text + layout boxes —
    a flat map (mapInPandas can change cardinality; same plumbing a
    frame sampler uses). Failed blobs emit exactly one page_no=-1
    status row, never silently vanish. Narrow map: no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf_batch in batches:
            out = {k: [] for k in ("doc_id", "page_no", "status",
                                   "text", "n_lines", "layout_json",
                                   "n_bytes", "partition_id")}

            def emit(did, pno, status, text, raw):
                lines = text.split("\n") if text else []
                out["doc_id"].append(did)
                out["page_no"].append(pno)
                out["status"].append(status)
                out["text"].append(text)
                out["n_lines"].append(len(lines))
                out["layout_json"].append(
                    json.dumps(_layout_boxes(text)) if text else None)
                out["n_bytes"].append(len(raw))
                out["partition_id"].append(pid)

            ids = pdf_batch[id_col].tolist()
            blobs = pdf_batch[blob_col].tolist()
            for did, raw in zip(ids, blobs):
                raw = bytes(raw) if raw is not None else b""
                status, pages = parse_any_pdf(raw)
                if status != "ok":
                    emit(did, -1, status, None, raw)
                    continue
                if not pages:  # zero-page doc: visible, not vanished
                    emit(did, -1, "empty", None, raw)
                    continue
                for pno, text in enumerate(pages):
                    emit(did, pno, "ok", text, raw)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(run, PDF_PAGES_SCHEMA)
