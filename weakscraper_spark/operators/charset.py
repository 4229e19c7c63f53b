"""Charset sniff + decode: raw crawl ``html`` BYTES → text. The
pages tables synthesized here are clean UTF-8, but real Common-Crawl
bodies declare (or lie about) dozens of encodings — an extraction
pipeline that implicitly utf-8-decodes silently mangles a double-
digit percentage of the web. This stage makes decoding explicit,
auditable, and total (status column, never a raise), mirroring the
WHATWG encoding-sniff order browsers use:

1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — authoritative, overrides all;
2. transport charset (e.g. from the WARC/HTTP Content-Type param),
   when the caller passes a ``charset_col``;
3. ``<meta charset=…>`` / ``<meta http-equiv="Content-Type"
   content="…charset=…">`` scanned in the first 1024 bytes (the
   spec's prescan window);
4. attempt UTF-8 strict (dominant + self-validating);
5. fall back to windows-1252 (the WHATWG meaning of declared-or-
   implied "latin-1"/"ascii" — byte-total, never fails).

Per the WHATWG alias rule, declared labels ``iso-8859-1``/
``us-ascii`` are decoded as windows-1252. Unknown labels fall
through to steps 4/5 with status recording the unknown label.

Spark shape: Arrow-batched narrow map (mapInPandas), no shuffle; the
decode itself is pure-Python per row but bounded by byte length —
the same cost class as the HTML parse that follows it.
"""

from __future__ import annotations

import codecs
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_META_RE = re.compile(
    rb"""<meta\s[^>]*?charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)""",
    re.I)

# WHATWG: these labels all mean windows-1252 in browsers
_W1252_ALIASES = {"iso-8859-1", "latin-1", "latin1", "us-ascii",
                  "ascii", "windows-1252", "cp1252"}


def _norm_label(label: str) -> str | None:
    """Declared label → python codec name, WHATWG-aliased; None when
    the label is unknown."""
    label = label.strip().lower()
    if label in _W1252_ALIASES:
        return "cp1252"
    try:
        return codecs.lookup(label).name
    except (LookupError, ValueError):
        # ValueError: labels with embedded NULs (found by the
        # property fuzz) — codecs.lookup raises it, not LookupError
        return None


def sniff_decode(raw: bytes,
                 transport_charset: str | None = None
                 ) -> tuple[str, str, str]:
    """(text, encoding_used, status). Total function."""
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw[3:].decode("utf-8", "replace"), "utf-8", "ok:bom"
    if raw.startswith(b"\xff\xfe"):
        return raw[2:].decode("utf-16-le", "replace"), "utf-16-le", \
            "ok:bom"
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", "replace"), "utf-16-be", \
            "ok:bom"

    declared: str | None = None
    source = None
    if transport_charset:
        declared = _norm_label(transport_charset)
        source = "transport"
    if declared is None:
        m = _META_RE.search(raw[:1024])
        if m:
            declared = _norm_label(m.group(1).decode("latin-1"))
            source = "meta"
    if declared is not None:
        try:
            return raw.decode(declared), declared, f"ok:{source}"
        except (UnicodeDecodeError, LookupError):
            # declared but lying — fall through to sniff
            pass
    try:
        return raw.decode("utf-8"), "utf-8", \
            ("ok:utf8" if declared is None else "ok:utf8_over_declared")
    except UnicodeDecodeError:
        return raw.decode("cp1252", "replace"), "cp1252", "ok:fallback"


def decode_html(df: DataFrame, html_col: str = "html",
                charset_col: str | None = None,
                out_col: str = "text_decoded") -> DataFrame:
    """Append (out_col, encoding, status) decoded from ``html_col``
    bytes; ``charset_col`` optionally carries the transport charset
    (e.g. parsed from the WARC record's Content-Type). NULL html →
    status row, never a crash (same rule as the extractors).

    Colliding input columns are a hard error, not a silent drop:
    unlike robots_filter's own-output names, "status"/"encoding" are
    generic and often carry meaningful upstream state (an ingest
    status row) — clobbering them would erase caller lineage, and
    keeping both yields an AnalysisException deep in the stacked
    mapInPandas plan (ADVICE r04). Rename upstream and re-call."""
    clash = {out_col, "encoding", "status"} & set(df.columns)
    if clash:
        raise ValueError(
            f"decode_html output columns {sorted(clash)} already exist "
            "on the input — rename them (or pass a different out_col) "
            "before decoding")
    cols = list(df.columns)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + f", {out_col} string, encoding string, status string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, encs, stats = [], [], []
            charsets = (pdf[charset_col] if charset_col is not None
                        else [None] * len(pdf))
            for raw, cs in zip(pdf[html_col], charsets):
                if raw is None:
                    texts.append(None)
                    encs.append(None)
                    stats.append("error:NullHtml")
                    continue
                cs = cs if isinstance(cs, str) and cs else None
                t, e, s = sniff_decode(bytes(raw), cs)
                texts.append(t)
                encs.append(e)
                stats.append(s)
            out = pdf[cols].copy()
            out[out_col] = texts
            out["encoding"] = encs
            out["status"] = stats
            yield out

    return df.mapInPandas(run, schema)


def charset_param(mime: str | None) -> str | None:
    """Pull the charset parameter out of a Content-Type value
    (driver/Python-side helper for WARC mime strings)."""
    if not mime:
        return None
    m = re.search(r"charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", mime,
                  re.I)
    return m.group(1) if m else None
