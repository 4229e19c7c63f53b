"""Head-metadata extraction: per page, the document fields every
web-corpus pipeline wants NEXT TO the main text — <title>, meta
description, canonical link, Open Graph title, <html lang>, first
<h1>. Complements the body-side extractors (template `extract_pages`,
heuristic `boiler_extract`): those recover CONTENT, this recovers
the page's self-description, which feeds dedup keys (canonical url),
language routing (lang attr before the n-gram guesser), and training
metadata columns.

Built on the SAME tolerant DOM parser as the extraction engine
(enginelib.dom.parse_html — total on garbage), walked once per page:
a single pre-order pass with an early stop after </head>-level
elements are all seen (title/meta/link live in head; h1 is the one
body field, so the walk runs until the first h1 or the end).

Spark shape: Arrow-batched narrow map, no shuffle, html column in /
fixed metadata columns out. Total: parse failures and missing
fields are NULLs plus a status, never exceptions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..enginelib.dom import is_tag, is_text, parse_html

META_SCHEMA = (
    "url string, title string, meta_description string, "
    "canonical string, og_title string, lang_attr string, "
    "h1 string, status string"
)


def _collect_text(node) -> str:
    """Concatenated descendant text of a tag node, whitespace-
    normalized (title/h1 can contain inline markup)."""
    parts: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if is_text(n):
            parts.append(n["content"])
        else:
            stack.extend(reversed(n.get("children", [])))
    return " ".join(" ".join(parts).split())


def page_metadata_fields(html: str) -> dict:
    """Pure per-page kernel (tested directly): the seven fields, all
    None-able. First occurrence wins for each field — browsers and
    crawl pipelines both take the first title/canonical."""
    from collections import deque
    fields = {k: None for k in ("title", "meta_description",
                                "canonical", "og_title", "lang_attr",
                                "h1")}
    root = parse_html(html)
    stack = deque([root])
    while stack:
        if all(v is not None for v in fields.values()):
            break  # every field found — skip the rest of the body
        n = stack.popleft()
        if not is_tag(n):
            continue
        name = n["name"]
        attrs = n.get("attrs", {})
        if name == "html" and fields["lang_attr"] is None:
            fields["lang_attr"] = attrs.get("lang")
        elif name == "title" and fields["title"] is None:
            fields["title"] = _collect_text(n) or None
        elif name == "meta":
            mname = (attrs.get("name") or "").lower()
            prop = (attrs.get("property") or "").lower()
            if mname == "description" and \
                    fields["meta_description"] is None:
                fields["meta_description"] = attrs.get("content")
            elif prop == "og:title" and fields["og_title"] is None:
                fields["og_title"] = attrs.get("content")
        elif name == "link":
            if (attrs.get("rel") or "").lower() == "canonical" and \
                    fields["canonical"] is None:
                fields["canonical"] = attrs.get("href")
        elif name == "h1" and fields["h1"] is None:
            fields["h1"] = _collect_text(n) or None
        stack.extendleft(reversed(n.get("children", [])))
    return fields


def page_metadata(df: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(url, html-bytes) → one metadata row per page. NULL/empty html
    → status row with NULL fields (never dropped, never raises)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("url", "title", "meta_description",
                                   "canonical", "og_title",
                                   "lang_attr", "h1", "status")}
            for url, raw in zip(pdf[url_col], pdf[html_col]):
                out["url"].append(url)
                if raw is None or len(raw) == 0:
                    for k in ("title", "meta_description", "canonical",
                              "og_title", "lang_attr", "h1"):
                        out[k].append(None)
                    out["status"].append("error:NullHtml")
                    continue
                try:
                    html = bytes(raw).decode("utf-8", "replace")
                    fields = page_metadata_fields(html)
                    for k, v in fields.items():
                        out[k].append(v)
                    out["status"].append("ok")
                except Exception as exc:  # defensive: parser is total
                    for k in ("title", "meta_description", "canonical",
                              "og_title", "lang_attr", "h1"):
                        out[k].append(None)
                    out["status"].append(
                        f"error:{type(exc).__name__}")
            yield pd.DataFrame(out)

    return df.select(url_col, html_col).mapInPandas(run, META_SCHEMA)
