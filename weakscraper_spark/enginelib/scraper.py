"""Reference-shaped facade (SURVEY.md §3A A14; reference:
weakscraper/weakscraper.py ≈10-45).

The reference's entire public API is::

    scraper = WeakScraper(template_string, functions=None)
    results = scraper.scrap(html_string)

:class:`TemplateScraper` reproduces that surface so the parity test
ring (tests/test_parity.py) reads like the reference's own pytest
corpus. The Spark pipeline does NOT use this class per-row — it
broadcasts the compiled JSON spec and calls ``match.extract`` inside
Arrow batches (operators/extract.py).
"""

from __future__ import annotations

from typing import Any

from .match import Functions, extract, match_document
from .spec import Spec, compile_template, spec_to_json


class TemplateScraper:
    """Compile once, scrape many (the reference's WeakScraper shape)."""

    def __init__(self, template_html: str,
                 functions: Functions | None = None) -> None:
        self.spec: Spec = compile_template(template_html)
        self.functions: Functions = functions or {}

    def scrap(self, html: str) -> dict[str, Any]:
        """Match a page; returns the captured dict, raises CompareError
        on mismatch (exactly the reference's contract)."""
        return match_document(self.spec, html, self.functions)

    def extract(self, html: str, spans: bool = False) -> dict[str, Any]:
        """Non-raising status-row variant (engine contract).
        ``spans=True`` adds per-field source-offset element spans
        (match.extract)."""
        return extract(self.spec, html, self.functions, spans=spans)

    def spec_json(self) -> str:
        """Broadcastable serialized spec (template registry format)."""
        return spec_to_json(self.spec)


# Alias so code written against the reference API reads naturally.
WeakScraper = TemplateScraper
