"""Parity ring 1 (SURVEY.md §6.2): pure-Python engine vs golden
fixtures — no Spark. Byte-identical text + sorted-key-identical
fields_json, including failure parity (mismatch fixtures must fail
with the exact error class)."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent / "fixtures"))
from corpus import FIXTURES  # noqa: E402

from weakscraper_spark.enginelib import (  # noqa: E402
    CompareError,
    TemplateScraper,
)

IDS = [f["fixture_id"] for f in FIXTURES]


@pytest.fixture(params=FIXTURES, ids=IDS)
def fx(request):
    return request.param


def test_scrap_golden(fx):
    """Reference-shaped API: scrap() returns the exact dict or raises
    the exact error class (golden-output testing, SURVEY §6.1)."""
    scraper = TemplateScraper(fx["template"], fx.get("functions"))
    if fx["expected_status"] == "ok":
        result = scraper.scrap(fx["page"])
        assert result == fx["expected"]
        # byte-identical via canonical JSON
        assert json.dumps(result, sort_keys=True, ensure_ascii=False) == \
            json.dumps(fx["expected"], sort_keys=True, ensure_ascii=False)
    else:
        err_name = fx["expected_status"].split(":", 1)[1]
        with pytest.raises(CompareError) as ei:
            scraper.scrap(fx["page"])
        assert type(ei.value).__name__ == err_name


def test_extract_status_rows(fx):
    """Engine status-row contract (A13 mapping): never raises; emits
    status + byte-identical text column."""
    scraper = TemplateScraper(fx["template"], fx.get("functions"))
    row = scraper.extract(fx["page"])
    assert row["status"] == fx["expected_status"]
    assert row["text"] == fx["expected_text"]
    if fx["expected_status"] == "ok":
        assert row["fields"] == fx["expected"]
        assert row["error"] == ""
    else:
        assert row["fields"] is None
        assert row["error"]


def test_spec_json_roundtrip(fx):
    """Broadcast contract: spec → JSON → spec must be lossless and the
    deserialized spec must extract identically (SURVEY §4.1)."""
    from weakscraper_spark.enginelib import spec_from_json, spec_to_json
    from weakscraper_spark.enginelib.match import extract

    scraper = TemplateScraper(fx["template"], fx.get("functions"))
    spec2 = spec_from_json(spec_to_json(scraper.spec))
    assert spec2 == scraper.spec
    row = extract(spec2, fx["page"], fx.get("functions"))
    assert row["status"] == fx["expected_status"]
    assert row["text"] == fx["expected_text"]
