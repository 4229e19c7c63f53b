"""CLI ring: the ``spark-submit``-shaped entrypoint
(``python -m weakscraper_spark``) driven as a real subprocess —
synth → extract (heuristic fallback) → resume re-run → report.
This is the surface BASELINE.json's "submitted via spark-submit
--py-files" names; each step must print machine-readable JSON."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> list[dict]:
    env = dict(os.environ, PYTHONPATH=REPO,
               SPARK_GRAFT_MASTER="local[4]")
    proc = subprocess.run(
        [sys.executable, "-m", "weakscraper_spark", *args],
        capture_output=True, text=True, cwd=REPO, env=env,
        timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]


@pytest.mark.slow
def test_cli_synth_extract_resume_report(tmp_path):
    pages = str(tmp_path / "pages")
    sink = str(tmp_path / "sink")

    out = _run("synth", "--out", pages, "--pages", "200")
    assert out[-1]["pages"] == 200

    r1 = _run("extract", "--pages", pages, "--out", sink,
              "--run-id", "r1", "--fallback", "heuristic")[-1]
    assert r1["rows_written"] > 0
    assert r1["ok_written"] > 0

    # resume: identical input, new run id → 0-row increment
    r2 = _run("extract", "--pages", pages, "--out", sink,
              "--run-id", "r2", "--fallback", "heuristic")[-1]
    assert r2["rows_written"] == 0

    rep = _run("report", "--sink", sink, "--k", "5")
    assert 0 < len(rep) <= 5
    assert all("fail_rate" in row for row in rep)
