"""HTML table extraction: grid indexing, per-cell headers, markup
stripping, entity decode, nested-limit documentation, shape summary,
and plan shape (narrow map, zero shuffle before the shape agg)."""

import contextlib
import io
import re

import pytest

from weakscraper_spark.operators.htmltable import (extract_tables,
                                                   table_shapes)

_PAGE = """<html><body>
<p>prose before</p>
<table class="data" border=1>
 <thead><TR><TH scope="col">Name</TH><th>Score &amp; rank</th></TR></thead>
 <tbody>
  <tr><td><b>Ada</b> Lovelace</td><td>  9<sub>.5</sub>  </td></tr>
  <tr><td>Tie &lt;A&gt;</td><td></td></tr>
 </tbody>
</table>
<table><tr><td>solo</td></tr></table>
</body></html>"""

_RAGGED = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"


@pytest.fixture(scope="module")
def cells(spark):
    df = spark.createDataFrame(
        [("u1", _PAGE), ("u2", "<p>no tables here</p>"),
         ("u3", _RAGGED)], "url string, html string")
    return extract_tables(df).cache()


def test_grid_indexes(cells):
    got = {(r.table_idx, r.row_idx, r.col_idx): r.cell
           for r in cells.filter("url = 'u1'").collect()}
    assert got[(0, 0, 0)] == "Name"
    assert got[(0, 1, 1)] == "9.5"           # inner tags -> text, ws collapsed
    assert got[(0, 2, 0)] == "Tie <A>"       # entities decode
    assert got[(0, 2, 1)] == ""              # empty cell keeps its position
    assert got[(1, 0, 0)] == "solo"          # second table, indexes restart


def test_header_flag_per_cell(cells):
    hdr = {(r.row_idx, r.col_idx): r.is_header
           for r in cells.filter(
               "url = 'u1' AND table_idx = 0").collect()}
    assert hdr[(0, 0)] and hdr[(0, 1)]
    assert not hdr[(1, 0)] and not hdr[(2, 1)]


def test_entity_and_markup(cells):
    row0 = {r.col_idx: r.cell for r in cells.filter(
        "url = 'u1' AND table_idx = 0 AND row_idx = 0").collect()}
    assert row0[1] == "Score & rank"
    ada = cells.filter(
        "url = 'u1' AND table_idx = 0 AND row_idx = 1 "
        "AND col_idx = 0").collect()[0].cell
    assert ada == "Ada Lovelace"


def test_no_table_page_contributes_nothing(cells):
    assert cells.filter("url = 'u2'").count() == 0


def test_shapes(cells):
    s = {(r.url, r.table_idx): r for r in table_shapes(cells).collect()}
    t0 = s[("u1", 0)]
    assert (t0.n_rows, t0.n_cols, t0.ragged, t0.has_header) == \
        (3, 2, False, True)
    t1 = s[("u1", 1)]
    assert (t1.n_rows, t1.n_cols, t1.ragged, t1.has_header) == \
        (1, 1, False, False)
    rg = s[("u3", 0)]
    assert (rg.n_rows, rg.n_cols, rg.ragged, rg.has_header) == \
        (2, 2, True, False)


def test_binary_html_column(spark):
    df = spark.createDataFrame(
        [("u", _RAGGED.encode())], "url string, html binary")
    assert extract_tables(df).count() == 3


def test_plan_is_narrow_map(spark):
    df = spark.createDataFrame([("u", _PAGE)], "url string, html string")
    out = extract_tables(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    names = [m.group(1) for m in
             re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)",
                         buf.getvalue(), re.M)]
    assert "Exchange" not in names, names
    assert "BatchEvalPython" not in names, names
    assert "ArrowEvalPython" not in names, names
