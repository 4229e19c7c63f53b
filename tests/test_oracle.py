"""Oracle ring 3 (SURVEY.md §6.2): mimic the driver's check — run each
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables; compare row counts + order-insensitive
canonicalized values. Rows-only queries are executed for schema/rows>0.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(pdf):
    """Order-insensitive canonical form: sorted column names, every
    cell stringified (Decimal scale pins the float formatting)."""
    cols = sorted(pdf.columns)
    rows = [tuple(str(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(ORACLES[name]).df()
    scols, srows = _canon(sdf)
    dcols, drows = _canon(ddf)
    assert scols == dcols, f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), \
        f"{name}: rowcount {len(srows)} vs {len(drows)}"
    if srows != drows:
        diffs = [(a, b) for a, b in zip(srows, drows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")


@pytest.mark.parametrize("name",
                         sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    names = {f.name for f in df.schema}
    assert {"url", "status", "text"} <= names
