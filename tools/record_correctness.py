"""Record the FULL in-repo correctness ledger: the driver samples
only ~50 ``queries()`` entries per round, so COVERAGE.md's ★ claims
need a committed record covering EVERY query (ADVICE r03). This runs
the same Spark-vs-DuckDB comparison as tests/test_oracle.py (and the
driver's gate) at the driver's sf0.01 over all entries and writes
CORRECTNESS_local.json at the repo root.

Usage:  python tools/record_correctness.py  [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from weakscraper_spark.plans.session import get_spark  # noqa: E402


def _canon(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(str(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("record_correctness", master="local[8]")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ledger: dict[str, dict] = {}
    for name, fn in queries.items():
        rec: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(ddf)
                scols, srows = _canon(sdf)
                dcols, drows = _canon(ddf)
                rec["rows_match"] = len(srows) == len(drows)
                rec["schema_match"] = scols == dcols
                rec["hash_match"] = srows == drows
            else:
                rec["err"] = "no_oracle"
        except Exception as exc:  # noqa: BLE001 - ledger, not a test
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        ledger[name] = rec
        print(name, "OK" if rec["hash_match"] else rec["err"] or "MISMATCH")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CORRECTNESS_local.json")
    with open(out, "w") as fh:
        json.dump({"sf_dir": sf_dir, "results": ledger}, fh, indent=1)
    n_oracle = sum(1 for r in ledger.values() if r["hash_match"])
    n_bad = sum(1 for r in ledger.values()
                if r["hash_match"] is False or
                (r["err"] and r["err"] != "no_oracle"))
    print(f"wrote {out}: {n_oracle} oracle-green, "
          f"{sum(1 for r in ledger.values() if r['err'] == 'no_oracle')} "
          f"rows-only, {n_bad} failures")
    spark.stop()


if __name__ == "__main__":
    main()
