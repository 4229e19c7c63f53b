"""Explain-audit of the r07 query family → BENCH/plans_r07.md
(the repo's plan-quality tradition: every new operator's physical
plan read and characterized — Exchanges counted, Python stages
located, broadcast sides confirmed — so scale claims are
plan-backed, not asserted).

Usage: python tools/plans_r07.py   (sf0.001 inputs, ~1 min)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["warc_cdx", "warc_write", "redirect_map",
           "minhash_incr", "temp_mix"]
SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def nodes_of(plan: str) -> list[str]:
    # count operators from the DETAILS section — in formatted
    # explain the tree says `Name (N)`, the details say `(N) Name`
    # (the r05 regex lesson)
    return [m.group(1) for m in
            re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)", plan, re.M)]


def main() -> None:
    from weakscraper_spark.plans.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("plans_r07", master="local[2]",
                      shuffle_partitions=4)
    qs = entry.queries()
    out = [
        "# Physical-plan audit — r07 query family",
        "",
        "explain('formatted') node census for every r07-new driver "
        "query at sf0.001 (plans are size-independent here: no AQE "
        "re-plan between sf tiers was observed in r04-r06 audits).",
        "",
    ]
    for name in QUERIES:
        df = qs[name](spark, SF)
        plan = plan_of(df)
        nodes = nodes_of(plan)
        from collections import Counter
        c = Counter(nodes)
        out.append(f"## {name}")
        out.append("")
        out.append(f"- nodes: {len(nodes)}; Exchange: "
                   f"{c.get('Exchange', 0)}; "
                   f"BroadcastExchange: "
                   f"{c.get('BroadcastExchange', 0)}; "
                   f"python stages (Arrow): "
                   f"{c.get('ArrowEvalPython', 0) + c.get('MapInPandas', 0) + c.get('FlatMapGroupsInPandas', 0)}; "
                   f"row-python (must be 0): "
                   f"{c.get('BatchEvalPython', 0)}")
        out.append(f"- census: "
                   f"{dict(sorted(c.items(), key=lambda kv: -kv[1]))}")
        out.append("")
    out += [
        "## Audit findings (fixed in-round)",
        "",
        "- `redirect_map` FIRST audited at **199 nodes / 17 "
        "Exchanges**: each pointer-doubling round joins `cur` "
        "against itself, so the un-truncated lineage re-derived the "
        "edge subtree 2^rounds times. Fixed with the connected-"
        "components discipline — eager localCheckpoint per round; "
        "the visible plan is now the checkpoint-truncated final "
        "join (10 nodes), with each round materialized exactly "
        "once.",
        "- `minhash_incr` FIRST audited at **137 nodes / 9 scans**: "
        "the combined band relation fed the overcap count and both "
        "join sides un-persisted, re-shingling the new batch three "
        "times. Fixed with a DISK_ONLY persist (the "
        "`minhash_lsh_pairs` persist_sigs discipline); the plan now "
        "shows InMemoryRelation reuse.",
        "",
    ]
    md = os.path.join(REPO, "BENCH", "plans_r07.md")
    with open(md, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {md}")
    spark.stop()


if __name__ == "__main__":
    main()
