"""Record the 32k-merge greedy-batch BPE training run (VERDICT r04
#6): train ``train_bpe(exact=False)`` to a real tokenizer-scale merge
budget over the deterministic rich-vocabulary corpus
(``synth_rich_text`` — the CC-style tables' 31-word generator
vocabulary saturates after a couple hundred merges, so this workload
needs its own corpus) and write the driver-round economics to
``BENCH/bpe32k.json``.

The artifact's point is the SCALE SHAPE, not the wall: exact mode is
O(n_merges) driver rounds (~32k Spark jobs — unusable), greedy-batch
mode is O(n_merges / batch_m) rounds; the JSON records rounds,
merges/round, and wall so the round count can be checked against the
O() claim. Wall times on this VM are ±50-90% noisy — rounds are the
stable number.

Usage:  python tools/bench_bpe32k.py  [n_merges] [batch_m]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from weakscraper_spark.operators.vocab import (  # noqa: E402
    EOW, segment_word, train_bpe)
from weakscraper_spark.plans.session import get_spark  # noqa: E402
from weakscraper_spark.sources.synth import synth_rich_text  # noqa: E402


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000
    batch_m = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("bpe32k", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    # 30k word types, every type covered ≥2× by the coverage stripe
    # (500·250/2 = 62 500 even slots ≥ 2·30 000)
    corpus = synth_rich_text(spark, 500, vocab_size=30_000,
                             words_per_doc=250)
    stats: dict = {}
    t0 = time.time()
    merges = train_bpe(corpus, n_merges=n_merges, batch_m=batch_m,
                       exact=False, stats=stats)
    wall = time.time() - t0
    # sanity: learned merges segment losslessly
    for w in ("training", "tokenizer", "corpus"):
        assert "".join(segment_word(w, merges)) == w + EOW
    out = {
        "n_merges_requested": n_merges,
        "merges_learned": len(merges),
        "batch_m": batch_m,
        "rounds": stats["rounds"],
        "merges_per_round": round(len(merges) / max(1, stats["rounds"]), 1),
        "sequential_rounds_avoided": len(merges) - stats["rounds"],
        "wall_sec": round(wall, 1),
        "corpus": {"docs": 500, "vocab_types": 30_000,
                   "words_per_doc": 250},
        "cpus": cpus,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "bpe32k.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
