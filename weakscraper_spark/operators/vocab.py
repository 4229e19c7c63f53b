"""Tokenizer-training preparation over the corpus: word-frequency
vocabulary statistics and distributed BPE merge learning (Sennrich,
Haddow & Birch, ACL'16 — the standard subword algorithm; word-level
variant with end-of-word marker).

Scale shapes:
- ``vocab_counts`` — one corpus-wide explode + two-phase groupBy;
  deterministic top-k via (count desc, word asc) ordering.
- ``train_bpe`` — the iterative merge loop, but over the DISTINCT-
  WORD table (vocab-sized, millions of rows), never the corpus:
  corpus word frequencies are aggregated ONCE, and every merge round
  operates on (word, freq, symbols) rows. Per round: one pair-count
  aggregation weighted by word frequency (map-side combinable), one
  1-row collect of the argmax pair (count desc, pair asc — fully
  deterministic), and one Arrow-batched merge map. Lineage is
  truncated by localCheckpoint every few rounds (same iterative-plan
  discipline as graph.connected_components).

Not SQL-expressible (iterative, driver-coordinated) except the
first round — ``vocab_counts`` and the pair-count primitive are the
oracle-checked parts; ``train_bpe`` is pytest-pinned on the
published algorithm's worked examples.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def vocab_counts(df: DataFrame, col: str = "text",
                 top_k: int | None = None) -> DataFrame:
    """(word, n) corpus word frequencies (whitespace tokens,
    lowercased — same tokenization family as the dedup ops).
    ``top_k`` keeps the k most frequent with deterministic
    (n desc, word asc) tie-break."""
    words = (df.select(F.explode(
        F.split(F.trim(F.lower(F.col(col))), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("n")))
    if top_k is not None:
        words = words.orderBy(F.desc("n"), "word").limit(top_k)
    return words


def _syms_df(words: DataFrame) -> DataFrame:
    """(word, freq) → (freq, syms): characters + end-of-word marker."""
    return words.select(
        "n",
        F.concat(F.split(F.col("word"), ""),
                 F.array(F.lit(EOW))).alias("syms"))


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent symbol-pair counts over the
    distinct-word table. The symbol array is a materialized column,
    so the pair lambda indexes it without re-evaluation (the
    lambda-CSE rule from dedup._shingles)."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("syms", i),
                F.element_at("syms", i + 1))),
    ).otherwise(F.array().cast("array<string>"))
    return (syms.select("n", F.explode(pairs).alias("pair"))
            .groupBy("pair").agg(F.sum("n").alias("cnt")))


def train_bpe(df: DataFrame, n_merges: int,
              col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right), ...] — the artifact a
    tokenizer ships. Ends early when no pair occurs twice."""
    state = _syms_df(vocab_counts(df, col)) \
        .localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for rnd in range(n_merges):
        top = (_pair_counts(state)
               .orderBy(F.desc("cnt"), "pair").limit(1).collect())
        if not top or top[0]["cnt"] < 2:
            break
        left, right = top[0]["pair"].split(" ", 1)
        merges.append((left, right))
        state = _merge_pair(state, left, right)
        if (rnd + 1) % 5 == 0:
            state = state.localCheckpoint(eager=True)
    return merges


def _merge_pair(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every adjacent (left, right) in the symbol arrays with
    the merged symbol — a linear scan per word, Arrow-batched (array
    look-ahead rewriting has no clean built-in form)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for s in pdf["syms"]:
                s = list(s)
                merged, i = [], 0
                while i < len(s):
                    if (i + 1 < len(s) and s[i] == left
                            and s[i + 1] == right):
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(s[i])
                        i += 1
                out.append(merged)
            yield pd.DataFrame({"n": pdf["n"], "syms": out})

    return syms.mapInPandas(run, "n long, syms array<string>")


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to one word (greedy in merge order — the
    published inference rule). Pure function for tests/serving."""
    s = list(word) + [EOW]
    for left, right in merges:
        merged, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                merged.append(left + right)
                i += 2
            else:
                merged.append(s[i])
                i += 1
        s = merged
    return s
