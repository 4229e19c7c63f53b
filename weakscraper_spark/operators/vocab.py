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
  operates on (word, freq, symbols) rows. Per driver round: one
  pair-count aggregation weighted by word frequency (map-side
  combinable), one small collect of the top pairs, an EXACT batch
  selection (below), and one Arrow-batched merge map applying the
  whole batch. Lineage is truncated every few rounds (same
  iterative-plan discipline as graph.connected_components);
  ``checkpoint_dir`` switches truncation from executor-storage
  localCheckpoint to reliable checkpoint for preemptible clusters.

  Batched-merge exactness (VERDICT r03 #5 — one driver round-trip
  per merge is ~64k Spark jobs at a real 32k vocab): applying the
  top-m pairs in one pass replays sequential BPE verbatim iff
  (a) accepted pairs are pairwise SYMBOL-DISJOINT (then no accepted
  merge can create or destroy another accepted pair's occurrences:
  a merge replaces two symbols with one and only touches pairs
  sharing its symbols), and (b) every accepted count is STRICTLY
  greater than the first conflicting/truncated count — a merge of
  (a,b) can mint new pairs like (x,ab), but every occurrence of
  (x,ab) was an occurrence of old pair (x,a), which shares symbol
  ``a`` and is therefore at or below the first conflict in the
  (count desc, pair asc) order; strict dominance means sequential's
  argmax at every sub-step is exactly the next accepted pair, ties
  included. Worst case (immediate conflict) degrades to batch size
  1 = the sequential algorithm.

Not SQL-expressible (iterative, driver-coordinated) except the
first round — ``vocab_counts`` and the pair-count primitive are the
oracle-checked parts; ``train_bpe`` is pytest-pinned on the
published algorithm's worked examples.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .iterstate import ckpt as _ckpt

EOW = "</w>"


def vocab_counts(df: DataFrame, col: str = "text",
                 top_k: int | None = None) -> DataFrame:
    """(word, n) corpus word frequencies (whitespace tokens,
    lowercased — same tokenization family as the dedup ops).
    ``top_k`` keeps the k most frequent with deterministic
    (n desc, word asc) tie-break."""
    from .fanout import fan_out
    words = (fan_out(df.select(col))
        .select(F.explode(
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


def _sym_str_df(words: DataFrame) -> DataFrame:
    """(word, freq) → (n, s): the symbol sequence as ONE space-joined
    string ("c h a r s </w>") — the representation ``train_bpe``'s
    JVM merge path iterates on. Space is a safe delimiter: words are
    whitespace-split upstream, so no symbol can ever contain one.
    Derived through the same char-split + EOW append as ``_syms_df``
    so the two forms cannot drift."""
    return words.select(
        "n",
        F.concat_ws(" ",
                    F.concat(F.split(F.col("word"), ""),
                             F.array(F.lit(EOW)))).alias("s"))


def _merge_pairs_str(state: DataFrame,
                     pairs: list[tuple[str, str]]) -> DataFrame:
    """JVM replacement for the Python merge map over the STRING state
    (r08): each (left, right) becomes one literal token-anchored
    ``regexp_replace`` "left right" → "leftright". Java's regex
    engine replaces non-overlapping matches strictly left to right,
    which IS the greedy scan of ``_merge_pairs``/``segment_word``:
    after a match the scan resumes past the consumed pair, so an
    overlapping occurrence ("a a a" with (a,a)) merges exactly once
    ("aa a"). The boundary spaces sit in LOOKAROUNDS, not the match,
    so adjacent occurrences ("a b a b") both merge. Chaining the
    batch in order replays ``_merge_pairs`` verbatim (a batch's
    pairs are symbol-disjoint by selection, so no later pattern can
    involve an earlier replacement's operands or minted symbol).
    Python-free: the round no longer pays worker fork + Arrow serde
    of the whole word table (~0.27 s/round at sandbox scale,
    measured r08 with an identity mapInArrow)."""
    import re as _re

    def _sql_str(x: str) -> str:
        # Spark SQL single-quoted literal (backslash-escaping parser)
        return "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'"

    # the whole chain in ONE F.expr call (the _lit_doubles rule): a
    # per-Column build is ~2 py4j round trips per pair per round,
    # which at O(vocab/batch_m) rounds is seconds of pure driver time
    expr = "s"
    for left, right in pairs:
        pat = (r"(?:(?<=^)|(?<= ))" + _re.escape(left) + " "
               + _re.escape(right) + r"(?= |$)")
        rep = (left + right).replace("\\", "\\\\").replace("$", r"\$")
        expr = (f"regexp_replace({expr}, {_sql_str(pat)}, "
                f"{_sql_str(rep)})")
    return state.select("n", F.expr(expr).alias("s"))


#: the adjacent-pair expression over a ``syms`` column, cached PER
#: SESSION: Column trees are immutable py4j handles, and rebuilding
#: this one costs ~20 driver↔JVM round trips per train_bpe ROUND
#: (O(vocab/batch_m) rounds — the _lit_doubles lesson applied to a
#: hot builder). Keyed on the owning session, not process-global: a
#: gateway shutdown between bench phases (bench._stop_hard) kills
#: cross-session handles with a NullPointerException on reuse.
_PAIR_CACHE: tuple | None = None


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent symbol-pair counts over the
    distinct-word table. The symbol array is a materialized column,
    so the pair lambda indexes it without re-evaluation (the
    lambda-CSE rule from dedup._shingles)."""
    global _PAIR_CACHE
    sess = syms.sparkSession
    if _PAIR_CACHE is None or _PAIR_CACHE[0] is not sess:
        _PAIR_CACHE = (sess, F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("syms", i),
                    F.element_at("syms", i + 1))),
        ).otherwise(F.array().cast("array<string>")))
    return (syms.select("n", F.explode(_PAIR_CACHE[1]).alias("pair"))
            .groupBy("pair").agg(F.sum("n").alias("cnt")))


def _select_exact_batch(rows, max_take: int) -> list[tuple[str, str]]:
    """Greedy exact-batch selection over collected (pair, cnt) rows,
    already sorted (cnt desc, pair asc). Accept pairs while symbol-
    disjoint from everything accepted so far (left, right, AND the
    minted left+right symbol); on the first conflict — or if the
    collected window was truncated — keep only accepted pairs whose
    count STRICTLY exceeds the bounding count (see module docstring
    for why that replays sequential BPE exactly). Always returns at
    least the argmax pair when any pair has cnt >= 2."""
    accepted: list[tuple[str, str, int]] = []
    touched: set[str] = set()
    bound: int | None = None
    for r in rows:
        if r["cnt"] < 2:
            break
        left, right = r["pair"].split(" ", 1)
        if left in touched or right in touched or (left + right) in touched:
            bound = r["cnt"]
            break
        accepted.append((left, right, r["cnt"]))
        touched.update((left, right, left + right))
    else:
        # no conflict seen; if the window was full it may be truncated
        # mid-tie — bound by the last row we could see
        if len(rows) >= max_take and rows:
            bound = rows[-1]["cnt"]
    if bound is not None:
        kept = [(a, b) for a, b, c in accepted if c > bound]
        if not kept and accepted:
            kept = [accepted[0][:2]]  # argmax alone = sequential step
        return kept
    return [(a, b) for a, b, _ in accepted]


def _select_greedy_batch(rows) -> list[tuple[str, str]]:
    """Scale-mode batch selection: accept every symbol-disjoint pair
    in the window in (cnt desc, pair asc) order, SKIPPING conflicting
    ones instead of stopping. Not a verbatim sequential replay — when
    top pairs share symbols ("t h" / "h e"), sequential interleaves
    them while this takes the disjoint subset first — but every merge
    chosen is a then-most-frequent disjoint pair, the batching rule
    fast tokenizer trainers use. O(merges/batch) driver rounds."""
    batch: list[tuple[str, str]] = []
    touched: set[str] = set()
    for r in rows:
        if r["cnt"] < 2:
            break
        left, right = r["pair"].split(" ", 1)
        if (left in touched or right in touched
                or (left + right) in touched):
            continue
        batch.append((left, right))
        touched.update((left, right, left + right))
    return batch


def train_bpe(df: DataFrame, n_merges: int, col: str = "text",
              batch_m: int = 64, exact: bool = True,
              checkpoint_dir: str | None = None,
              stats: dict | None = None) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right), ...] — the artifact a
    tokenizer ships. Ends early when no pair occurs twice.

    ``batch_m``: top-pair window collected per driver round.
    ``exact`` (default): batches only up to the dominance bound, so
    the merge list replays single-step BPE VERBATIM — on corpora
    whose top pairs share symbols this degrades toward one merge per
    round (the sequential data dependency is real, not an
    implementation artifact). ``exact=False`` is the 32k-vocab scale
    path: greedy disjoint batching (``_select_greedy_batch``) does
    ~batch_m merges per driver round — O(vocab/batch_m) rounds — at
    the cost of a slightly reordered, still-valid merge list.
    ``checkpoint_dir``: when set, lineage truncation uses reliable
    ``checkpoint()`` into that directory instead of
    ``localCheckpoint`` — localCheckpoint pins lineage to executor
    storage and is lost on executor death, so on a preemptible
    cluster pass a durable dir; locally the default is faster.
    ``stats``: optional dict the trainer fills with
    {rounds, merges_learned, batch_sizes} — the driver-round count is
    THE scale metric for ``exact=False`` (O(vocab/batch_m) rounds is
    the whole point; bench records it)."""
    # the loop state is the STRING form (n, s): the merge map is then
    # a chain of literal JVM regexp_replace passes (_merge_pairs_str)
    # instead of a Python stage — no worker fork, no Arrow transfer
    # of the word table, per round (r08; the Python _merge_pairs is
    # kept for the narrow single-pair tools/tests surface).
    state = _ckpt(_sym_str_df(vocab_counts(df, col)), checkpoint_dir)
    # fan the LOOP STATE out to cluster parallelism (the fanout.py
    # rationale applied to iterating state): the word table
    # materializes with byte-sized (AQE advisory) partitions — 2 on
    # the sandbox corpus — but every round runs the CPU-bound regex
    # merge chain + pair explode over it, so partition count, not
    # bytes, sets the round wall. With the Python stage gone this is
    # pure JVM work with no per-task fixed cost, so spreading it
    # wins (measured r08 — the same fan-out LOST while the merge map
    # was a Python stage, because worker fork + pyarrow import per
    # task set a floor that 32 tasks paid 32 times). One tiny
    # up-front shuffle; narrow rounds preserve the partitioning. At
    # scale the table already carries ≥ core-count partitions and
    # this is a no-op.
    par = df.sparkSession.sparkContext.defaultParallelism
    if state.rdd.getNumPartitions() < par:
        state = _ckpt(state.repartition(par), checkpoint_dir)
    merges: list[tuple[str, str]] = []
    rnd = 0
    # STATIC planning for the round loop (iterstate.static_loop, r08):
    # the per-round relations are the fixed-shape distinct-word table
    # and its pair counts; under AQE every round's exchange
    # materialized as its own scheduler job (plus re-planning gaps),
    # multiplying O(vocab/batch_m) driver rounds by several jobs
    # each. Statically the round is ONE TakeOrdered collect whose
    # lineage cascades the lazy checkpoint. Partition count = the
    # materialized word table's (data-derived). Merge selection is
    # integer counts + a total (cnt desc, pair asc) order, so the
    # learned list is byte-identical under any partitioning.
    from .iterstate import static_loop
    with static_loop(df.sparkSession, state.rdd.getNumPartitions()):
        while len(merges) < n_merges:
            top = (_pair_counts(
                       state.select("n",
                                    F.split("s", " ").alias("syms")))
                   .orderBy(F.desc("cnt"), "pair").limit(batch_m)
                   .collect())
            batch = (_select_exact_batch(top, batch_m) if exact
                     else _select_greedy_batch(top))
            batch = batch[:n_merges - len(merges)]
            if not batch:
                break
            merges.extend(batch)
            state = _merge_pairs_str(state, batch)
            rnd += 1
            if stats is not None:
                stats.setdefault("batch_sizes", []).append(len(batch))
            if checkpoint_dir is None:
                # truncate EVERY round, lazily: the next round's
                # pair-count collect materializes the checkpoint, so
                # each Python merge pass executes exactly once — the
                # old every-5 cadence re-ran up to 4 un-truncated
                # merge maps per round (1+2+3+4+5 ≈ 3× redundant
                # Python work between checkpoints, measured r08 on
                # the 4k-merge phase)
                state = _ckpt(state, None, eager=False)
            elif rnd % 5 == 0:
                # reliable checkpoints write to the durable dir —
                # keep the amortized cadence there (an HDFS write per
                # round would swamp the loop at scale)
                state = _ckpt(state, checkpoint_dir)
    if stats is not None:
        stats["rounds"] = rnd
        stats["merges_learned"] = len(merges)
    return merges




def _merge_pairs(syms: DataFrame,
                 pairs: list[tuple[str, str]]) -> DataFrame:
    """Replace adjacent occurrences of each (left, right) in ``pairs``
    (applied in order, same greedy left-to-right scan as
    ``segment_word``) with the merged symbol — linear scans per word,
    Arrow-batched (array look-ahead rewriting has no clean built-in
    form). One Spark map applies the whole batch."""

    import pyarrow as pa

    def run(batches: "Iterator[pa.RecordBatch]") \
            -> "Iterator[pa.RecordBatch]":
        # Arrow-native (not pandas): the merge map runs once per
        # DRIVER ROUND, so per-invocation constants — the worker's
        # pandas import and the Arrow↔pandas list-of-lists
        # conversions — multiply by O(vocab/batch_m) rounds; the
        # plain-list pyarrow path keeps the identical per-word
        # rewrite loop (r08)
        for b in batches:
            out = []
            for s in b.column("syms").to_pylist():
                # presence pre-check: a pair whose left or right symbol
                # does not occur in the word cannot match anywhere, so
                # the per-pair scan is a guaranteed no-op — skipping it
                # turns O(batch × len) scans per word into O(hits)
                # (r08: ~30× on the 4k-merge phase; Zipf means most of
                # a 256-pair batch touches few words). The set is only
                # ever GROWN after a merge (stale members cost one
                # wasted scan, never a wrong skip), so the rewrite is
                # byte-identical to the unconditional loop.
                present = set(s)
                for left, right in pairs:
                    if left not in present or right not in present:
                        continue
                    merged, i = [], 0
                    changed = False
                    while i < len(s):
                        if (i + 1 < len(s) and s[i] == left
                                and s[i + 1] == right):
                            merged.append(left + right)
                            changed = True
                            i += 2
                        else:
                            merged.append(s[i])
                            i += 1
                    s = merged
                    if changed:
                        present.add(left + right)
                out.append(s)
            yield pa.RecordBatch.from_arrays(
                [b.column("n"),
                 pa.array(out, type=pa.list_(pa.string()))],
                ["n", "syms"])

    return syms.mapInArrow(run, "n long, syms array<string>")


def _merge_pair(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Single-pair form of ``_merge_pairs`` (kept for tests/tools)."""
    return _merge_pairs(syms, [(left, right)])


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


def encode_bpe(df: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", col: str = "text",
               keep_pieces: bool = False) -> DataFrame:
    """Apply a trained merge list to the corpus — the SERVING half of
    the tokenizer (train_bpe learns the artifact, this one uses it):

    (id, n_words, n_pieces[, pieces])

    ``n_pieces`` is the document's subword count — the length the
    packing/chunking stages budget by. Semantics match
    :func:`segment_word` (ordered-replay greedy); the encoder here
    uses the standard rank-dict repeated-min-pair loop, which is
    equivalent on any TRAINABLE merge list (each merge's operands
    exist before it — proven equivalent in tests against
    segment_word on trained lists).

    Scale shape: merges ship once per task via the Arrow closure (a
    32k list is ~1 MB); the per-batch word cache exploits the Zipf
    head — each unique word is segmented once per batch, so work is
    O(unique words), not O(tokens). Pure narrow map; only the
    (id, counts) rows come back."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _segment(word: str) -> list[str]:
        s = list(word) + [EOW]
        while len(s) > 1:
            best, bi = None, -1
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            # merge ALL occurrences of the best pair, left to right
            left, right = s[bi], s[bi + 1]
            merged, i = [], 0
            while i < len(s):
                if (i + 1 < len(s) and s[i] == left
                        and s[i + 1] == right):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            s = merged
        return s

    out_cols = (f"_id string, n_words int, n_pieces int"
                + (", pieces array<string>" if keep_pieces else ""))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nw, npc = [], [], []
            pieces_col = []
            for _id, text in zip(pdf["_id"], pdf[col]):
                words = (text or "").lower().split()
                total, doc_pieces = 0, []
                for w in words:
                    seg = cache.get(w)
                    if seg is None:
                        seg = _segment(w)
                        cache[w] = seg
                    total += len(seg)
                    if keep_pieces:
                        doc_pieces.extend(seg)
                ids.append(_id)
                nw.append(len(words))
                npc.append(total)
                if keep_pieces:
                    pieces_col.append(doc_pieces)
            data = {"_id": ids, "n_words": nw, "n_pieces": npc}
            if keep_pieces:
                data["pieces"] = pieces_col
            yield pd.DataFrame(data)

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = out_cols.replace("_id string", f"_id {id_type}")
    from .fanout import fan_out
    return (fan_out(df.select(F.col(id_col).alias("_id"), col))
            .mapInPandas(run, out_schema)
            .withColumnRenamed("_id", id_col))
