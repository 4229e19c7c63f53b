"""Functional tests for the round-5 corpus operators: exact-substring
duplication spans (Lee et al. k-gram approximation), the Naive-Bayes
model-based quality filter, the URL-string quality gate, and the
deterministic epoch shuffle with distributed global positions."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sub_docs(spark):
    # 12-token shared run planted in docs 1 and 2 (positions differ);
    # doc 3 repeats its own 8-token phrase twice; doc 4 is clean.
    shared = "alpha beta gamma delta epsilon zeta eta theta " \
             "iota kappa lambda mu"
    rep = "one two three four five six seven eight"
    rows = [
        (1, f"start marker {shared} tail words here"),
        (2, f"{shared} completely different ending tokens now"),
        (3, f"{rep} filler middle words {rep}"),
        (4, "totally unique sentence with no repeated material "
            "anywhere in this corpus at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_substring_spans_positions(sub_docs):
    from weakscraper_spark.operators.substr import dup_substring_spans
    spans = {(r.doc_id, r.span_start, r.span_end)
             for r in dup_substring_spans(sub_docs, k=8).collect()}
    # doc 1: shared run is tokens 2..13 → k=8 grams at starts 2..6,
    # merged span [2, 14)
    assert (1, 2, 14) in spans
    # doc 2: same run at tokens 0..11 → merged span [0, 12)
    assert (2, 0, 12) in spans
    # doc 3: self-repeat, both occurrences marked
    assert any(d == 3 for d, _, _ in spans)
    assert not any(d == 4 for d, _, _ in spans)


def test_dup_substring_stats_rollup(sub_docs):
    from weakscraper_spark.operators.substr import dup_substring_stats
    out = {r.doc_id: r for r in
           dup_substring_stats(sub_docs, k=8).collect()}
    assert len(out) == 4                      # every input doc present
    assert out[1].dup_tokens == 12
    assert out[2].dup_tokens == 12
    assert out[4].n_dup_spans == 0 and out[4].dup_frac == 0.0
    # doc 3: both 8-token occurrences duplicated = 16 tokens of 19
    assert out[3].dup_tokens == 16
    assert float(out[3].dup_frac) == round(16 / 19, 4)


def test_dup_substring_short_docs(spark):
    """Docs shorter than k emit no grams but still get a stats row."""
    from weakscraper_spark.operators.substr import dup_substring_stats
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string")
    out = {r.doc_id: r for r in dup_substring_stats(df, k=8).collect()}
    assert out[1].n_dup_spans == 0 and out[1].n_tokens == 2


def test_nb_classifier_separates(spark):
    from weakscraper_spark.operators.classify import nb_quality_filter
    good = "informative article discussing careful analysis of results"
    bad = "click here buy now free prize winner casino jackpot"
    rows = ([(i, good + f" extra{i}", 1) for i in range(5)] +
            [(100 + i, bad + f" spam{i}", 0) for i in range(5)] +
            [(200, "careful analysis of informative results", 1),
             (201, "free casino prize click now", 0)])
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    out = {r.doc_id: r for r in
           nb_quality_filter(df, "y").collect()}
    assert out[200].keep and out[200].nb_score > 0
    assert not out[201].keep and out[201].nb_score < 0
    assert all(out[i].keep for i in range(5))
    assert not any(out[100 + i].keep for i in range(5))


def test_nb_score_empty_vocab_doc(spark):
    """A doc whose tokens are all out-of-vocabulary scores NULL with
    n_scored = 0 — visible, not defaulted."""
    from weakscraper_spark.operators.classify import (
        nb_score, nb_token_logodds)
    train = spark.createDataFrame(
        [(1, "aaa bbb", 1), (2, "ccc ddd", 0)],
        "doc_id long, text string, y int")
    model = nb_token_logodds(train, "y")
    out = nb_score(
        spark.createDataFrame([(9, "zzz qqq")],
                              "doc_id long, text string"),
        model).collect()
    assert out[0].n_scored == 0 and out[0].nb_score is None


def test_url_quality_filter(spark):
    from weakscraper_spark.operators.urlnorm import url_quality_filter
    rows = [
        (1, "https://www.news.example.com/politics/story"),
        (2, "https://sub.casino.example/free-spins"),
        (3, "http://ok.example.org/download/file"),          # one soft hit
        (4, "http://bad.example.net/xxx/casino-page"),        # two strict
        (5, "https://torrent.winner.example.io/free-money"),  # 3 soft
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r.url: r for r in url_quality_filter(df).collect()}
    u = {i: rows[i - 1][1] for i in range(1, 6)}
    assert out[u[1]].keep and out[u[1]].url_score == 0.0
    assert out[u[2]].blocked_domain and not out[u[2]].keep
    assert out[u[2]].reg_domain == "casino.example"
    assert out[u[3]].keep and out[u[3]].url_score == 0.5
    assert not out[u[4]].keep and out[u[4]].url_score == 2.0
    assert not out[u[5]].keep and out[u[5]].url_score == 1.5
    assert out[u[1]].host == "news.example.com"


def test_epoch_shuffle_is_permutation(spark):
    from weakscraper_spark.operators.corpus import epoch_shuffle
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    out = epoch_shuffle(df, seed=7, num_partitions=8).collect()
    ids = sorted(r.doc_id for r in out)
    poss = sorted(r.pos for r in out)
    assert ids == list(range(500))
    assert poss == list(range(500))          # exact 0..n-1, no gaps


def test_epoch_shuffle_matches_global_order(spark):
    """Distributed positions equal the single-node row_number over
    the same md5 key — the range-partitioned offset trick is exact."""
    import hashlib
    from weakscraper_spark.operators.corpus import epoch_shuffle
    n, seed = 300, 3
    df = spark.range(0, n).select(F.col("id").alias("doc_id"))
    got = {r.doc_id: r.pos
           for r in epoch_shuffle(df, seed=seed,
                                  num_partitions=7).collect()}
    keys = sorted(range(n), key=lambda i: (
        hashlib.md5(f"{seed}:shuf:{i}".encode()).hexdigest(), i))
    want = {doc: pos for pos, doc in enumerate(keys)}
    assert got == want


def test_epoch_shuffle_seeds_differ(spark):
    from weakscraper_spark.operators.corpus import epoch_shuffle
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.pos for r in epoch_shuffle(df, seed=1).collect()}
    b = {r.doc_id: r.pos for r in epoch_shuffle(df, seed=2).collect()}
    assert a != b


def test_trim_dup_substrings(sub_docs):
    from weakscraper_spark.operators.substr import trim_dup_substrings
    out = {r.doc_id: r for r in
           trim_dup_substrings(sub_docs, k=8).collect()}
    assert out[1].text_clean == "start marker tail words here"
    assert out[1].dup_tokens == 12 and out[1].n_tokens == 17
    assert out[2].text_clean == \
        "completely different ending tokens now"
    assert out[3].text_clean == "filler middle words"  # both copies cut
    # clean doc passes through (lower-folded token join)
    assert out[4].dup_tokens == 0
    assert out[4].text_clean == \
        "totally unique sentence with no repeated material " \
        "anywhere in this corpus at all"


def test_chunk_tokens_disjoint(spark):
    from weakscraper_spark.operators.corpus import chunk_tokens
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b c")],
        "doc_id long, text string")
    out = sorted(((r.doc_id, r.chunk_id, r.chunk_start,
                   r.n_chunk_tokens, r.chunk_text)
                  for r in chunk_tokens(df, size=4).collect()))
    assert out == [
        (1, 0, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, 4, "w4 w5 w6 w7"),
        (1, 2, 8, 2, "w8 w9"),          # final window truncated
        (2, 0, 0, 3, "a b c"),           # short doc → one chunk
    ]


def test_chunk_tokens_sliding(spark):
    from weakscraper_spark.operators.corpus import chunk_tokens
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))],
        "doc_id long, text string")
    out = sorted((r.chunk_start, r.n_chunk_tokens) for r in
                 chunk_tokens(df, size=4, stride=2).collect())
    # starts 0,2,4,6 — window [6,10) reaches the doc end
    assert out == [(0, 4), (2, 4), (4, 4), (6, 4)]


def test_chunk_tokens_min_tokens(spark):
    from weakscraper_spark.operators.corpus import chunk_tokens
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(9)))],
        "doc_id long, text string")
    out = chunk_tokens(df, size=4, min_tokens=2).collect()
    # windows [0,4) [4,8) [8,9): the 1-token tail is dropped
    assert sorted(r.chunk_start for r in out) == [0, 4]


# ---------------------------------------------------------------- split


def test_split_by_group_consistency(spark):
    from weakscraper_spark.operators.corpus import split_by_group
    rows = [(i, f"h{i % 7}.example") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = split_by_group(df, "host",
                         {"train": 0.5, "val": 0.25, "test": 0.25})
    # every group maps to exactly one split — the leakage-free law
    per_group = (out.groupBy("host")
                 .agg(F.countDistinct("split").alias("n")).collect())
    assert all(r.n == 1 for r in per_group)
    assert set(r.split for r in out.collect()) <= {"train", "val",
                                                   "test"}


def test_split_by_group_fractions_approx(spark):
    from weakscraper_spark.operators.corpus import split_by_group
    # 1000 singleton groups: split sizes concentrate near fractions
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), F.col("id")).alias("g"))
    out = split_by_group(df, "g", {"train": 0.8, "val": 0.2},
                         seed=7)
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n"))
              .collect()}
    assert 730 <= counts["train"] <= 870
    assert counts["train"] + counts["val"] == 1000


def test_split_by_group_null_and_determinism(spark):
    from weakscraper_spark.operators.corpus import split_by_group
    df = spark.createDataFrame([(1, None), (2, "a")],
                               "doc_id long, host string")
    fr = {"train": 0.5, "val": 0.25, "test": 0.25}
    one = {(r.doc_id, r.split)
           for r in split_by_group(df, "host", fr).collect()}
    two = {(r.doc_id, r.split)
           for r in split_by_group(df, "host", fr).collect()}
    assert one == two                      # resume-stable
    null_split = dict(one)[1]
    assert null_split == "test"            # NULL falls to LAST split


def test_split_by_group_plan_is_narrow(spark):
    from weakscraper_spark.operators.corpus import split_by_group
    df = spark.createDataFrame([(1, "a")], "doc_id long, host string")
    plan = split_by_group(df, "host")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_split_by_group_validates(spark):
    from weakscraper_spark.operators.corpus import split_by_group
    df = spark.createDataFrame([(1, "a")], "doc_id long, host string")
    with pytest.raises(ValueError):
        split_by_group(df, "host", {})
    with pytest.raises(ValueError):
        split_by_group(df, "host", {"train": 0.0})


def test_prune_by_quantile(spark):
    from weakscraper_spark.operators.corpus import prune_by_quantile
    rows = [("a", i, float(i)) for i in range(10)] + \
           [("b", 100 + i, float(100 + i)) for i in range(10)] + \
           [("a", 999, None)]
    df = spark.createDataFrame(rows, "src string, doc_id long, s double")
    # global: keep top 50% -> threshold = interpolated median of the
    # 20 non-null scores; group b dominates
    top = prune_by_quantile(df, "s", keep_frac=0.5)
    ids = {r.doc_id for r in top.collect()}
    assert all(i >= 100 for i in ids) and len(ids) == 10
    # per-source: each source keeps its own top half
    per = prune_by_quantile(df, "s", keep_frac=0.5, by="src")
    got = sorted(r.doc_id for r in per.collect())
    assert got == [5, 6, 7, 8, 9, 105, 106, 107, 108, 109]
    # NULL scores never survive
    assert 999 not in set(got)
    # threshold column is auditable
    thr = {r.src: r.threshold for r in per.collect()}
    assert abs(thr["a"] - 4.5) < 1e-12
    import pytest as _pytest
    with _pytest.raises(ValueError):
        prune_by_quantile(df, "s", keep_frac=0.0)
