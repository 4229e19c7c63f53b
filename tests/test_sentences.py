"""Sentence segmentation: boundary clusters, unterminated tails,
indexing, min-token filter, and the narrow-map plan."""

import contextlib
import io
import re

import pytest

from weakscraper_spark.operators.textstats import segment_sentences


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "One two. Three four five! Really?! tail fragment"),
         (2, "no terminator at all"),
         (3, "  . ! "),                      # punctuation-only noise
         (4, "A. B? C!")],
        "doc_id long, text string")


def test_boundaries_and_tail(docs):
    got = {(r.doc_id, r.sent_idx): (r.sentence, r.n_tokens)
           for r in segment_sentences(docs).collect()}
    assert got[(1, 0)] == ("One two.", 2)
    assert got[(1, 1)] == ("Three four five!", 3)
    assert got[(1, 2)] == ("Really?!", 1)    # cluster = ONE boundary
    assert got[(1, 3)] == ("tail fragment", 2)
    assert got[(2, 0)] == ("no terminator at all", 4)


def test_punctuation_only_doc_drops(docs):
    # doc 3 yields sentences '.' and '!' -> trimmed non-empty, kept
    # at min_tokens=1 as 1-token noise; min_tokens=2 drops them
    out = segment_sentences(docs, min_tokens=2)
    assert out.filter("doc_id = 3").count() == 0


def test_index_gaps_preserved(docs):
    idx = [r.sent_idx for r in segment_sentences(docs, min_tokens=3)
           .filter("doc_id = 1").orderBy("sent_idx").collect()]
    assert idx == [1]                         # gaps mark dropped sents


def test_single_letter_sentences(docs):
    got = [r.sentence for r in segment_sentences(docs)
           .filter("doc_id = 4").orderBy("sent_idx").collect()]
    assert got == ["A.", "B?", "C!"]


def test_plan_is_narrow_map(docs):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        segment_sentences(docs).explain("formatted")
    names = [m.group(1) for m in
             re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)",
                         buf.getvalue(), re.M)]
    assert "Exchange" not in names, names
    assert "ArrowEvalPython" not in names, names
