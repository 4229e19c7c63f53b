"""Positional inverted index + exact-phrase retrieval: positions,
term filtering, overlapping repeated-term matches, and the map-side
filter plan discipline."""

import contextlib
import io
import re

import pytest

from weakscraper_spark.operators.search import (build_postings,
                                                phrase_search)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "cat cat cat"),
         (3, "  The CAT  \t sat "),      # case + whitespace runs
         (4, "dog only here")],
        "doc_id long, text string")


def test_postings_positions(docs):
    p = {(r.term, r.doc_id): (r.tf, r.positions)
         for r in build_postings(docs).collect()}
    assert p[("the", 1)] == (2, [1, 5])
    assert p[("cat", 2)] == (3, [1, 2, 3])
    assert p[("cat", 3)] == (1, [2])      # lower + trim + \s+ split
    assert ("the", 4) not in p


def test_postings_term_filter(docs):
    p = build_postings(docs, terms=["cat"])
    assert set(r.term for r in p.collect()) == {"cat"}


def test_phrase_basic(docs):
    got = {r.doc_id: (r.n_matches, r.first_positions)
           for r in phrase_search(docs, ["cat", "sat"]).collect()}
    assert got == {1: (1, [2]), 3: (1, [2])}


def test_phrase_repeated_term_overlaps(docs):
    got = {r.doc_id: (r.n_matches, r.first_positions)
           for r in phrase_search(docs, ["cat", "cat"]).collect()}
    assert got == {2: (2, [1, 2])}        # overlapping occurrences
    assert phrase_search(docs, ["cat", "cat", "cat"]).collect()[0] \
        .first_positions == [1]


def test_phrase_three_terms_and_miss(docs):
    got = phrase_search(docs, ["the", "cat", "sat"]).collect()
    assert {r.doc_id for r in got} == {1, 3}
    assert phrase_search(docs, ["sat", "cat"]).count() == 0
    assert phrase_search(docs, ["absent", "cat"]).count() == 0


def test_single_term_phrase(docs):
    got = {r.doc_id: r.n_matches
           for r in phrase_search(docs, ["cat"]).collect()}
    assert got == {1: 1, 2: 3, 3: 1}


def test_empty_phrase_raises(docs):
    with pytest.raises(ValueError):
        phrase_search(docs, [])


def test_filter_precedes_shuffle(docs):
    """The term filter must run below the exchange: no corpus-width
    rows enter the shuffle (the BM25 discipline)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        build_postings(docs, terms=["cat"]).explain("formatted")
    txt = buf.getvalue()
    ids = {}
    for m in re.finditer(r"\((\d+)\)\s+(\w+)", txt):
        ids.setdefault(m.group(2), int(m.group(1)))
    # formatted explain numbers bottom-up from the scan: the filter's
    # id must be below the first exchange's
    assert "Filter" in ids and "Exchange" in ids, ids
    assert ids["Filter"] < ids["Exchange"], ids
    # and it is the term filter (mentions the literal), not something else
    assert "cat" in txt


def test_case_carrying_queries_normalize(docs):
    """r05 review: tokens are lowercased, so query terms must be too
    — a cased query silently matching nothing is a trap."""
    from weakscraper_spark.operators.search import bm25_scores
    assert build_postings(docs, terms=["CAT"]).count() > 0
    got = {r.doc_id for r in phrase_search(docs, ["Cat", "SAT"]).collect()}
    assert got == {1, 3}
    assert bm25_scores(docs, ["CAT"]).count() == 3
