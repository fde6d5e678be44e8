"""Analyzer chain goldens (FIXTURES.md §4 analyzer_golden): positions are
0-based and stop holes advance the position counter (StopFilter
enablePositionIncrements semantics)."""

import numpy as np
import pandas as pd

from lucene_solr_spark.analysis import LuceneChainAnalyzer, SimpleAnalyzer


def test_golden_sentence():
    a = LuceneChainAnalyzer()
    assert a.analyze("The Quick fox and the lazy dog!") == [
        ("quick", 1), ("fox", 2), ("lazi", 5), ("dog", 6),
    ]


def test_stopword_only_is_empty():
    a = LuceneChainAnalyzer()
    assert a.analyze("the and of to is") == []


def test_punctuation_and_case():
    a = LuceneChainAnalyzer()
    assert a.analyze("Running, CONNECTED! errors?") == [
        ("run", 0), ("connect", 1), ("error", 2),
    ]


def test_max_token_length_split():
    a = SimpleAnalyzer()
    long = "x" * 600
    toks = a.analyze(long)
    assert [t for t, _ in toks] == ["x" * 255, "x" * 255, "x" * 90]
    assert [p for _, p in toks] == [0, 1, 2]


def test_batch_matches_single():
    a = LuceneChainAnalyzer()
    texts = pd.Series([
        "The Quick fox and the lazy dog!",
        "",
        "running RUNS ran connection",
        "the and of",
        "spark error token spark",
    ])
    frame = a.analyze_batch(texts)
    for i, text in enumerate(texts):
        got = list(zip(frame.term[frame.row == i], frame.pos[frame.row == i]))
        assert got == a.analyze(text), f"row {i}"
    # doc_len = kept tokens only (holes don't count)
    np.testing.assert_array_equal(frame.attrs["doc_len"], [4, 0, 4, 0, 4])


def test_batch_all_empty():
    a = LuceneChainAnalyzer()
    frame = a.analyze_batch(pd.Series(["", None, "the"]))
    assert len(frame) == 0
    np.testing.assert_array_equal(frame.attrs["doc_len"], [0, 0, 0])


def test_apostrophe_kept_in_token():
    a = SimpleAnalyzer()
    assert a.analyze("don't stop")[0][0] == "don't"
