"""ComplexPhraseQueryParser parity (``L/queryparser/complexPhrase/
ComplexPhraseQueryParser.java``): the wildcard-in-phrase parser and its
MultiPhrase rewrite.

- last-slot wildcard must reproduce phrase_prefix_topk exactly (same
  MultiPhrase rewrite target);
- all-literal phrase must reproduce the plain phrase query;
- the parser's slot specs (like-translation, analysis of literals).
"""

from __future__ import annotations

import pytest

from lucene_solr_spark.engine import complex_phrase_parts, get_engine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark):
    return get_engine(spark, SF, "simple")


def test_parts_translation():
    class An:  # literal slots analyzed; wildcard slots bypass
        def analyze(self, s):
            return [(s.upper(), 0)]

    parts = complex_phrase_parts('"d?ta s* merge"', An())
    assert parts == [("like", "d_ta"), ("like", "s%"), ("term", "MERGE")]
    # quotes optional, case lowered on wildcards only
    assert complex_phrase_parts("Mer* Batch", An()) == [
        ("like", "mer%"), ("term", "BATCH"),
    ]


def test_last_slot_wildcard_equals_phrase_prefix(engine):
    cp = engine.complex_phrase_topk('"merge bat*"', k=10).collect()
    pp = engine.phrase_prefix_topk(["merge"], "bat", k=10).collect()
    assert [(r.rank, r.doc_id, r.score) for r in cp] == [
        (r.rank, r.doc_id, r.score) for r in pp
    ]
    assert cp, "fixture phrase must match at sf0.001"


def test_all_literal_equals_phrase(engine):
    cp = engine.complex_phrase_topk('"merge batch"', k=10).collect()
    ph = engine.topk("phrase2", ["merge", "batch"], k=10).collect()
    assert [(r.rank, r.doc_id, r.score) for r in cp] == [
        (r.rank, r.doc_id, r.score) for r in ph
    ]


def test_interior_wildcard_matches(engine):
    rows = engine.complex_phrase_topk('"d?ta s*"', k=10).collect()
    assert rows, "interior-wildcard phrase must match at sf0.001"
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
