"""SimpleQueryParser (``L/queryparser/simple/SimpleQueryParser.java``):
parse goldens + the never-throws contract. Driver entry ``ft_simpleqp_topk``
gates parse→execute against a hand-built oracle spec."""

import string

from hypothesis import given, settings, strategies as st

from lucene_solr_spark.analysis import SimpleAnalyzer
from lucene_solr_spark.search.query import (
    OrGroupClause,
    PhraseClause,
    TermClause,
)
from lucene_solr_spark.search.simpleparser import parse_simple


def _p(q, expand=None):
    return parse_simple(q, SimpleAnalyzer(), expand=expand)


def test_default_operator_is_or():
    spec = _p("merge batch")
    assert [c.term for c in spec.should] == ["merge", "batch"]
    assert not spec.must


def test_plus_promotes_to_must():
    spec = _p("+merge +batch")
    assert [c.term for c in spec.must] == ["merge", "batch"]
    assert not spec.should


def test_minus_prohibits():
    spec = _p("merge -scan")
    assert [c.term for c in spec.should] == ["merge"]
    assert [c.term for c in spec.must_not] == ["scan"]


def test_phrase_with_slop():
    spec = _p('"table hash"~2 merge')
    (ph,) = [c for c in spec.should if isinstance(c, PhraseClause)]
    assert ph.terms == ("table", "hash") and ph.slop == 2


def test_prefix_expansion():
    spec = _p("bat*", expand=lambda kind, pat: ["batch", "bath"])
    (g,) = spec.should
    assert isinstance(g, OrGroupClause) and g.terms == ("batch", "bath")


def test_group_becomes_or_subtree():
    spec = _p("(vector | stream) -scan")
    (g,) = spec.should
    assert isinstance(g, OrGroupClause) and g.terms == ("vector", "stream")
    assert [c.term for c in spec.must_not] == ["scan"]


def test_degradation_never_raises():
    # the SimpleQueryParser contract: every input parses
    for q in ['"unbalanced', "+-|", "a + ", "-", "((", "a))b", "|||", ""]:
        spec = _p(q)  # must not raise
        for c in [*spec.must, *spec.should]:
            assert isinstance(c, (TermClause, PhraseClause, OrGroupClause))


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + ' +|-"()*~0123456789',
               max_size=40))
def test_never_throws_property(q):
    _p(q, expand=lambda kind, pat: ["batch"] if pat else [])
