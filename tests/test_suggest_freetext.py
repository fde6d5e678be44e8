"""FreeTextSuggester (2-gram stupid backoff) and WordBreakSpellChecker
(``lucene/suggest/.../analyzing/FreeTextSuggester.java``,
``lucene/suggest/.../spell/WordBreakSpellChecker.java``). The driver gate
certifies bitwise oracle parity; these tests pin the LM semantics the SQL
equivalence alone can't: backoff discount ordering and break/combine
dictionary membership."""

import pytest

from lucene_solr_spark.engine import get_engine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    return get_engine(spark, SF, "simple")


def test_freetext_bigram_beats_backoff_and_alpha_applied(eng):
    rows = eng.suggest_freetext("merge", "d", k=8).collect()
    assert rows
    by_gram = {}
    for r in rows:
        by_gram.setdefault(r.grams, []).append(r)
    if 2 in by_gram and 1 in by_gram:
        # conditional bigram probabilities dominate ALPHA-discounted
        # unigram rates on this corpus (dense co-occurrence)
        assert min(r.score for r in by_gram[2]) > max(r.score for r in by_gram[1])
    for r in rows:
        assert 0.0 < r.score <= 1.0
        assert r.term.startswith("d")


def test_freetext_no_duplicate_terms(eng):
    rows = eng.suggest_freetext("merge", "s", k=20).collect()
    terms = [r.term for r in rows]
    # higher order suppresses the backoff duplicate (Lucene's seen set)
    assert len(terms) == len(set(terms))


def test_wordbreak_break_and_combine(eng):
    rows = eng.word_break("mergebatch", ("bat", "ch")).collect()
    kinds = {r.kind for r in rows}
    assert "break" in kinds and "combine" in kinds
    brk = [r for r in rows if r.kind == "break"]
    assert any(r.suggestion == "merge batch" for r in brk)
    comb = [r for r in rows if r.kind == "combine"]
    assert comb[0].suggestion == "batch" and comb[0].freq >= 1
    # break freq = min of the two halves' dfs — bounded by either df
    ts = {r.term: r.df for r in eng.term_stats_df().collect()}
    for r in brk:
        lft, rgt = r.suggestion.split(" ")
        assert r.freq == min(ts[lft], ts[rgt])


def test_wordbreak_rejects_nondictionary_splits(eng):
    rows = eng.word_break("mergexyz", ("zz", "qq")).collect()
    assert rows == []  # no split half nor combination is in the dictionary


def test_fuzzy_suggester_prefix_window_and_ranking(eng):
    """FuzzySuggester (``lucene/suggest/.../analyzing/FuzzySuggester.java``):
    'sma' must complete exactly to 'small' AND fuzzy-reach 'scan'/'spark'
    (one substitution inside the length-3 prefix), ranked by df desc."""
    rows = eng.suggest_fuzzy_prefix("sma", k=10).collect()
    terms = [r.term for r in rows]
    assert "small" in terms and "scan" in terms and "spark" in terms
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_fuzzy_suggester_non_fuzzy_prefix_gates_first_char(eng):
    """nonFuzzyPrefix=1: 'mcan' must NOT reach 'scan' even though the edit
    distance is 1 — the first character is exact-match territory."""
    terms = [r.term for r in eng.suggest_fuzzy_prefix("mcan", k=10).collect()]
    assert "scan" not in terms


def test_fuzzy_suggester_short_key_is_exact_prefix_only(eng):
    """minFuzzyLength=3: a 2-char key gets NO fuzz — 'sm' completes only
    sm-prefixed suggestions, never 'scan'/'sort' (distance 1 from 'sm')."""
    terms = [r.term for r in eng.suggest_fuzzy_prefix("sm", k=10).collect()]
    assert terms and all(t.startswith("sm") for t in terms)
