"""``mm`` spec grammar goldens — the upstream
``SolrPluginUtils#calculateMinShouldMatch`` javadoc examples plus clamps
and float-truncation edges (no Spark needed: pure function)."""

import pytest

from lucene_solr_spark.search.mm import calculate_min_should_match as mm


def test_bare_integer():
    assert mm(5, "3") == 3
    assert mm(2, "3") == 2          # clamp to clause count
    assert mm(5, "-2") == 3
    assert mm(1, "-2") == 0         # clamp to 0


def test_percentages_truncate():
    assert mm(10, "75%") == 7       # 7.5 truncates down
    assert mm(10, "-25%") == 8      # -2.5 truncates toward zero → 10-2
    assert mm(3, "100%") == 3
    assert mm(3, "-100%") == 0
    assert mm(9, "66%") == 5        # 5.94 → 5 (float32 path)


def test_conditionals_doc_example():
    # the classic handler example: "2<-25% 9<-3" —
    #   <=2 optional clauses: all required
    #   3..9: 25% can be missing
    #   >9: 3 can be missing
    spec = "2<-25% 9<-3"
    assert mm(1, spec) == 1
    assert mm(2, spec) == 2
    assert mm(4, spec) == 3         # 4 + int(-1.0)
    assert mm(8, spec) == 6         # 8 + int(-2.0)
    assert mm(12, spec) == 9        # 12 - 3


def test_conditionals_with_spaces_around_lt():
    assert mm(4, "2 < -25%") == 3


def test_invalid_conditional_raises():
    with pytest.raises(ValueError):
        mm(4, "2<")
