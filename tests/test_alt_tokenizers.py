"""Whitespace + Keyword tokenizers (``LA/core/WhitespaceAnalyzer``,
``LA/core/KeywordAnalyzer``) — the alternative-tokenizer row of SURVEY §2.A.
Driver entry ``ft_whitespace_topk`` gates whitespace end-to-end; these
goldens certify the distinctive semantics the ASCII driver corpus can't
show (punctuation kept, case preserved, 255-split, single-token keyword)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lucene_solr_spark.analysis import KeywordAnalyzer, WhitespaceAnalyzer

WS_GOLDENS = [
    ("Hello,  World!", [("Hello,", 0), ("World!", 1)]),   # punct kept, case kept
    ("a\tb\nc d", [("a", 0), ("b", 1), ("c", 2), ("d", 3)]),
    ("don't STOP-now", [("don't", 0), ("STOP-now", 1)]),
    ("", []),
    ("   ", []),
]


@pytest.mark.parametrize("text,want", WS_GOLDENS)
def test_whitespace_goldens(text, want):
    assert WhitespaceAnalyzer().analyze(text) == want


def test_whitespace_max_token_len_split():
    toks = WhitespaceAnalyzer().analyze("x" * 600)
    assert [t for t, _ in toks] == ["x" * 255, "x" * 255, "x" * 90]


def test_whitespace_batch_equals_per_row_all_paths():
    texts = [t for t, _ in WS_GOLDENS] + ["plain merge batch", "MIXED Case"]
    a = WhitespaceAnalyzer()
    want_rows, want_terms, want_pos, want_len = [], [], [], []
    for i, t in enumerate(texts):
        toks = a.analyze(t)
        want_len.append(len(toks))
        for term, p in toks:
            want_rows.append(i), want_terms.append(term), want_pos.append(p)
    for inp in (pd.Series(texts), pa.array(texts, type=pa.string())):
        f = WhitespaceAnalyzer().analyze_batch(inp)
        assert f["row"].tolist() == want_rows
        assert f["term"].astype(str).tolist() == want_terms
        assert f["pos"].tolist() == want_pos
        assert list(f.attrs["doc_len"]) == want_len


def test_keyword_single_token():
    a = KeywordAnalyzer()
    assert a.analyze("Hello, World!") == [("Hello, World!", 0)]
    assert a.analyze("") == []
    f = a.analyze_batch(pd.Series(["one two", "", None, "Three"]))
    assert f["row"].tolist() == [0, 3]
    assert f["term"].tolist() == ["one two", "Three"]
    assert f["pos"].tolist() == [0, 0]
    np.testing.assert_array_equal(f.attrs["doc_len"], [1, 0, 0, 1])
    fa = a.analyze_batch(pa.array(["one two", "", None, "Three"]))
    assert fa["term"].tolist() == ["one two", "Three"]


def test_keyword_index_e2e(spark, tmp_path_factory):
    """KeywordAnalyzer over a small corpus: whole-value terms, tf=1, exact
    match only (the StringField shape)."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    pdf = pd.DataFrame({
        "conv_id": ["c0", "c1", "c2"],
        "turn_idx": np.zeros(3, dtype="int32"),
        "role": ["user"] * 3,
        "text": ["alpha beta", "alpha", "alpha beta"],
        "tool": [""] * 3,
        "ts": pd.Timestamp("2026-01-01"),
    })
    idx = str(tmp_path_factory.mktemp("kwtok") / "idx")
    build_index(spark, spark.createDataFrame(pdf), idx, n_segments=2,
                analyzer="keyword")
    s = IndexSearcher(spark, idx)
    hits = s.search(s.parse("term", ["alpha beta"], 0), k=10, with_keys=True).toPandas()
    assert set(hits.conv_id) == {"c0", "c2"}  # exact value match only
    hits = s.search(s.parse("term", ["alpha"], 0), k=10, with_keys=True).toPandas()
    assert set(hits.conv_id) == {"c1"}


# --- CJKBigramAnalyzer (LA/cjk/CJKBigramFilter, outputUnigrams=false) -------

CJK_GOLDENS = [
    # 4-char Han run → 3 overlapping bigrams, consecutive positions
    ("東京大学", [("東京", 0), ("京大", 1), ("大学", 2)]),
    # run + Latin passthrough (Latin token keeps its raw position)
    ("日本 spark merge", [("日本", 0), ("spark", 2), ("merge", 3)]),
    # isolated CJK char → unigram
    ("一", [("一", 0)]),
    # mixed Han+Hiragana run bigrams across the script boundary
    ("学ぶ the こと", [("学ぶ", 0), ("the", 2), ("こと", 3)]),
    # isolated CJK between Latin stays a unigram
    ("platform 東 overview", [("platform", 0), ("東", 1), ("overview", 2)]),
    # two separate runs (non-consecutive positions) don't bridge
    ("中文 and 中文", [("中文", 0), ("and", 2), ("中文", 3)]),
]


def test_cjk_bigram_goldens():
    from lucene_solr_spark.analysis import CJKBigramAnalyzer

    a = CJKBigramAnalyzer()
    for text, want in CJK_GOLDENS:
        assert a.analyze(text) == want, text


def test_cjk_bigram_batch_equals_per_row():
    from lucene_solr_spark.analysis import CJKBigramAnalyzer

    a = CJKBigramAnalyzer()
    texts = [t for t, _ in CJK_GOLDENS] + ["pure ascii text", ""]
    f = a.analyze_batch(pd.Series(texts))
    for r, text in enumerate(texts):
        got = [(row.term, int(row.pos)) for row in f[f.row == r].itertuples()]
        assert got == a.analyze(text), text
    # norm length = EMITTED token count (bigrams advance positions)
    np.testing.assert_array_equal(
        f.attrs["doc_len"],
        [len(a.analyze(t)) for t in texts],
    )


def test_cjk_index_e2e(spark, tmp_path_factory):
    """Bigram terms are what the index stores: a 2-char query matches only
    docs containing the adjacent pair."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    pdf = pd.DataFrame({
        "conv_id": ["c0", "c1", "c2"],
        "turn_idx": np.zeros(3, dtype="int32"),
        "role": ["user"] * 3,
        "text": ["東京大学 merge", "大学 only", "京大 here"],
        "tool": [""] * 3,
        "ts": pd.Timestamp("2026-01-01"),
    })
    idx = str(tmp_path_factory.mktemp("cjktok") / "idx")
    build_index(spark, spark.createDataFrame(pdf), idx, n_segments=2,
                analyzer="cjk")
    s = IndexSearcher(spark, idx)
    hits = s.search(s.parse("term", ["大学"], 0), k=10, with_keys=True).toPandas()
    assert set(hits.conv_id) == {"c0", "c1"}  # c0 via bigram 大学, c1 direct
    hits = s.search(s.parse("term", ["京大"], 0), k=10, with_keys=True).toPandas()
    assert set(hits.conv_id) == {"c0", "c2"}


def test_ngram_strict_drops_subminimum_tokens():
    """NGramTokenFilter(2,4) upstream default preserveOriginal=false:
    1-char tokens emit nothing (position hole) and leave the norm length;
    the preserveOriginal=true sibling keeps them. Batch == per-row."""
    import numpy as np
    import pandas as pd

    from lucene_solr_spark.analysis import NGramAnalyzer, NGramStrictAnalyzer

    text = "a big cat x ran"
    strict = NGramStrictAnalyzer().analyze_batch(pd.Series([text]))
    keep = NGramAnalyzer().analyze_batch(pd.Series([text]))

    # holes where 'a' (pos 0) and 'x' (pos 3) were; norms count 3 tokens
    assert sorted(set(strict["pos"])) == [1, 2, 4]
    assert strict.attrs["doc_len"].tolist() == [3]
    # the permissive sibling keeps the singles and counts all 5
    assert sorted(set(keep["pos"])) == [0, 1, 2, 3, 4]
    assert keep.attrs["doc_len"].tolist() == [5]
    # gram sets agree on the surviving tokens
    s3 = set(strict[strict["pos"] == 2]["term"].astype(str))
    assert s3 == {"ca", "at", "cat"}

    # per-row path agrees with the batch path (including doc_len)
    per_row = NGramStrictAnalyzer().analyze("a big cat x ran")
    assert [(t, p) for t, p in per_row] == list(
        zip(strict["term"].astype(str), strict["pos"])
    )
