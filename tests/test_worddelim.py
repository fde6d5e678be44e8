"""WordDelimiterGraphFilter subset + KeywordRepeat/EnglishMinimalStem/
RemoveDuplicates chains + SynonymQuery (``LA/miscellaneous/
WordDelimiterGraphFilter``, ``LA/miscellaneous/KeywordRepeatFilter``,
``LA/en/EnglishMinimalStemFilter``, ``L/search/SynonymQuery``).

Driver entries ``ft_worddelim_topk`` / ``ft_keywordrepeat_topk`` /
``ft_synonymquery_topk`` gate the chains end-to-end against DuckDB; these
goldens certify the corpus-side behavior the plain-lowercase driver corpus
can't show (case/hyphen/digit splitting, plural stem repeats, the
duplicate-collapse rule) and the summed-tf/max-df synonym scoring math.
"""

import string

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from lucene_solr_spark.analysis import (
    KeywordRepeatAnalyzer,
    WordDelimiterGraphAnalyzer,
    english_minimal_stem,
)

WD_GOLDENS = [
    # case change + upper-run end
    ("PowerShot ABCDef", [("power", 0), ("shot", 1), ("abc", 2), ("def", 3)]),
    # delimiter split + letter/digit transitions
    ("Wi-Fi2 500GB", [("wi", 0), ("fi", 1), ("2", 2), ("500", 3), ("gb", 4)]),
    # all-delimiter token leaves a 1-position hole
    ("merge ++ batch", [("merge", 0), ("batch", 2)]),
    ("O'Neil", [("o", 0), ("neil", 1)]),
    ("plain merge", [("plain", 0), ("merge", 1)]),
    ("", []),
]


@pytest.mark.parametrize("text,want", WD_GOLDENS)
def test_worddelim_goldens(text, want):
    assert WordDelimiterGraphAnalyzer().analyze(text) == want


def test_worddelim_batch_equals_per_row():
    texts = [t for t, _ in WD_GOLDENS] + ["XmlHTTPRequest v2Beta3", "++ --"]
    a = WordDelimiterGraphAnalyzer()
    want = {i: a.analyze(t) for i, t in enumerate(texts)}
    for inp in (pd.Series(texts), pa.array(texts, type=pa.string())):
        f = WordDelimiterGraphAnalyzer().analyze_batch(inp)
        got = {i: [] for i in range(len(texts))}
        for r in f.itertuples():
            got[r.row].append((str(r.term), int(r.pos)))
        assert got == want
        # norm length = emitted part count (parts are position-advancing)
        np.testing.assert_array_equal(
            f.attrs["doc_len"], [len(v) for v in want.values()]
        )


def test_worddelim_phrase_across_split():
    """'Merge-Batch' emits consecutive positions → the phrase2 fixture
    query built from it must carry offsets (0, 1)."""
    from lucene_solr_spark.search.query import parse_fixture_query

    spec = parse_fixture_query(
        WordDelimiterGraphAnalyzer(), "phrase2", ["Merge-Batch"]
    )
    (ph,) = spec.must
    assert ph.terms == ("merge", "batch")
    assert ph.offsets == (0, 1)


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.text(alphabet=string.ascii_letters + string.digits + "-_'+./ ",
            max_size=24),
    max_size=6,
))
def test_worddelim_batch_row_parity_property(texts):
    """Random ASCII inputs: the vectorized frame path must agree with the
    per-row reference path token-for-token, position-for-position."""
    a = WordDelimiterGraphAnalyzer()
    f = a.analyze_batch(pd.Series(texts, dtype=object))
    got = {i: [] for i in range(len(texts))}
    for r in f.itertuples():
        got[r.row].append((str(r.term), int(r.pos)))
    for i, t in enumerate(texts):
        assert got[i] == a.analyze(t), (i, t)


MINSTEM_GOLDENS = [
    ("tables", "table"), ("dogs", "dog"), ("pass", "pass"),  # 'ss' protected
    ("bus", "bus"),                                          # 'us' protected
    ("as", "as"),                                            # len < 3
    ("merge", "merge"), ("s", "s"), ("xs", "xs"),
]


@pytest.mark.parametrize("w,want", MINSTEM_GOLDENS)
def test_english_minimal_stem(w, want):
    assert english_minimal_stem(w) == want


def test_keywordrepeat_chain():
    a = KeywordRepeatAnalyzer()
    # original + stem at the SAME position; unchanged tokens emit once
    assert a.analyze("tables pass") == [
        ("tables", 0), ("table", 0), ("pass", 1)
    ]
    f = a.analyze_batch(pd.Series(["tables pass", "dogs", ""]))
    got = sorted((int(r.row), str(r.term), int(r.pos)) for r in f.itertuples())
    assert got == [
        (0, "pass", 1), (0, "table", 0), (0, "tables", 0),
        (1, "dog", 0), (1, "dogs", 0),
    ]
    # discountOverlaps: norms count SOURCE tokens, not the repeats
    np.testing.assert_array_equal(f.attrs["doc_len"], [2, 1, 0])


def test_synonym_query_sums_tf_max_df(spark, tmp_path):
    """SynonymQuery semantics on a tiny index: tf = Σ member tfs,
    idf from MAX member df — checked against a hand-computed BM25 score
    and distinguished from the per-member SHOULD disjunction."""
    import pyarrow.parquet as pq

    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.search.bm25 import idf as bm25_idf
    from lucene_solr_spark.search.query import BooleanSpec, SynonymClause, TermClause
    from lucene_solr_spark.search.searcher import IndexSearcher

    docs = pd.DataFrame({
        "doc_key": np.arange(4, dtype=np.int64),
        "text": [
            "merge join merge",     # tf(merge)=2, tf(join)=1 → syn tf 3
            "merge scan scan",
            "join join join",
            "scan scan scan",
        ],
    })
    src = str(tmp_path / "docs")
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), src + ".parquet")
    sdf = spark.read.parquet(src + ".parquet")
    idx = str(tmp_path / "idx")
    build_index(spark, sdf, idx, key_cols=("doc_key",), text_col="text",
                analyzer="simple", positions=True, n_segments=1)
    searcher = IndexSearcher(spark, idx)

    syn = searcher.search(
        BooleanSpec(should=[SynonymClause(("merge", "join"))]), k=4,
        with_keys=True,
    ).toPandas().sort_values("rank")
    # doc 0 has the highest merged tf (3) → rank 1; df_merged = max(2, 2)
    assert syn.doc_key.tolist()[0] == 0
    # hand-check rank-1's f32 score: idf(df=2, N=4) * tf/(tf + cache(dl=3))
    q = searcher.compile(BooleanSpec(should=[SynonymClause(("merge", "join"))]), 4)
    idf = bm25_idf(2, 4)
    cache = q.cache[searcher_norm(searcher, 0)]
    want = np.float32(idf * np.float32(3.0 / (3.0 + np.float64(cache))))
    got = np.float32(syn.score.iloc[0])
    assert got == pytest.approx(float(want), abs=1e-6)
    # the SHOULD disjunction scores differently (per-member idf) — the
    # synonym path must not silently degrade to it
    dis = searcher.search(
        BooleanSpec(should=[TermClause("merge"), TermClause("join")]), k=4,
        with_keys=True,
    ).toPandas().sort_values("rank")
    assert not np.allclose(
        syn.score.to_numpy(), dis.score.to_numpy()
    )


def searcher_norm(searcher, doc_key):
    """norm byte of one doc via the docs table (test helper)."""
    import pyspark.sql.functions as F

    row = (
        searcher.spark.read.parquet(searcher.index_dir + "/docs")
        .filter(F.col("doc_key") == doc_key)
        .select("norm")
        .collect()
    )
    return int(row[0][0])
