"""ASCIIFolding + EnglishPossessive filters (``LA/miscellaneous/
ASCIIFoldingFilter.java``, ``LA/en/EnglishPossessiveFilter.java``).

The driver entries (ft_asciifold_topk / ft_possessive_topk) certify the
query-side chain against DuckDB on the ASCII corpus (where the corpus side
is identity); these tests certify the NONTRIVIAL corpus-side behavior —
accented/ligature/possessive documents — including the pre-fold's token
re-joining ("café" folds to ascii "cafe"; unfolded engines keep "café") and
batch == per-row == Arrow-input equality across dispatch paths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lucene_solr_spark.analysis import ASCIIFoldingAnalyzer, EnglishPossessiveAnalyzer

FOLD_GOLDENS = [
    ("Café Zürich naïve", [("cafe", 0), ("zurich", 1), ("naive", 2)]),
    # ligatures beyond strip_accents: expansion keeps a single token
    ("Æsir œuvre straße Ĳs", [("aesir", 0), ("oeuvre", 1), ("strasse", 2), ("ijs", 3)]),
    ("ASCII only merge batch", [("ascii", 0), ("only", 1), ("merge", 2), ("batch", 3)]),
    # fold-before-tokenize: the accented word folds to pure ASCII, so
    # searching "resume" matches (unfolded engines index "résumé" verbatim)
    ("résumé étude", [("resume", 0), ("etude", 1)]),
    ("", []),
]

POSSESSIVE_GOLDENS = [
    ("The dog's bone", [("the", 0), ("dog", 1), ("bone", 2)]),
    # curly apostrophe variant + bare apostrophe (not possessive) kept
    ("batch’s o'clock", [("batch", 0), ("o'clock", 1)]),
    # 'S matched case-insensitively (lowercase runs first, same result)
    ("JAMES'S BOOK", [("james", 0), ("book", 1)]),
    ("x's", [("x", 0)]),
]


@pytest.mark.parametrize("text,want", FOLD_GOLDENS)
def test_fold_goldens(text, want):
    assert ASCIIFoldingAnalyzer().analyze(text) == want


@pytest.mark.parametrize("text,want", POSSESSIVE_GOLDENS)
def test_possessive_goldens(text, want):
    assert EnglishPossessiveAnalyzer().analyze(text) == want


@pytest.mark.parametrize("cls,goldens", [
    (ASCIIFoldingAnalyzer, FOLD_GOLDENS),
    (EnglishPossessiveAnalyzer, POSSESSIVE_GOLDENS),
])
def test_batch_equals_per_row_all_paths(cls, goldens):
    """Mixed batch (ASCII rows + accented/possessive rows) must match the
    per-row reference on every dispatch path: pandas in, Arrow in, and the
    pure-ASCII fast path."""
    texts = [t for t, _ in goldens] + ["plain merge batch", "a b c"]
    a = cls()
    want_rows, want_terms, want_pos, want_len = [], [], [], []
    for i, t in enumerate(texts):
        toks = a.analyze(t)
        want_len.append(len(toks))
        for term, p in toks:
            want_rows.append(i), want_terms.append(term), want_pos.append(p)

    for inp in (pd.Series(texts), pa.array(texts, type=pa.string())):
        f = cls().analyze_batch(inp)
        assert f["row"].tolist() == want_rows
        assert f["term"].astype(str).tolist() == want_terms
        assert f["pos"].tolist() == want_pos
        assert list(f.attrs["doc_len"]) == want_len

    # pure-ASCII batch: the zero-copy short-circuit must agree too
    ascii_texts = ["plain merge batch", "dog's bone", "a"]
    fa = cls().analyze_batch(pa.array(ascii_texts, type=pa.string()))
    fp = cls().analyze_batch(pd.Series(ascii_texts))
    assert fa["term"].astype(str).tolist() == fp["term"].astype(str).tolist()
    assert fa["pos"].tolist() == fp["pos"].tolist()


def _mini_corpus(texts):
    return pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(len(texts))],
        "turn_idx": np.zeros(len(texts), dtype="int32"),
        "role": ["user"] * len(texts),
        "text": texts,
        "tool": [""] * len(texts),
        "ts": pd.Timestamp("2026-01-01"),
    })


def test_asciifold_index_e2e(spark, tmp_path_factory):
    """Accented corpus + accented query both normalize to the same terms:
    searching "cafe" hits "café" documents and vice versa, with tf counted
    over the folded tokens."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    texts = [
        "café menu",                 # c0: accented
        "cafe menu cafe",            # c1: plain, tf=2
        "zürich office",             # c2
        "unrelated row data",        # c3
    ]
    idx = str(tmp_path_factory.mktemp("foldidx") / "idx")
    build_index(
        spark, spark.createDataFrame(_mini_corpus(texts)), idx,
        n_segments=2, analyzer="asciifold",
    )
    s = IndexSearcher(spark, idx)
    for surface in ("cafe", "Café"):
        hits = s.search(s.parse("term", [surface], 0), k=10, with_keys=True).toPandas()
        assert hits.conv_id.tolist() == ["c1", "c0"]  # tf=2 doc ranks first
    hits = s.search(s.parse("term", ["Zurich"], 0), k=10, with_keys=True).toPandas()
    assert hits.conv_id.tolist() == ["c2"]


def test_possessive_index_e2e(spark, tmp_path_factory):
    """"dog's" and "dog" merge into one posting list at index AND query time."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    texts = [
        "the dog's bone",            # c0
        "dog runs dog’s yard",       # c1: tf=2 after stripping
        "cat toy",                   # c2
    ]
    idx = str(tmp_path_factory.mktemp("possidx") / "idx")
    build_index(
        spark, spark.createDataFrame(_mini_corpus(texts)), idx,
        n_segments=2, analyzer="possessive",
    )
    s = IndexSearcher(spark, idx)
    for surface in ("dog", "dog's"):
        hits = s.search(s.parse("term", [surface], 0), k=10, with_keys=True).toPandas()
        assert set(hits.conv_id) == {"c0", "c1"}
        assert hits.conv_id.iloc[0] == "c1"  # tf=2 ranks first


def test_html_strip_goldens_and_parity(spark, tmp_path):
    """HTMLStripCharFilter subset (LA/charfilter/HTMLStripCharFilter.java):
    tags dropped, script/style dropped WITH content, common entities
    decoded (&amp; last); char filter runs before the tokenizer so both
    paths agree; index e2e finds text that only exists outside markup."""
    import pandas as pd

    from lucene_solr_spark.analysis.analyzer import HTMLStripAnalyzer
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    an = HTMLStripAnalyzer()
    assert an.analyze(
        "<p>Hello <b>world</b> &amp; merge</p><script>var x=1;</script> ok"
    ) == [("hello", 0), ("world", 1), ("merge", 2), ("ok", 3)]
    # style content dropped; entities decode; &amp;lt; does NOT double-decode
    assert an.analyze("<style>.x{}</style>keep &lt;b&gt; &amp;lt;") == [
        ("keep", 0), ("b", 1), ("lt", 2),
    ]
    texts = pd.Series([
        "<div class='x'>alpha</div> beta", "no markup here",
        "<script>drop me</script>gamma &nbsp; delta", "",
    ])
    frame = an.analyze_batch(texts)
    for i, t in texts.items():
        sub = frame[frame.row == i]
        assert list(zip(sub.term, sub.pos)) == an.analyze(t), i

    # e2e: 'alpha' indexed, tag token 'div' and script content are NOT
    pdf = pd.DataFrame({
        "doc_key": [0, 1],
        "text": ["<div>alpha beta</div><script>hidden</script>", "alpha plain"],
    })
    idx = str(tmp_path / "hidx")
    build_index(spark, spark.createDataFrame(pdf), idx, key_cols=("doc_key",),
                analyzer="htmlstrip", n_segments=1)
    s = IndexSearcher(spark, idx)
    assert s.search(s.parse("term", ["alpha"]), k=10).count() == 2
    assert s.search(s.parse("term", ["div"]), k=10).count() == 0
    assert s.search(s.parse("term", ["hidden"]), k=10).count() == 0
