"""PatternReplaceFilter + UAX29URLEmailTokenizer (subset) analyzer goldens.

Reference semantics:
- ``LA/pattern/PatternReplaceFilter.java`` (Solr PatternReplaceFilterFactory,
  pattern='[0-9]+', replacement=''): rewrites term text in place; NOT a
  FilteringTokenFilter — empty results are still emitted, positions and norm
  lengths unchanged.
- ``LA/standard/UAX29URLEmailTokenizer.java``: http(s) URLs and emails are
  single <URL>/<EMAIL> tokens (common subset modeled; charset documented in
  analysis/analyzer.py).
"""

import pandas as pd
import pytest

from lucene_solr_spark.analysis.analyzer import (
    PatternReplaceAnalyzer,
    URLEmailAnalyzer,
)


def _frame_tuples(frame):
    return list(zip(frame["row"].tolist(),
                    [str(t) for t in frame["term"]],
                    frame["pos"].tolist()))


class TestPatternReplace:
    def test_digit_runs_stripped(self):
        a = PatternReplaceAnalyzer()
        assert a.analyze("Merge42 batch7 x1y2z") == [
            ("merge", 0), ("batch", 1), ("xyz", 2)
        ]

    def test_all_digit_token_emits_empty_term(self):
        # NOT a filtering filter: '2024' stays as the empty term at pos 1,
        # no position hole, norm length still 3
        a = PatternReplaceAnalyzer()
        assert a.analyze("merge 2024 batch") == [
            ("merge", 0), ("", 1), ("batch", 2)
        ]

    def test_batch_matches_per_row(self):
        a = PatternReplaceAnalyzer()
        texts = ["Merge42 2024 batch7", "plain words only", "", "9 x9 99"]
        frame = a.analyze_batch(pd.Series(texts))
        expect = []
        for i, t in enumerate(texts):
            expect.extend((i, term, pos) for term, pos in a.analyze(t))
        assert _frame_tuples(frame) == expect
        assert list(frame.attrs["doc_len"]) == [3, 3, 0, 3]


class TestURLEmail:
    def test_url_is_one_token(self):
        a = URLEmailAnalyzer()
        out = a.analyze("see https://docs.example.org/Merge-guide?v=2 now")
        assert out == [
            ("see", 0),
            ("https://docs.example.org/merge-guide?v=2", 1),
            ("now", 2),
        ]

    def test_email_is_one_token(self):
        a = URLEmailAnalyzer()
        assert a.analyze("mail Dev-Team@Spark.TEST today") == [
            ("mail", 0), ("dev-team@spark.test", 1), ("today", 2)
        ]

    def test_plain_text_matches_standard_rule(self):
        # no URL/email present → identical to the standard tokenizer
        from lucene_solr_spark.analysis.analyzer import SimpleAnalyzer

        text = "merge batch o'brien stream_2 part"
        assert URLEmailAnalyzer().analyze(text) == SimpleAnalyzer().analyze(text)

    def test_batch_matches_per_row(self):
        a = URLEmailAnalyzer()
        texts = [
            "see https://docs.example.org/merge-guide",
            "mail dev-team@spark.test or admin@x.y.example.net",
            "no urls here at all",
            "",
            "HTTP://UP.example.COM/A mixed Case",
        ]
        frame = a.analyze_batch(pd.Series(texts))
        expect = []
        for i, t in enumerate(texts):
            expect.extend((i, term, pos) for term, pos in a.analyze(t))
        assert _frame_tuples(frame) == expect

    def test_scheme_without_url_falls_back_to_words(self):
        # 'https' alone (no ://) is a plain word token
        a = URLEmailAnalyzer()
        assert a.analyze("https is not a url") == [
            ("https", 0), ("is", 1), ("not", 2), ("a", 3), ("url", 4)
        ]


class TestPropertyParity:
    """Hypothesis: batch path ≡ per-row reference path on arbitrary ASCII
    mixes of words, digit runs, URLs and emails — the guarantee behind the
    shared-alternation design (re, Arrow RE2 and DuckDB RE2 agree)."""

    def test_urlemail_batch_per_row_property(self):
        from hypothesis import given, settings, strategies as st

        word = st.text("abcdefXYZ019_", min_size=1, max_size=8)
        url = st.builds(
            lambda h, p: f"https://{h}.example.org/{p}",
            st.text("abcz09", min_size=1, max_size=6),
            st.text("abcz09/?=%", min_size=0, max_size=8),
        )
        email = st.builds(
            lambda u, d: f"{u}@{d}.test",
            st.text("abcz09_", min_size=1, max_size=6),
            st.text("abcz09", min_size=1, max_size=6),
        )
        doc = st.lists(st.one_of(word, url, email), max_size=10).map(" ".join)

        @settings(max_examples=60, deadline=None)
        @given(st.lists(doc, min_size=1, max_size=6))
        def check(texts):
            import pandas as pd
            from lucene_solr_spark.analysis.analyzer import URLEmailAnalyzer

            a = URLEmailAnalyzer()
            frame = a.analyze_batch(pd.Series(texts))
            got = list(zip(frame["row"].tolist(),
                           [str(t) for t in frame["term"]],
                           frame["pos"].tolist()))
            want = []
            for i, t in enumerate(texts):
                want.extend((i, term, pos) for term, pos in a.analyze(t))
            assert got == want

        check()

    def test_patreplace_batch_per_row_property(self):
        from hypothesis import given, settings, strategies as st

        doc = st.lists(
            st.text("abcXY0123456789", min_size=1, max_size=8),
            max_size=12,
        ).map(" ".join)

        @settings(max_examples=60, deadline=None)
        @given(st.lists(doc, min_size=1, max_size=6))
        def check(texts):
            import pandas as pd
            from lucene_solr_spark.analysis.analyzer import PatternReplaceAnalyzer

            a = PatternReplaceAnalyzer()
            frame = a.analyze_batch(pd.Series(texts))
            got = list(zip(frame["row"].tolist(),
                           [str(t) for t in frame["term"]],
                           frame["pos"].tolist()))
            want = []
            for i, t in enumerate(texts):
                want.extend((i, term, pos) for term, pos in a.analyze(t))
            assert got == want

        check()
