"""DuckDB ANSI-SQL oracles for the driver's correctness gate.

Each builder returns a self-contained SQL string over the pre-registered
``documents`` view that recomputes the engine's result *independently* —
tokenization via the same regex, SmallFloat norm quantization via an embedded
256-row decode table, and Lucene-8 BM25 with the engine's exact float32
op-order (verified bitwise against numpy: DuckDB FLOAT arithmetic rounds per
op to float32, ``ln`` matches libm, FLOAT literals parse like np.float32).

Scope note: DuckDB in-sandbox has no Porter stemmer, so SQL oracles cover the
``simple`` (lower) and ``stop`` (lower+stop, position holes) chains; the full
Porter chain is validated by pytest goldens + the pure-pandas brute-force
oracle (tests/test_rank_identity.py) instead.

Reference semantics being checked: ``L/search/similarities/BM25Similarity``
(idf/score/computeNorm), ``L/util/SmallFloat#intToByte4``,
``L/search/BooleanQuery`` occur semantics, ``L/search/PhraseQuery`` with
stop-hole position gaps, ``L/search/HitQueue`` (score desc, docID asc).
"""

from __future__ import annotations

import re

from .analysis.analyzer import ENGLISH_STOP_WORDS
from .search.query import (
    BooleanSpec, MultiPhraseClause, OrGroupClause, PhraseClause,
)
from .util.smallfloat import LENGTH_TABLE

# Same token rule as analysis.analyzer._TOKEN_RE, RE2 syntax, SQL-quoted.
TOKEN_RE_SQL = "[0-9A-Za-z_](?:[''’]?[0-9A-Za-z_]){0,254}"

# Unicode fixture token rule (analyzer "uni"): agrees with the engine's full
# UAX#29 word break (analysis/uax29.py) ON THE FIXTURE VOCABULARY — Han
# ideographs as singles, Katakana/Latin/Greek/Cyrillic letter runs, decimal
# numbers with MidNum/MidNumLet separators joined. General UAX#29 (mid-dot
# letter joins, Hebrew quotes, Extend transparency) is NOT expressible in
# one RE2 pattern; those rules are pinned by tests/test_uax29.py goldens
# instead, the documented fixture-oracle split.
UNI_TOKEN_SQL = (
    r"[0-9]+(?:[.,][0-9]+)*"
    r"|\p{Han}"
    r"|[\p{Latin}\p{Greek}\p{Cyrillic}\p{Katakana}]+"
)

_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

_SF_ROWS = ", ".join(f"({b}, {int(LENGTH_TABLE[b])})" for b in range(256))

_MAX_DL = 1 << 62


def _kept_ctes(analyzer: str) -> tuple[str, str]:
    """(kept-CTE SQL, primary-token source name) for one analyzer chain.

    ``kept`` is the full emitted token stream (what postings index);
    ``primary`` is the stream whose count is the norm length
    (discountOverlaps: shingles/edge-grams emitted at a source token's
    position don't lengthen the doc)."""
    if analyzer in ("simple", "uni"):
        return "kept AS (SELECT * FROM raw_toks)", "kept"
    if analyzer == "stop":
        return (
            f"kept AS (SELECT * FROM raw_toks WHERE term NOT IN ({_STOP_LIST_SQL}))",
            "kept",
        )
    if analyzer == "limitcount":
        # LimitTokenCountFilter(40): only the first N tokens index; with no
        # upstream filtering, ordinal == pos, so the cut is pos < N; norms
        # count the kept tokens (min(len, N))
        from .analysis.analyzer import LIMIT_TOKEN_COUNT

        return (
            f"kept AS (SELECT * FROM raw_toks WHERE pos < {LIMIT_TOKEN_COUNT})",
            "kept",
        )
    if analyzer == "synonym":
        from .analysis.analyzer import SYNONYMS

        whens = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in sorted(SYNONYMS.items()))
        return (
            "kept AS (SELECT doc_id, "
            f"CASE term {whens} ELSE term END AS term, pos FROM raw_toks)",
            "kept",
        )
    if analyzer == "shingle":
        return (
            """kept AS (
    SELECT * FROM raw_toks
    UNION ALL
    SELECT a.doc_id, a.term || ' ' || b.term AS term, a.pos
    FROM raw_toks a JOIN raw_toks b
      ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
)""",
            "raw_toks",
        )
    if analyzer == "edgegram":
        from .analysis.analyzer import EDGE_MAX, EDGE_MIN

        return (
            f"""kept AS (
    SELECT doc_id, substr(term, 1, g) AS term, pos
    FROM raw_toks, (SELECT unnest(generate_series({EDGE_MIN}, {EDGE_MAX})) AS g)
    WHERE g <= length(term)
    UNION ALL
    SELECT doc_id, term, pos FROM raw_toks WHERE length(term) < {EDGE_MIN}
)""",
            "raw_toks",
        )
    if analyzer == "ngram":
        # NGramTokenFilter(2, 4): ALL substrings of each token at the
        # token's position; sub-min tokens pass through (edge-chain
        # convention); norms count source tokens (discountOverlaps)
        from .analysis.analyzer import EDGE_MAX, EDGE_MIN

        return (
            f"""kept AS (
    SELECT doc_id,
           unnest(CASE WHEN length(term) < {EDGE_MIN} THEN [term]
                  ELSE flatten(list_transform(
                       generate_series({EDGE_MIN}, {EDGE_MAX}),
                       g -> list_transform(
                            generate_series(1, length(term) - g + 1),
                            s -> substr(term, CAST(s AS INT), CAST(g AS INT)))))
                  END) AS term,
           pos
    FROM raw_toks
)""",
            "raw_toks",
        )
    if analyzer == "ngramstrict":
        # NGramTokenFilter(2, 4) at the upstream DEFAULT preserveOriginal=
        # false: sub-min tokens emit nothing (position hole) and don't
        # count toward the norm length — primary is the filtered source
        from .analysis.analyzer import EDGE_MAX, EDGE_MIN

        return (
            f"""ngram_src AS (
    SELECT * FROM raw_toks WHERE length(term) >= {EDGE_MIN}
),
kept AS (
    SELECT doc_id,
           unnest(flatten(list_transform(
               generate_series({EDGE_MIN}, {EDGE_MAX}),
               g -> list_transform(
                    generate_series(1, length(term) - g + 1),
                    s -> substr(term, CAST(s AS INT), CAST(g AS INT)))))) AS term,
           pos
    FROM ngram_src
)""",
            "ngram_src",
        )
    if analyzer == "whitespace":
        return "kept AS (SELECT * FROM raw_toks)", "kept"
    if analyzer == "commongrams":
        # unigrams (stopwords kept) + '_'-joined bigrams where either member
        # is a common word, at the first token's position; norms count the
        # unigram stream only (discountOverlaps)
        return (
            f"""kept AS (
    SELECT * FROM raw_toks
    UNION ALL
    SELECT a.doc_id, a.term || '_' || b.term AS term, a.pos
    FROM raw_toks a JOIN raw_toks b
      ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.term IN ({_STOP_LIST_SQL}) OR b.term IN ({_STOP_LIST_SQL})
)""",
            "raw_toks",
        )
    if analyzer == "length":
        from .analysis.analyzer import LENGTH_MAX, LENGTH_MIN

        return (
            f"kept AS (SELECT * FROM raw_toks "
            f"WHERE length(term) BETWEEN {LENGTH_MIN} AND {LENGTH_MAX})",
            "kept",
        )
    if analyzer == "asciifold":
        # strip_accents ≡ the filter for accented Latin; ligature folds
        # (Æ/ß/Œ…) exceed it and are pytest-golden-certified instead.
        return (
            "kept AS (SELECT doc_id, strip_accents(term) AS term, pos FROM raw_toks)",
            "kept",
        )
    if analyzer == "possessive":
        return (
            "kept AS (SELECT doc_id, "
            "regexp_replace(term, '[''’]s$', '') AS term, pos FROM raw_toks)",
            "kept",
        )
    if analyzer == "worddelim":
        # WordDelimiterGraph(subset): '-' separators injected at case-change
        # / letter-digit boundaries (any non-alnum is already a delimiter,
        # so the separator char cannot create a false part), then
        # alphanumeric runs are the lowered parts; each part advances the
        # position by 1, an all-delimiter token leaves a 1-position hole
        # (greatest(1, n_parts) increments), positions re-based per doc.
        bounded = (
            "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
            "term, '([a-z])([A-Z])', '\\1-\\2', 'g'),"
            " '([A-Z])([A-Z][a-z])', '\\1-\\2', 'g'),"
            " '([A-Za-z])([0-9])', '\\1-\\2', 'g'),"
            " '([0-9])([A-Za-z])', '\\1-\\2', 'g')"
        )
        return (
            f"""wd_parts AS (
    SELECT doc_id, pos AS opos,
           list_transform(regexp_extract_all({bounded}, '[A-Za-z0-9]+'),
                          x -> lower(x)) AS parts
    FROM raw_toks
),
wd_base AS (
    SELECT doc_id, opos, parts,
           coalesce(sum(greatest(1, len(parts))) OVER (
               PARTITION BY doc_id ORDER BY opos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
    FROM wd_parts
),
kept AS (
    SELECT doc_id, unnest(parts) AS term,
           start + generate_subscripts(parts, 1) - 1 AS pos
    FROM wd_base
)""",
            "kept",
        )
    if analyzer == "patreplace":
        # PatternReplaceFilter(pattern='[0-9]+', replacement=''): term text
        # rewritten in place — NOT a filtering filter, so an all-digit token
        # stays as the empty term; positions and norm lengths unchanged
        from .analysis.analyzer import PATTERN_REPLACE_SQL

        return (
            "kept AS (SELECT doc_id, "
            f"regexp_replace(term, '{PATTERN_REPLACE_SQL}', '', 'g') AS term, "
            "pos FROM raw_toks)",
            "kept",
        )
    if analyzer == "urlemail":
        return "kept AS (SELECT * FROM raw_toks)", "kept"
    if analyzer == "minhashsig":
        # MinHashFilter chain (LA/minhash): 5-shingle → 60-bit md5 hash →
        # min per (h % B) bucket → rotation fill (nearest filled bucket
        # scanning upward mod B) → B signature tokens per doc with ≥1
        # shingle, norm length B (analysis/analyzer.MinHashAnalyzer)
        from .analysis.analyzer import MINHASH_BUCKETS as _B

        return (
            f"""sh5 AS (
    SELECT a.doc_id,
           a.term || ' ' || b.term || ' ' || c.term || ' ' || d.term
                  || ' ' || e.term AS shingle
    FROM raw_toks a
    JOIN raw_toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN raw_toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    JOIN raw_toks d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
    JOIN raw_toks e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
),
mh_h AS (
    SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh5
),
mh_filled AS (
    SELECT doc_id, h % {_B} AS bucket, min(h) AS minh
    FROM mh_h GROUP BY 1, 2
),
mh_grid AS (
    SELECT g.doc_id, gs.b
    FROM (SELECT DISTINCT doc_id FROM mh_filled) g
    CROSS JOIN (SELECT unnest(range({_B})) AS b) gs
),
kept AS (
    SELECT doc_id,
           'mh:' || b || ':' || (
               SELECT f.minh FROM mh_filled f
               WHERE f.doc_id = mh_grid.doc_id
               ORDER BY (f.bucket - mh_grid.b + {_B}) % {_B} ASC LIMIT 1
           ) AS term,
           b AS pos
    FROM mh_grid
)""",
            "kept",
        )
    if analyzer == "keywordrepeat":
        # KeywordRepeat → EnglishMinimalStem → RemoveDuplicates: original +
        # minimal-stemmed form at the SAME position; UNION collapses exact
        # (doc, term, pos) duplicates (RemoveDuplicatesTokenFilter);
        # norms count source tokens only (discountOverlaps)
        return (
            """kept AS (
    SELECT doc_id, term, pos FROM raw_toks
    UNION
    SELECT doc_id,
           CASE WHEN length(term) >= 3 AND term LIKE '%s'
                     AND substr(term, length(term) - 1, 1) NOT IN ('s', 'u')
                THEN substr(term, 1, length(term) - 1) ELSE term END AS term,
           pos
    FROM raw_toks
)""",
            "raw_toks",
        )
    raise ValueError(f"no SQL oracle for analyzer {analyzer!r} (porter not in DuckDB)")


def base_ctes(analyzer: str, k1: float = 1.2, b: float = 0.75) -> str:
    """Shared WITH-clause body: tokens, per-doc lengths, norms, stats, cache.

    Positions are assigned BEFORE the stop filter (0-based), preserving stop
    holes exactly like FilteringTokenFilter's position increments.

    ``k1``/``b`` parameterize the BM25 norm cache (BM25Similarity(k1, b) —
    Solr schema similarity config); the embedded literals are the exact
    float32 values the engine's ``norm_cache`` arithmetic produces, so
    non-default tunings stay bitwise."""
    import numpy as np

    k1_f = float(np.float32(k1))
    b_f = float(np.float32(b))
    one_minus_b_f = float(np.float32(1.0) - np.float32(b))
    kept_sql, primary = _kept_ctes(analyzer)
    # tokenizer swap: WhitespaceAnalyzer keeps case + punctuation (maximal
    # non-whitespace runs, 255-split); everything else is StandardTokenizer
    # semantics (word-char runs, lowered)
    if analyzer in ("whitespace", "worddelim"):
        # worddelim feeds the whitespace tokenizer too (case preserved —
        # it is meaningful to the splitter; parts lower inside the chain)
        tok_pattern, term_expr = r"[^ \t\n\r\f\v]{1,255}", "unnest(toks)"
    elif analyzer == "urlemail":
        # UAX29URLEmailTokenizer subset: the IDENTICAL URL|EMAIL|WORD
        # alternation the engine compiles (analysis.analyzer), leftmost-
        # first in both RE2s — URLs/emails stay single tokens
        from .analysis.analyzer import URLEMAIL_SQL_PREFIX

        tok_pattern = f"{URLEMAIL_SQL_PREFIX}|{TOKEN_RE_SQL}"
        term_expr = "lower(unnest(toks))"
    elif analyzer == "uni":
        # full-UAX#29 corpus (non-ASCII fixture): script-class token rule
        tok_pattern, term_expr = UNI_TOKEN_SQL, "lower(unnest(toks))"
    else:
        tok_pattern, term_expr = TOKEN_RE_SQL, "lower(unnest(toks))"
    return f"""
tl AS (
    SELECT doc_id, regexp_extract_all(text, '{tok_pattern}') AS toks FROM documents
),
raw_toks AS (
    SELECT doc_id, {term_expr} AS term,
           generate_subscripts(toks, 1) - 1 AS pos
    FROM tl
),
{kept_sql},
doclen AS (
    SELECT d.doc_id, count(k.term)::BIGINT AS length
    FROM documents d LEFT JOIN {primary} k USING (doc_id)
    GROUP BY d.doc_id
),
stats AS (
    SELECT count(*) FILTER (WHERE length > 0)::BIGINT AS doc_count,
           sum(length)::BIGINT AS sum_ttf
    FROM doclen
),
statsf AS (
    SELECT doc_count, sum_ttf,
           CAST(sum_ttf::DOUBLE / doc_count AS FLOAT) AS avgdl
    FROM stats
),
sf(b, dl) AS (VALUES {_SF_ROWS}),
sfr AS (
    SELECT b, dl::BIGINT AS dl,
           lead(dl::BIGINT, 1, {_MAX_DL}::BIGINT) OVER (ORDER BY b) AS next_dl
    FROM sf
),
norms AS (
    SELECT d.doc_id, d.length, s.b AS norm, s.dl AS decoded
    FROM doclen d JOIN sfr s ON d.length >= s.dl AND d.length < s.next_dl
),
cachec AS (
    -- float32 op order of bm25.norm_cache: k1f*((1f-bf) + (bf*dl)/avgdl).
    -- Literals route through DOUBLE first: DuckDB types long decimal
    -- literals as DECIMAL, whose FLOAT cast rounds differently by 1 ulp.
    SELECT n.doc_id, n.norm,
           CAST(CAST({k1_f!r} AS DOUBLE) AS FLOAT)
               * (CAST(CAST({one_minus_b_f!r} AS DOUBLE) AS FLOAT)
               + (CAST(CAST({b_f!r} AS DOUBLE) AS FLOAT) * CAST(n.decoded AS FLOAT)) / st.avgdl) AS cache
    FROM norms n, statsf st
)"""


def docs_norms_sql(analyzer: str) -> str:
    return f"""WITH {base_ctes(analyzer)}
SELECT n.doc_id::BIGINT AS doc_id, n.length::BIGINT AS length, n.norm::INTEGER AS norm
FROM norms n ORDER BY doc_id"""


def field_summary_sql(analyzer: str) -> str:
    """Luke per-field summary: the text field's stats recomputed from the
    analyzed token stream; each keyword field's from its stored column
    (one `\\x01col:value` term per doc, tf=1 ⇒ df=ttf=value count)."""
    return f"""WITH {base_ctes(analyzer)},
txt AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
    FROM kept GROUP BY 1
),
allf AS (
    SELECT 'text' AS field, term, df, ttf FROM txt
    UNION ALL
    SELECT 'source', source, count(*)::BIGINT, count(*)::BIGINT
    FROM documents GROUP BY 2
    UNION ALL
    SELECT 'lang', lang, count(*)::BIGINT, count(*)::BIGINT
    FROM documents GROUP BY 2
),
top AS (
    SELECT field, term AS top_term, df AS top_df
    FROM (SELECT *, row_number() OVER (
              PARTITION BY field ORDER BY df DESC, term ASC) AS rk
          FROM allf)
    WHERE rk = 1
)
SELECT field, count(*)::BIGINT AS num_terms, sum(df)::BIGINT AS sum_df,
       sum(ttf)::BIGINT AS sum_ttf, any_value(top_term) AS top_term,
       any_value(top_df)::BIGINT AS top_df
FROM allf JOIN top USING (field)
GROUP BY field ORDER BY field"""


def term_stats_sql(analyzer: str, min_df: int = 1) -> str:
    return f"""WITH {base_ctes(analyzer)}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
FROM kept GROUP BY term HAVING count(DISTINCT doc_id) >= {min_df}"""


def collection_stats_sql(analyzer: str) -> str:
    return f"""WITH {base_ctes(analyzer)}
SELECT doc_count, sum_ttf, avgdl FROM statsf"""


def _idf_expr(term: str) -> str:
    """float32 idf — BM25Similarity#idf exact double op order, one f32 cast."""
    return (
        "CAST(ln(1.0 + (st.doc_count - "
        f"(SELECT count(DISTINCT doc_id) FROM kept WHERE term = '{term}')"
        " + 0.5) / ("
        f"(SELECT count(DISTINCT doc_id) FROM kept WHERE term = '{term}')"
        " + 0.5)) AS FLOAT)"
    )


def _disjunction_core(pred: str) -> str:
    """Shared CTEs: BM25 f32 score per (doc, matching term) for every term
    matching ``pred`` (a SQL predicate over ``term``) — the SCORING_BOOLEAN
    rewrite of a MultiTermQuery, one should-clause per matching term."""
    return f"""
qt AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept WHERE {pred} GROUP BY term
),
widf AS (
    SELECT term, CAST(ln(1.0 + (st.doc_count - df + 0.5) / (df + 0.5)) AS FLOAT) AS idf
    FROM qt, statsf st
),
tfq AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM kept WHERE {pred} GROUP BY 1, 2
),
sc AS (
    SELECT t.doc_id,
           CAST(w.idf * CAST(t.tf::DOUBLE / (t.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT) AS FLOAT) AS s
    FROM tfq t JOIN widf w USING (term) JOIN cachec c USING (doc_id)
)"""


def multiterm_topk_sql(analyzer: str, pred: str, k: int) -> str:
    """Prefix/wildcard/regexp/fuzzy/set top-k (MultiTermQuery rewrite)."""
    return f"""WITH {base_ctes(analyzer)},{_disjunction_core(pred)},
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score FROM sc GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def phonetic_topk_sql(analyzer: str, tokens: tuple[str, ...], k: int) -> str:
    """Soundex-expansion oracle: the SAME 5-step Soundex pipeline
    (analysis/phonetic.soundex_sql_expr) computes codes for BOTH the query
    tokens (inlined VALUES) and the distinct indexed terms — the expansion
    is derived entirely in SQL, then scored as the standard BM25
    disjunction."""
    from .analysis.phonetic import soundex_sql_expr

    vals = ", ".join(f"('{t}')" for t in tokens)
    pred = (
        f"term IN (SELECT d.term FROM (SELECT DISTINCT term FROM kept) d "
        f"JOIN (SELECT DISTINCT {soundex_sql_expr('tok')} AS code "
        f"FROM (VALUES {vals}) q(tok)) qc "
        f"ON {soundex_sql_expr('d.term')} = qc.code)"
    )
    return f"""WITH {base_ctes(analyzer)},{_disjunction_core(pred)},
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score FROM sc GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def dismax_topk_sql(analyzer: str, terms: list[str], tie: float, k: int) -> str:
    """DisjunctionMax: score = max + tie·(Σ − max), double ops, one f32 cast
    (``DisjunctionMaxScorer#score``)."""
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    return f"""WITH {base_ctes(analyzer)},{_disjunction_core(pred)},
hits AS (
    SELECT doc_id,
           CAST(max(CAST(s AS DOUBLE))
                + {tie!r} * (sum(CAST(s AS DOUBLE)) - max(CAST(s AS DOUBLE))) AS FLOAT) AS score
    FROM sc GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def mlt_topk_sql(analyzer: str, src_doc_id: int, top_terms: int, k: int) -> str:
    """MoreLikeThis: top tf·idf terms of the source doc (idf = ln(N/(df+1))+1,
    classic MLT), then the BM25 disjunction excluding the source doc."""
    return f"""WITH {base_ctes(analyzer)},
src_tf AS (
    SELECT term, count(*)::BIGINT AS tf FROM kept WHERE doc_id = {src_doc_id} GROUP BY term
),
src_df AS (
    SELECT k.term, count(DISTINCT k.doc_id)::BIGINT AS df
    FROM kept k JOIN src_tf USING (term) GROUP BY 1
),
mlt AS (
    SELECT s.term,
           s.tf::DOUBLE * (ln(st.doc_count::DOUBLE / (d.df + 1.0)) + 1.0) AS mlt_score
    FROM src_tf s JOIN src_df d USING (term), statsf st
),
top_terms AS (
    SELECT term FROM mlt ORDER BY mlt_score DESC, term ASC LIMIT {top_terms}
),{_disjunction_core("term IN (SELECT term FROM top_terms)")},
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score
    FROM sc WHERE doc_id != {src_doc_id} GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def mlt_text_topk_sql(analyzer: str, text: str, top_terms: int, k: int) -> str:
    """MoreLikeThis over a posted free-text body: tf from the literal
    text's analyzed tokens, df/idf from the corpus, no source exclusion."""
    esc = text.replace("'", "''")
    return f"""WITH {base_ctes(analyzer)},
src_tf AS (
    SELECT term, count(*)::BIGINT AS tf FROM (
        SELECT unnest(regexp_extract_all(lower('{esc}'), '{TOKEN_RE_SQL}')) AS term
    ) GROUP BY term
),
src_df AS (
    SELECT k.term, count(DISTINCT k.doc_id)::BIGINT AS df
    FROM kept k JOIN src_tf USING (term) GROUP BY 1
),
mlt AS (
    SELECT s.term,
           s.tf::DOUBLE * (ln(st.doc_count::DOUBLE / (d.df + 1.0)) + 1.0) AS mlt_score
    FROM src_tf s JOIN src_df d USING (term), statsf st
),
top_terms AS (
    SELECT term FROM mlt ORDER BY mlt_score DESC, term ASC LIMIT {top_terms}
),{_disjunction_core("term IN (SELECT term FROM top_terms)")},
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score
    FROM sc GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def blockjoin_sql(analyzer: str, terms: list[str], n_groups: int) -> str:
    """ToParentBlockJoin(ScoreMode.Max) by the ``source`` parent key."""
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    return f"""WITH {base_ctes(analyzer)},{_disjunction_core(pred)},
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score FROM sc GROUP BY doc_id
)
SELECT d.source, max(h.score)::FLOAT AS parent_score, count(*)::BIGINT AS n_children
FROM hits h JOIN documents d USING (doc_id)
GROUP BY d.source
ORDER BY parent_score DESC, source ASC LIMIT {n_groups}"""


def blockjoin_children_sql(
    analyzer: str, terms: list[str], n_parents: int
) -> str:
    """ToChildBlockJoinQuery oracle (``lucene/join/.../
    ToChildBlockJoinQuery.java``, Solr ``{!child of=...}``): the parent
    query here is the composite ``{!child}{!parent}q`` sibling-retrieval
    shape — parents scored by ScoreMode.Max child roll-up, then EVERY
    child of the top parents is returned carrying its parent's score
    (ToChildBlockJoin propagates parentScore to each child when
    doScores)."""
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    return f"""WITH {base_ctes(analyzer)},{_disjunction_core(pred)},
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score FROM sc GROUP BY doc_id
),
parents AS (
    SELECT d.source, max(h.score)::FLOAT AS parent_score
    FROM hits h JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY parent_score DESC, source ASC LIMIT {n_parents}
)
SELECT p.source, d.doc_id::BIGINT AS doc_id, p.parent_score::FLOAT AS parent_score
FROM parents p JOIN documents d USING (source)
ORDER BY parent_score DESC, source, doc_id"""


def explain_sql(analyzer: str, terms: list[str], doc_id: int) -> str:
    """``IndexSearcher#explain`` oracle: per-term BM25 breakdown for one doc
    — df, float32 idf, tf, doc length, clause score (kernel float32 op
    order). Terms with df=0 are dropped (compile_query drops those clauses)."""
    per_term = " UNION ALL ".join(f"""
SELECT '{t}' AS term,
       (SELECT count(DISTINCT doc_id) FROM kept WHERE term = '{t}')::BIGINT AS df,
       CAST({_idf_expr(t)} AS FLOAT) AS idf,
       (SELECT count(*) FROM kept WHERE term = '{t}' AND doc_id = {doc_id})::BIGINT AS tf
FROM statsf st""" for t in terms)
    return f"""WITH {base_ctes(analyzer)},
per_term AS ({per_term})
SELECT p.term, p.df, p.idf, p.tf,
       dl.length::BIGINT AS doc_len,
       CASE WHEN p.tf > 0 THEN
           CAST(p.idf * CAST(p.tf::DOUBLE / (p.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT) AS FLOAT)
       ELSE CAST(0.0 AS FLOAT) END AS clause_score
FROM per_term p, doclen dl, cachec c
WHERE dl.doc_id = {doc_id} AND c.doc_id = {doc_id} AND p.df > 0
ORDER BY p.term"""


def tfidf_topk_sql(analyzer: str, terms: list[str], k: int) -> str:
    """ClassicSimilarity (TF-IDF) disjunction top-k — float32 op order of
    ``TFIDFSimScorer#score``: idf = f32(1 + ln(N/(df+1))), tf = f32(sqrt(freq)),
    lengthNorm = f32(1/sqrt(decoded norm length)), score = f32(f32(tf·w)·norm),
    boolean Σ in double with one f32 cast."""
    clause_selects = []
    for t in terms:
        w = (
            "CAST(1.0 + ln(st.doc_count::DOUBLE / ("
            f"(SELECT count(DISTINCT doc_id) FROM kept WHERE term = '{t}')"
            " + 1.0)) AS FLOAT)"
        )
        clause_selects.append(f"""
SELECT k.doc_id,
       CAST(CAST(CAST(sqrt(count(*)::DOUBLE) AS FLOAT) * {w} AS FLOAT)
            * CAST(1.0 / sqrt(any_value(n.decoded)::DOUBLE) AS FLOAT)
        AS FLOAT) AS s
FROM kept k JOIN norms n USING (doc_id), statsf st
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.doc_count""")
    return f"""WITH {base_ctes(analyzer)},
clause_scores AS ({' UNION ALL '.join(clause_selects)}),
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score
    FROM clause_scores GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def lm_topk_sql(analyzer: str, terms: list[str], k: int, mu: float = 2000.0) -> str:
    """LMDirichlet disjunction top-k — exact float discipline of
    ``LMDirichletSimilarity``/``SimilarityBase``: collectionProbability in
    FLOAT ops (DefaultCollectionModel), the score itself in double
    (ln(1+freq/(mu·cp)) + ln(mu/(dl+mu))), clamped at 0, one f32 cast."""
    clause_selects = []
    for t in terms:
        cp = (
            f"(( (SELECT count(*) FROM kept WHERE term = '{t}')::FLOAT"
            " + CAST(1.0 AS FLOAT) )"
            " / ( st.sum_ttf::FLOAT + CAST(1.0 AS FLOAT) ))"
        )
        aux = f"({mu!r} * CAST({cp} AS DOUBLE))"
        clause_selects.append(f"""
SELECT k.doc_id,
       CAST(greatest(
            ln(1.0 + count(*)::DOUBLE / {aux})
            + ln({mu!r} / (any_value(n.decoded)::DOUBLE + {mu!r})), 0.0) AS FLOAT) AS s
FROM kept k JOIN norms n USING (doc_id), statsf st
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.sum_ttf""")
    return f"""WITH {base_ctes(analyzer)},
clause_scores AS ({' UNION ALL '.join(clause_selects)}),
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score
    FROM clause_scores GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def total_hits_sql(analyzer: str, terms: list[str], threshold: int) -> str:
    """``L/search/TotalHits`` oracle — exact disjunction match count, clamped
    to the threshold with the EQ/GTE relation."""
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""WITH {base_ctes(analyzer)},
m AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM kept WHERE term IN ({inlist}))
SELECT least(n, {threshold})::BIGINT AS value,
       CASE WHEN n <= {threshold} THEN 'EQ' ELSE 'GTE' END AS relation
FROM m"""


def after_update_topk_sql(
    analyzer: str, terms: list[str], k: int, mod: int, suffix: str
) -> str:
    """Top-k oracle for the delete-and-re-add fixture: BM25 over the
    POST-UPDATE corpus (every doc with ``doc_id % mod == 0`` gets ``suffix``
    appended), with the ENGINE's internal-id tiebreak reproduced exactly:
    original docs keep internal id == doc_id (dense key-ordered build);
    re-added docs take ids N, N+1, ... in key order (appended segments come
    after every original segment — ``S/update/DirectUpdateHandler2#addDoc``
    delete+re-add discipline)."""
    esc = suffix.replace("'", "''")
    body = base_ctes(analyzer).replace("FROM documents", "FROM docs_eff")
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    return f"""WITH docs_eff AS (
    SELECT doc_id,
           CASE WHEN doc_id % {mod} = 0 THEN text || '{esc}' ELSE text END AS text
    FROM documents
),{body},{_disjunction_core(pred)},
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score FROM sc GROUP BY doc_id
),
upd_rank AS (
    SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS urn
    FROM documents WHERE doc_id % {mod} = 0
),
tb AS (
    SELECT h.doc_id, h.score,
           CASE WHEN u.urn IS NOT NULL
                THEN (SELECT count(*) FROM documents) + u.urn
                ELSE h.doc_id END AS internal
    FROM hits h LEFT JOIN upd_rank u USING (doc_id)
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, internal ASC) AS rank, doc_id, score FROM tb
) WHERE rank <= {k} ORDER BY rank"""


def knn_classify_sql(analyzer: str, mod: int, top_terms: int, k: int) -> str:
    """KNearestNeighborClassifier oracle: the index CTEs run over the TRAIN
    split (docs_eff), held-out docs' MLT term selection uses their own tf
    with TRAIN idf (ln(N/(df+1))+1, (m desc, term) tiebreak), neighbors are
    the per-query BM25 top-k ((score desc, doc asc) — the train build is
    dense key-ordered so source-id order == the engine's internal-id
    tiebreak), label = majority class (votes desc, class asc)."""
    body = base_ctes(analyzer).replace("FROM documents", "FROM docs_eff")
    return f"""WITH docs_eff AS (
    SELECT * FROM documents WHERE doc_id % {mod} != 0
),{body},
test_tl AS (
    SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks
    FROM documents WHERE doc_id % {mod} = 0
),
test_tok AS (SELECT doc_id, lower(unnest(toks)) AS term FROM test_tl),
test_tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM test_tok GROUP BY 1, 2
),
tdf AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept GROUP BY 1),
mlt AS (
    SELECT t.doc_id, t.term,
           t.tf::DOUBLE * (ln(st.doc_count::DOUBLE / (d.df + 1.0)) + 1.0) AS m
    FROM test_tf t JOIN tdf d USING (term), statsf st
),
top_terms AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, term,
               row_number() OVER (PARTITION BY doc_id ORDER BY m DESC, term ASC) AS rn
        FROM mlt
    ) WHERE rn <= {top_terms}
),
qt AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept
    WHERE term IN (SELECT DISTINCT term FROM top_terms) GROUP BY term
),
widf AS (
    SELECT term, CAST(ln(1.0 + (st.doc_count - df + 0.5) / (df + 0.5)) AS FLOAT) AS idf
    FROM qt, statsf st
),
tfq AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM kept
    WHERE term IN (SELECT DISTINCT term FROM top_terms) GROUP BY 1, 2
),
sc AS (
    SELECT t.doc_id, t.term,
           CAST(w.idf * CAST(t.tf::DOUBLE / (t.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT) AS FLOAT) AS s
    FROM tfq t JOIN widf w USING (term) JOIN cachec c USING (doc_id)
),
qhits AS (
    SELECT q.doc_id AS qid, s.doc_id AS nbr,
           CAST(sum(CAST(s.s AS DOUBLE)) AS FLOAT) AS score
    FROM top_terms q JOIN sc s USING (term) GROUP BY 1, 2
),
topk AS (
    SELECT qid, nbr FROM (
        SELECT qid, nbr,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, nbr ASC) AS rk
        FROM qhits
    ) WHERE rk <= {k}
),
votes AS (
    SELECT t.qid, d.lang AS cls, count(*)::BIGINT AS votes
    FROM topk t JOIN documents d ON d.doc_id = t.nbr GROUP BY 1, 2
)
SELECT qid::BIGINT AS doc_id, cls AS label, votes FROM (
    SELECT qid, cls, votes,
           row_number() OVER (PARTITION BY qid ORDER BY votes DESC, cls ASC) AS rn
    FROM votes
) WHERE rn = 1 ORDER BY doc_id"""


def after_dbq_topk_sql(
    analyzer: str, dbq_term: str, terms: list[str], k: int
) -> str:
    """Top-k oracle for the delete-by-query fixture: BM25 over the
    POST-DBQ corpus — every doc whose analyzed token stream contains
    ``dbq_term`` is gone, and doc_count/avgdl/df all shrink accordingly
    (the engine's refresh_stats discipline). No re-adds, so internal ids
    stay the doc keys (plain (score desc, doc_id asc) tiebreak). The
    deleted set is derived by tokenizing the ORIGINAL corpus with the
    same simple-analyzer expression base_ctes uses."""
    body = base_ctes(analyzer).replace("FROM documents", "FROM docs_eff")
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    return f"""WITH deleted AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_id, lower(unnest(regexp_extract_all(text, '{TOKEN_RE_SQL}'))) AS term
        FROM documents
    ) WHERE term = '{dbq_term}'
),
docs_eff AS (
    SELECT doc_id, text FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM deleted)
),{body},{_disjunction_core(pred)},
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score FROM sc GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def sloppy_phrase_topk_sql(
    analyzer: str, terms: tuple[str, ...], offsets: tuple[int, ...], slop: int, k: int
) -> str:
    """Sloppy-phrase top-k oracle: a DuckDB ``WITH RECURSIVE`` emulation of
    Lucene's greedy sloppy matcher (``L/search/SloppyPhraseMatcher`` /
    classic SloppyPhraseScorer#phraseFreq, no-repeats case) for the TWO-term
    phrase — exactly the heap walk in ``kernels._sloppy_freq_one_doc``.

    With two iterators the heap degenerates: after each overtake the new
    current element is always the old heap head and the just-advanced
    position becomes the new head, so one recursion step per loop iteration
    carries the full state (i0, i1, t, p, nxt, end, matchLength, freq).
    Float discipline: freq accumulates in FLOAT (DuckDB FLOAT ops round per
    op to float32, matching np.float32 accumulation); scoring reuses the
    phrase-clause op order (weight = f32(Σ f64 of f32 idfs), ratio f32 from
    f64 division, one final f32 multiply).

    n>2 phrases would need a real heap in SQL; they are covered by the
    independent-implementation + hypothesis parity suite instead
    (tests/test_sloppy_phrase.py).
    """
    if len(terms) != 2:
        raise ValueError("SQL sloppy oracle implemented for 2-term phrases")
    t0, t1 = terms
    off0, off1 = offsets
    idf_sum = " + ".join(f"CAST({_idf_expr(t)} AS DOUBLE)" for t in terms)
    exists = " AND ".join(
        f"EXISTS (SELECT 1 FROM kept WHERE term = '{t}')" for t in terms
    )
    return f"""WITH RECURSIVE {base_ctes(analyzer)},
pl0 AS (
    SELECT doc_id, list(pos - {off0} ORDER BY pos) AS pl
    FROM kept WHERE term = '{t0}' GROUP BY doc_id
),
pl1 AS (
    SELECT doc_id, list(pos - {off1} ORDER BY pos) AS pl
    FROM kept WHERE term = '{t1}' GROUP BY doc_id
),
init AS (
    SELECT a.doc_id, a.pl AS la, b.pl AS lb,
           a.pl[1] AS pa, b.pl[1] AS pb
    FROM pl0 a JOIN pl1 b USING (doc_id)
),
walk AS (
    SELECT doc_id, la, lb,
           1::BIGINT AS i0, 1::BIGINT AS i1,
           CASE WHEN pa <= pb THEN 0 ELSE 1 END AS t,
           least(pa, pb) AS p,
           greatest(pa, pb) AS nxt,
           greatest(pa, pb) AS endp,
           (greatest(pa, pb) - least(pa, pb))::BIGINT AS ml,
           CAST(0.0 AS FLOAT) AS freq,
           FALSE AS done
    FROM init
    UNION ALL
    SELECT doc_id, la, lb, ni0 AS i0, ni1 AS i1,
           CASE WHEN fin THEN t WHEN pn > nxt THEN 1 - t ELSE t END AS t,
           CASE WHEN fin THEN p WHEN pn > nxt THEN nxt ELSE pn END AS p,
           CASE WHEN fin THEN nxt WHEN pn > nxt THEN pn ELSE nxt END AS nxt,
           CASE WHEN fin THEN endp ELSE greatest(endp, pn) END AS endp,
           CASE WHEN fin THEN ml
                WHEN pn > nxt THEN greatest(endp, pn) - nxt
                ELSE least(ml, greatest(endp, pn) - pn) END AS ml,
           CASE WHEN (fin OR pn > nxt) AND ml <= {slop}
                THEN freq + CAST(1.0 / (ml + 1.0) AS FLOAT)
                ELSE freq END AS freq,
           fin AS done
    FROM (
        SELECT w.*,
               CASE WHEN t = 0 THEN i0 + 1 ELSE i0 END AS ni0,
               CASE WHEN t = 1 THEN i1 + 1 ELSE i1 END AS ni1,
               CASE WHEN t = 0 THEN i0 + 1 > len(la)
                    ELSE i1 + 1 > len(lb) END AS fin,
               CASE WHEN t = 0 THEN la[(i0 + 1)::INTEGER]
                    ELSE lb[(i1 + 1)::INTEGER] END AS pn
        FROM walk w WHERE NOT done
    ) s
),
sloppy_tf AS (SELECT doc_id, freq FROM walk WHERE done AND freq > 0),
hits AS (
    SELECT f.doc_id,
           CAST(CAST({idf_sum} AS FLOAT)
                * CAST(CAST(f.freq AS DOUBLE)
                       / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM sloppy_tf f JOIN cachec c USING (doc_id), statsf st
    WHERE {exists}
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def _bm25_match_ctes(
    spec: BooleanSpec, p: str = "", filter_pred: str | None = None,
) -> str:
    """CTE-fragment builder shared by ``bm25_topk_sql`` and composite
    oracles (rerank/elevate): emits ``{p}cs0.. , {p}hits, {p}match`` where
    ``{p}match(doc_id, score)`` holds every doc MATCHING ``spec`` with its
    f32 BM25 score (boolean occur/minShouldMatch/MUST_NOT applied). The
    prefix keeps two independent query trees in one WITH clause."""
    clause_ctes: list[str] = []
    clause_selects: list[str] = []
    ci = 0
    for occur, group in (("must", spec.must), ("should", spec.should)):
        for c in group:
            is_must = "TRUE" if occur == "must" else "FALSE"
            if isinstance(c, OrGroupClause):
                # nested disjunction as ONE clause: per-member f32 term
                # score (term-branch arithmetic) widened to DOUBLE, summed
                # in member order via an explicit + chain (absent member →
                # +0.0, an IEEE no-op), one f32 cast for the group
                members = c.terms
                boost = float(c.boost)
                mem_ctes = []
                for j, t in enumerate(members):
                    w_expr = _idf_expr(t) if boost == 1.0 else (
                        f"(CAST({boost!r} AS FLOAT) * {_idf_expr(t)})"
                    )
                    mem_ctes.append(f"""
{p}og{ci}m{j} AS (
    SELECT k.doc_id,
           CAST(CAST({w_expr}
                * CAST(count(*)::DOUBLE / (count(*)::DOUBLE + CAST(any_value(c.cache) AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS DOUBLE) AS s_d
    FROM kept k JOIN cachec c USING (doc_id), statsf st
    WHERE k.term = '{t}'
    GROUP BY k.doc_id, st.doc_count
)""")
                members_in = ", ".join(f"'{t}'" for t in members)
                chain = " + ".join(
                    f"COALESCE(m{j}.s_d, 0)" for j in range(len(members))
                )
                ljoins = " ".join(
                    f"LEFT JOIN {p}og{ci}m{j} m{j} USING (doc_id)"
                    for j in range(len(members))
                )
                clause_ctes.append(f"""{','.join(mem_ctes)},
{p}cs{ci} AS (
    SELECT d.doc_id, CAST({chain} AS FLOAT) AS s, {is_must} AS is_must
    FROM (SELECT DISTINCT doc_id FROM kept WHERE term IN ({members_in})) d
    {ljoins}
)""")
                clause_selects.append(f"SELECT doc_id, s, is_must FROM {p}cs{ci}")
                ci += 1
                continue
            if isinstance(c, MultiPhraseClause):
                # MultiPhraseQuery: per-slot IN-lists; tf = matching start
                # positions; weight = f32(Σ_double f32 idf over flattened
                # member terms) — dead terms contribute +0.0 (a no-op in the
                # engine's live-only sum, IEEE-exact)
                slots, offsets = c.slots, c.offsets
                joins = []
                for j in range(1, len(slots)):
                    inl = ", ".join(f"'{t}'" for t in slots[j])
                    joins.append(
                        f"JOIN kept k{j} ON k{j}.doc_id = k0.doc_id "
                        f"AND k{j}.pos = k0.pos + {offsets[j] - offsets[0]} "
                        f"AND k{j}.term IN ({inl})"
                    )
                inl0 = ", ".join(f"'{t}'" for t in slots[0])
                flat = [t for slot in slots for t in slot]
                idf_sum = " + ".join(
                    f"(CASE WHEN EXISTS (SELECT 1 FROM kept WHERE term = '{t}')"
                    f" THEN CAST({_idf_expr(t)} AS DOUBLE) ELSE 0 END)"
                    for t in flat
                )
                exists = " AND ".join(
                    "(" + " OR ".join(
                        f"EXISTS (SELECT 1 FROM kept WHERE term = '{t}')"
                        for t in slot
                    ) + ")"
                    for slot in slots
                )
                clause_ctes.append(f"""
{p}ph{ci} AS (
    SELECT k0.doc_id, count(*)::BIGINT AS tf
    FROM kept k0 {' '.join(joins)}
    WHERE k0.term IN ({inl0})
    GROUP BY k0.doc_id
),
{p}cs{ci} AS (
    SELECT p.doc_id,
           CAST(CAST({idf_sum} AS FLOAT)
                * CAST(p.tf::DOUBLE / (p.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS s,
           {is_must} AS is_must
    FROM {p}ph{ci} p JOIN cachec c USING (doc_id), statsf st
    WHERE {exists}
)""")
                clause_selects.append(f"SELECT doc_id, s, is_must FROM {p}cs{ci}")
                ci += 1
                continue
            if isinstance(c, PhraseClause):
                terms, offsets = c.terms, c.offsets
                joins = []
                for j in range(1, len(terms)):
                    joins.append(
                        f"JOIN kept k{j} ON k{j}.doc_id = k0.doc_id "
                        f"AND k{j}.pos = k0.pos + {offsets[j] - offsets[0]} "
                        f"AND k{j}.term = '{terms[j]}'"
                    )
                # weight = f32(boost) · f32(Σ_double of per-term f32 idfs,
                # in term order) — boost omitted when 1.0 (engine:
                # np.float32(c.boost) * np.float32(sum(idfs)))
                idf_sum = " + ".join(f"CAST({_idf_expr(t)} AS DOUBLE)" for t in terms)
                pboost = float(getattr(c, "boost", 1.0))
                w_expr = f"CAST({idf_sum} AS FLOAT)" if pboost == 1.0 else (
                    f"(CAST({pboost!r} AS FLOAT) * CAST({idf_sum} AS FLOAT))"
                )
                exists = " AND ".join(
                    f"EXISTS (SELECT 1 FROM kept WHERE term = '{t}')" for t in terms
                )
                clause_ctes.append(f"""
{p}ph{ci} AS (
    SELECT k0.doc_id, count(*)::BIGINT AS tf
    FROM kept k0 {' '.join(joins)}
    WHERE k0.term = '{terms[0]}'
    GROUP BY k0.doc_id
),
{p}cs{ci} AS (
    SELECT p.doc_id,
           CAST({w_expr}
                * CAST(p.tf::DOUBLE / (p.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS s,
           {is_must} AS is_must
    FROM {p}ph{ci} p JOIN cachec c USING (doc_id), statsf st
    WHERE {exists}
)""")
            else:
                t = c.term
                # weight = f32(boost) * f32(idf), each op rounding to f32
                # (TermClause.boost; engine: np.float32(boost) * bm25_idf)
                boost = float(getattr(c, "boost", 1.0))
                w_expr = _idf_expr(t) if boost == 1.0 else (
                    f"(CAST({boost!r} AS FLOAT) * {_idf_expr(t)})"
                )
                clause_ctes.append(f"""
{p}cs{ci} AS (
    SELECT k.doc_id,
           CAST({w_expr}
                * CAST(count(*)::DOUBLE / (count(*)::DOUBLE + CAST(any_value(c.cache) AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS s,
           {is_must} AS is_must
    FROM kept k JOIN cachec c USING (doc_id), statsf st
    WHERE k.term = '{t}'
    GROUP BY k.doc_id, st.doc_count
)""")
            clause_selects.append(f"SELECT doc_id, s, is_must FROM {p}cs{ci}")
            ci += 1

    if ci == 0:
        return (
            f"{p}match AS (SELECT 1::BIGINT AS doc_id, 1.0::FLOAT AS score "
            "WHERE FALSE)"
        )

    n_must = len(spec.must)
    msm = spec.min_should_match
    if n_must == 0 and msm < 1:
        msm = 1  # pure disjunction requires >=1 SHOULD (compile_query)
    msm_clause = f"AND n_should >= {msm}" if msm > 0 else ""
    mn_clause = ""
    if spec.must_not:
        mn_terms = ", ".join(f"'{c.term}'" for c in spec.must_not)
        mn_clause = (
            "AND NOT EXISTS (SELECT 1 FROM kept x "
            f"WHERE x.doc_id = h.doc_id AND x.term IN ({mn_terms}))"
        )
    if filter_pred:
        # FILTER occur: non-scoring candidate restriction BEFORE ranking
        mn_clause += (
            f" AND h.doc_id IN (SELECT doc_id FROM documents WHERE {filter_pred})"
        )

    return f"""{','.join(clause_ctes)},
{p}clause_scores AS ({' UNION ALL '.join(clause_selects)}),
{p}hits AS (
    SELECT doc_id,
           CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score,
           sum(CASE WHEN is_must THEN 1 ELSE 0 END) AS n_must,
           sum(CASE WHEN is_must THEN 0 ELSE 1 END) AS n_should
    FROM {p}clause_scores GROUP BY doc_id
),
{p}match AS (
    SELECT h.doc_id, h.score FROM {p}hits h
    WHERE n_must = {n_must} {msm_clause} {mn_clause}
)"""


def fq_cached_topk_sql(
    analyzer: str, spec: BooleanSpec, fq_spec: BooleanSpec, k: int
) -> str:
    """Arbitrary-query ``fq`` under the filterCache (engine.fq_topk): the
    fq's match set is a prefixed CTE; the main query's candidates restrict
    to it BEFORE ranking (FILTER occur — scores and stats untouched)."""
    frag_fq = _bm25_match_ctes(fq_spec, "fq")
    frag = _bm25_match_ctes(
        spec, "", filter_pred="doc_id IN (SELECT doc_id FROM fqmatch)"
    )
    return f"""WITH {base_ctes(analyzer)},{frag_fq},{frag}
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
           doc_id, score
    FROM match
) WHERE rank <= {k} ORDER BY rank"""


def fielded_dismax_topk_sql(
    analyzer: str,
    spec: BooleanSpec,
    k: int,
    title_expr_sql: str,
    wt: float,
    wb: float,
    tie: float = 0.0,
) -> str:
    """eDisMax qf cross-field oracle (engine.fielded_dismax_topk): each
    field is a COMPLETE independent BM25 scope — the proven bitwise match
    CTEs run twice, the title leg inside a nested WITH whose ``documents``
    CTE shadows the registered view with the derived-title projection (per
    Lucene's per-field model: independent postings/norms/stats per field).
    Combine = f32 field-weight multiply, full join on doc_id, greatest."""
    import numpy as np

    frag = _bm25_match_ctes(spec, "")
    wt_f, wb_f = float(np.float32(wt)), float(np.float32(wb))
    # the title leg re-points every base-CTE read at the projected docs
    # (the docs_eff precedent in after-update oracles); nested WITH scopes
    # keep the two legs' identically-named CTEs independent
    title_base = base_ctes(analyzer).replace("FROM documents", "FROM title_docs")
    title_frag = frag.replace("FROM documents", "FROM title_docs")
    return f"""WITH title_docs AS (
    SELECT doc_id, {title_expr_sql} AS text FROM documents
),
ftitle AS (
    WITH {title_base},{title_frag}
    SELECT doc_id,
           CAST(CAST(CAST({wt_f!r} AS DOUBLE) AS FLOAT) * score AS FLOAT) AS s_t
    FROM match
),
fbody AS (
    WITH {base_ctes(analyzer)},{frag}
    SELECT doc_id,
           CAST(CAST(CAST({wb_f!r} AS DOUBLE) AS FLOAT) * score AS FLOAT) AS s_b
    FROM match
),
fused AS (
    SELECT doc_id,
           {(
               "CAST(mx + (sum_d - mx) * CAST(" + repr(float(tie)) + " AS DOUBLE) AS FLOAT)"
               if tie else "CAST(mx AS FLOAT)"
           )} AS score
    FROM (
        SELECT doc_id,
               CAST(greatest(COALESCE(s_t, CAST('-infinity' AS FLOAT)),
                             COALESCE(s_b, CAST('-infinity' AS FLOAT)))
                    AS DOUBLE) AS mx,
               COALESCE(CAST(s_t AS DOUBLE), 0) + COALESCE(CAST(s_b AS DOUBLE), 0)
                   AS sum_d
        FROM ftitle FULL JOIN fbody USING (doc_id)
    )
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score
FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
           doc_id, score
    FROM fused
) WHERE rank <= {k} ORDER BY rank"""


def blended_term_topk_sql(
    analyzer: str, toks: list[str], k: int, title_expr_sql: str
) -> str:
    """BlendedTermQuery cross-field oracle (engine.blended_term_topk): each
    field's complete BM25 scope runs in a nested WITH; per-term docFreq is
    blended to the MAX across fields in a top-level CTE both scopes read;
    per-field scores use the field's own doc_count/norms with the blended
    df; fields combine by dismax (tie=0)."""

    def _blend_idf(t: str) -> str:
        sub = f"(SELECT df FROM blend WHERE term = '{t}')"
        return (
            f"CAST(ln(1.0 + (st.doc_count - {sub} + 0.5) / ({sub} + 0.5)) AS FLOAT)"
        )

    def _leg(base: str, alias: str) -> str:
        branches = " UNION ALL ".join(
            f"""
    SELECT k.doc_id,
           CAST({_blend_idf(t)}
                * CAST(count(*)::DOUBLE / (count(*)::DOUBLE + CAST(any_value(c.cache) AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS s
    FROM kept k JOIN cachec c USING (doc_id), statsf st
    WHERE k.term = '{t}'
    GROUP BY k.doc_id, st.doc_count"""
            for t in toks
        )
        return f"""(
    WITH {base},
    cs AS ({branches})
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS {alias}
    FROM cs GROUP BY doc_id
)"""

    in_list = ", ".join(f"'{t}'" for t in toks)
    vals = ", ".join(f"('{t}')" for t in toks)
    title_base = base_ctes(analyzer).replace("FROM documents", "FROM title_docs")
    return f"""WITH title_docs AS (
    SELECT doc_id, {title_expr_sql} AS text FROM documents
),
tdf AS (
    WITH {title_base}
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df
    FROM kept WHERE term IN ({in_list}) GROUP BY 1
),
bdf AS (
    WITH {base_ctes(analyzer)}
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df
    FROM kept WHERE term IN ({in_list}) GROUP BY 1
),
blend AS (
    SELECT v.t AS term,
           greatest(COALESCE(tdf.df, 0), COALESCE(bdf.df, 0)) AS df
    FROM (VALUES {vals}) v(t)
    LEFT JOIN tdf ON tdf.term = v.t
    LEFT JOIN bdf ON bdf.term = v.t
),
ftitle AS {_leg(title_base, "s_t")},
fbody AS {_leg(base_ctes(analyzer), "s_b")},
fused AS (
    SELECT doc_id,
           greatest(COALESCE(s_t, CAST('-infinity' AS FLOAT)),
                    COALESCE(s_b, CAST('-infinity' AS FLOAT))) AS score
    FROM ftitle FULL JOIN fbody USING (doc_id)
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score
FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
           doc_id, score
    FROM fused
) WHERE rank <= {k} ORDER BY rank"""


def bm25_topk_sql(
    analyzer: str, spec: BooleanSpec, k: int, offset: int = 0,
    filter_pred: str | None = None, k1: float = 1.2, b: float = 0.75,
) -> str:
    """Full BM25 boolean/phrase top-k — bitwise float32 parity with the
    engine's kernels (per-clause f32 score, Σ in double, one f32 cast,
    (score desc, doc_id asc) tiebreak, minShouldMatch, MUST_NOT).
    ``k1``/``b`` select a non-default BM25Similarity(k1, b) tuning."""
    frag = _bm25_match_ctes(spec, "", filter_pred)
    if frag.startswith("match AS ("):  # empty spec
        return "SELECT 1::INTEGER AS rank, 1::BIGINT AS doc_id, 1.0::FLOAT AS score WHERE FALSE"
    return f"""WITH {base_ctes(analyzer, k1=k1, b=b)},{frag}
SELECT (rank - {offset})::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
           doc_id, score
    FROM match
) WHERE rank > {offset} AND rank <= {offset} + {k} ORDER BY rank"""


def fixture_text_topk_sql(
    analyzer: str, spec: BooleanSpec, k: int, text_expr_sql: str
) -> str:
    """``bm25_topk_sql`` over a DERIVED corpus: ``text_expr_sql`` (a DuckDB
    expression over the documents columns — the same expression the engine
    fixture passes as Spark ``text_expr``) replaces the text column. Used by
    the analyzer-fixture entries whose interesting surface (digits, URLs,
    emails) the driver corpus lacks; doc ids are unchanged."""
    sql = bm25_topk_sql(analyzer, spec, k)
    body = sql[len("WITH "):].replace("FROM documents", "FROM docs_eff")
    # column-complete projection: every documents column survives with only
    # text replaced, so future bm25_topk_sql variants referencing filter
    # predicates or keyword columns keep working through the rewrite
    return (
        f"WITH docs_eff AS (SELECT * REPLACE (({text_expr_sql}) AS text) "
        f"FROM documents),{body}"
    )


def group_query_topk_sql(
    analyzer: str, buckets: dict[str, BooleanSpec], k: int
) -> str:
    """group.query oracle: one BM25 top-k per named bucket query (the
    shared match CTEs, prefixed per bucket), labelled and unioned,
    (bucket, rank) ordered."""
    frags, selects = [], []
    for i, name in enumerate(sorted(buckets)):
        p = f"gq{i}"
        frags.append(_bm25_match_ctes(buckets[name], p))
        selects.append(f"""
SELECT '{name}' AS bucket, rank, doc_id, score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
           doc_id, score
    FROM {p}match
) WHERE rank <= {k}""")
    return f"""WITH {base_ctes(analyzer)},{','.join(frags)}
SELECT bucket, rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score
FROM ({' UNION ALL '.join(selects)})
ORDER BY bucket, rank"""


def highlight_topk_sql(analyzer: str, spec: BooleanSpec, k: int, window: int = 8) -> str:
    """Top-k + best-window snippet (UnifiedHighlighter analog,
    ``lucene/highlighter/.../uhighlight/UnifiedHighlighter.java``).

    Window spec (mirrors DocumentsEngine.highlight_topk exactly): candidate
    windows start at a matched query-term raw-token position, span
    ``window`` positions; best = max query-term occurrences inside, tie →
    leftmost; snippet = the original-case raw tokens of the window joined
    by single spaces."""
    qterms = sorted({
        t
        for c in [*spec.must, *spec.should]
        for t in (c.terms if isinstance(c, PhraseClause) else (c.term,))
    })
    terms_in = ", ".join(f"'{t}'" for t in qterms)
    inner = bm25_topk_sql(analyzer, spec, k)
    return f"""WITH topk AS ({inner}),
htl AS (
    SELECT d.doc_id, regexp_extract_all(d.text, '{TOKEN_RE_SQL}') AS toks
    FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM topk)
),
hrt AS (
    SELECT doc_id, lower(unnest(toks)) AS term,
           generate_subscripts(toks, 1) - 1 AS pos
    FROM htl
),
mpos AS (SELECT doc_id, pos FROM hrt WHERE term IN ({terms_in})),
wins AS (
    SELECT a.doc_id, a.pos AS s, count(*)::BIGINT AS cnt
    FROM mpos a JOIN mpos b
      ON b.doc_id = a.doc_id AND b.pos BETWEEN a.pos AND a.pos + {window - 1}
    GROUP BY a.doc_id, a.pos
),
best AS (
    SELECT doc_id, s FROM (
        SELECT doc_id, s,
               row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, s ASC) AS rn
        FROM wins
    ) WHERE rn = 1
)
SELECT t.rank::INTEGER AS rank, t.doc_id::BIGINT AS doc_id, t.score::FLOAT AS score,
       array_to_string(h.toks[b.s + 1 : b.s + {window}], ' ') AS snippet
FROM topk t JOIN best b USING (doc_id) JOIN htl h USING (doc_id)
ORDER BY rank"""


def highlight_passages_sql(
    analyzer: str, spec: BooleanSpec, k: int, window: int = 8
) -> str:
    """Two-passage highlighting oracle (hl.snippets=2 — mirrors
    ``DocumentsEngine.highlight_passages`` exactly): passage 1 = the
    single-window best; passage 2 = best window ≥ ``window`` starts away
    (non-overlapping), LEFT-joined so single-region docs emit one passage;
    render in document order joined by ' ... '."""
    qterms = sorted({
        t
        for c in [*spec.must, *spec.should]
        for t in (c.terms if isinstance(c, PhraseClause) else (c.term,))
    })
    terms_in = ", ".join(f"'{t}'" for t in qterms)
    inner = bm25_topk_sql(analyzer, spec, k)
    W = window
    return f"""WITH topk AS ({inner}),
htl AS (
    SELECT d.doc_id, regexp_extract_all(d.text, '{TOKEN_RE_SQL}') AS toks
    FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM topk)
),
hrt AS (
    SELECT doc_id, lower(unnest(toks)) AS term,
           generate_subscripts(toks, 1) - 1 AS pos
    FROM htl
),
mpos AS (SELECT doc_id, pos FROM hrt WHERE term IN ({terms_in})),
wins AS (
    SELECT a.doc_id, a.pos AS s, count(*)::BIGINT AS cnt
    FROM mpos a JOIN mpos b
      ON b.doc_id = a.doc_id AND b.pos BETWEEN a.pos AND a.pos + {W - 1}
    GROUP BY a.doc_id, a.pos
),
best1 AS (
    SELECT doc_id, s FROM (
        SELECT doc_id, s,
               row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, s ASC) AS rn
        FROM wins
    ) WHERE rn = 1
),
best2 AS (
    SELECT doc_id, s FROM (
        SELECT w.doc_id, w.s,
               row_number() OVER (PARTITION BY w.doc_id ORDER BY w.cnt DESC, w.s ASC) AS rn
        FROM wins w JOIN best1 b ON b.doc_id = w.doc_id
        WHERE abs(w.s - b.s) >= {W}
    ) WHERE rn = 1
)
SELECT t.rank::INTEGER AS rank, t.doc_id::BIGINT AS doc_id, t.score::FLOAT AS score,
       CASE
           WHEN b2.s IS NULL THEN
               array_to_string(h.toks[b1.s + 1 : b1.s + {W}], ' ')
           WHEN b2.s < b1.s THEN
               array_to_string(h.toks[b2.s + 1 : b2.s + {W}], ' ')
               || ' ... ' || array_to_string(h.toks[b1.s + 1 : b1.s + {W}], ' ')
           ELSE
               array_to_string(h.toks[b1.s + 1 : b1.s + {W}], ' ')
               || ' ... ' || array_to_string(h.toks[b2.s + 1 : b2.s + {W}], ' ')
       END AS snippet
FROM topk t
JOIN best1 b1 USING (doc_id)
LEFT JOIN best2 b2 USING (doc_id)
JOIN htl h USING (doc_id)
ORDER BY rank"""


def synonym_topk_sql(
    analyzer: str, groups: list[tuple[str, ...]], k: int
) -> str:
    """SynonymQuery top-k oracle (``L/search/SynonymQuery``): each group of
    terms scores as ONE pseudo-term — tf = Σ member tfs per doc, idf from
    the MAX member df — f32 per clause, Σ in double across groups, one
    final f32 cast ((score desc, doc asc) tiebreak). Singleton groups
    degenerate to ordinary term clauses (same expression)."""
    sels = []
    for terms in groups:
        tin = ", ".join(f"'{t}'" for t in terms)
        sels.append(f"""
    SELECT t.doc_id, CAST(
        (SELECT CAST(ln(1.0 + (st.doc_count - mx.df + 0.5) / (mx.df + 0.5)) AS FLOAT)
         FROM statsf st,
              (SELECT max(df) AS df FROM (
                   SELECT count(DISTINCT doc_id) AS df FROM kept
                   WHERE term IN ({tin}) GROUP BY term)) mx)
        * CAST(t.tf::DOUBLE / (t.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT)
        AS FLOAT) AS s
    FROM (SELECT doc_id, count(*)::BIGINT AS tf FROM kept
          WHERE term IN ({tin}) GROUP BY doc_id) t
    JOIN cachec c USING (doc_id)""")
    return _sim_family_topk_sql(analyzer, sels, k)


def _sim_family_topk_sql(analyzer: str, clause_selects: list[str], k: int) -> str:
    return f"""WITH {base_ctes(analyzer)},
clause_scores AS ({' UNION ALL '.join(clause_selects)}),
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score
    FROM clause_scores GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def sweetspot_topk_sql(analyzer: str, terms: list[str], k: int) -> str:
    """SweetSpotSimilarity disjunction top-k (``L/misc/.../
    SweetSpotSimilarity.java`` — ClassicSimilarity with the plateau
    lengthNorm and baseline tf; config = the engine's [3,20]/0.5 sweet
    spot, tf min 2 / base 1.5): idf classic, tf = CASE baseline, norm =
    f32(1/sqrt(steep·(|dl−min|+|dl−max|−(max−min))+1)), score =
    f32(f32(tf·w)·norm), Σ double, one f32 cast."""
    clause_selects = []
    for t in terms:
        w = (
            "CAST(1.0 + ln(st.doc_count::DOUBLE / ("
            f"(SELECT count(DISTINCT doc_id) FROM kept WHERE term = '{t}')"
            " + 1.0)) AS FLOAT)"
        )
        tf = (
            "CAST(CASE WHEN count(*) <= 2 THEN CAST(1.5 AS DOUBLE)"
            " ELSE sqrt(count(*)::DOUBLE + 0.25) END AS FLOAT)"
        )
        norm = (
            "CAST(1.0 / sqrt(0.5 * (abs(any_value(n.decoded)::DOUBLE - 3)"
            " + abs(any_value(n.decoded)::DOUBLE - 20) - 17) + 1.0) AS FLOAT)"
        )
        clause_selects.append(f"""
SELECT k.doc_id,
       CAST(CAST({tf} * {w} AS FLOAT) * {norm} AS FLOAT) AS s
FROM kept k JOIN norms n USING (doc_id), statsf st
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.doc_count""")
    return _sim_family_topk_sql(analyzer, clause_selects, k)


def omitnorms_topk_sql(
    analyzer: str, terms: list[str], k: int,
    k1: float = 1.2, b: float = 0.75,
) -> str:
    """omitNorms BM25 disjunction top-k (``L/document/FieldType#
    setOmitNorms``): with no norms producer, ``LeafSimScorer#getNormValue``
    yields the constant 1L, so every doc shares norm-cache entry
    ``cache[1]`` — f32 op order of ``bm25.norm_cache`` with decoded length
    1: ``k1f*((1f-bf) + (bf*1f)/avgdl)``. Per-clause score = f32(f32(idf) *
    f32(tf/(tf + cache1))), Σ double, one f32 cast."""
    import numpy as np

    k1_f = float(np.float32(k1))
    b_f = float(np.float32(b))
    one_minus_b_f = float(np.float32(1.0) - np.float32(b))
    cache1 = (
        f"(CAST(CAST({k1_f!r} AS DOUBLE) AS FLOAT)"
        f" * (CAST(CAST({one_minus_b_f!r} AS DOUBLE) AS FLOAT)"
        f" + (CAST(CAST({b_f!r} AS DOUBLE) AS FLOAT) * CAST(1 AS FLOAT))"
        " / st.avgdl))"
    )
    clause_selects = []
    for t in terms:
        clause_selects.append(f"""
SELECT k.doc_id,
       CAST({_idf_expr(t)}
            * CAST(count(*)::DOUBLE / (count(*)::DOUBLE + CAST({cache1} AS DOUBLE)) AS FLOAT)
        AS FLOAT) AS s
FROM kept k, statsf st
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.doc_count, st.avgdl""")
    return _sim_family_topk_sql(analyzer, clause_selects, k)


def dfr_topk_sql(analyzer: str, terms: list[str], k: int, c: float = 1.0) -> str:
    """DFRSimilarity (BasicModelIN + AfterEffectL + NormalizationH2)
    disjunction top-k — exact float discipline of the engine's
    ``score_postings_dfr``: tfn = tf · log2(1 + c·avgdl/dl) (avgdl FLOAT,
    then double ops), score = boost · log2((N+1)/(df+0.5)) · tfn/(1+tfn),
    clamped at 0, one f32 cast per clause, Σ double, one f32 cast."""
    clause_selects = []
    for t in terms:
        aux = (
            f"log2(( st.doc_count::DOUBLE + 1.0 )"
            f" / ( (SELECT count(DISTINCT doc_id) FROM kept WHERE term = '{t}')::DOUBLE + 0.5 ))"
        )
        tfn = (
            f"(count(*)::DOUBLE * log2(1.0 + ({c!r} * CAST(any_value(st2.avgdl) AS DOUBLE))"
            " / any_value(n.decoded)::DOUBLE))"
        )
        clause_selects.append(f"""
SELECT k.doc_id,
       CAST(greatest({aux} * ({tfn} / (1.0 + {tfn})), 0.0) AS FLOAT) AS s
FROM kept k JOIN norms n USING (doc_id), statsf st, statsf st2
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.doc_count""")
    return _sim_family_topk_sql(analyzer, clause_selects, k)


def ib_topk_sql(analyzer: str, terms: list[str], k: int, c: float = 1.0) -> str:
    """IBSimilarity (DistributionLL + LambdaDF + NormalizationH2) top-k —
    λw = (df+1)/(N+1), tfn as DFR-H2, score = boost · ln((tfn+λw)/λw),
    clamped, one f32 cast per clause."""
    clause_selects = []
    for t in terms:
        lam = (
            f"(( (SELECT count(DISTINCT doc_id) FROM kept WHERE term = '{t}')::DOUBLE + 1.0 )"
            " / ( st.doc_count::DOUBLE + 1.0 ))"
        )
        tfn = (
            f"(count(*)::DOUBLE * log2(1.0 + ({c!r} * CAST(any_value(st2.avgdl) AS DOUBLE))"
            " / any_value(n.decoded)::DOUBLE))"
        )
        clause_selects.append(f"""
SELECT k.doc_id,
       CAST(greatest(ln(({tfn} + {lam}) / {lam}), 0.0) AS FLOAT) AS s
FROM kept k JOIN norms n USING (doc_id), statsf st, statsf st2
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.doc_count""")
    return _sim_family_topk_sql(analyzer, clause_selects, k)


def lmjm_topk_sql(analyzer: str, terms: list[str], k: int, lam: float = 0.7) -> str:
    """LMJelinekMercerSimilarity (λ=0.7) top-k — cp in FLOAT ops
    (DefaultCollectionModel), score = ln(1 + ((1−λ)·tf/dl)/(λ·cp)) in
    double, clamped at 0, one f32 cast per clause."""
    clause_selects = []
    for t in terms:
        cp = (
            f"(( (SELECT count(*) FROM kept WHERE term = '{t}')::FLOAT"
            " + CAST(1.0 AS FLOAT) )"
            " / ( st.sum_ttf::FLOAT + CAST(1.0 AS FLOAT) ))"
        )
        aux = f"({lam!r} * CAST({cp} AS DOUBLE))"
        clause_selects.append(f"""
SELECT k.doc_id,
       CAST(greatest(
            ln(1.0 + (({1.0 - lam!r} * count(*)::DOUBLE) / any_value(n.decoded)::DOUBLE)
                     / {aux}), 0.0) AS FLOAT) AS s
FROM kept k JOIN norms n USING (doc_id), statsf st
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.sum_ttf""")
    return _sim_family_topk_sql(analyzer, clause_selects, k)


def dfi_topk_sql(analyzer: str, terms: list[str], k: int) -> str:
    """DFISimilarity (IndependenceStandardized) disjunction top-k — exact
    float discipline of the engine's ``score_postings_dfi``: aux =
    (ttf+1)/(sumTtf+1) in pure double, expected = aux · dl, gate freq <=
    expected -> 0, measure = (freq-expected)/sqrt(expected), score = boost
    · log2(measure+1), one f32 cast per clause, Σ double, one f32 cast."""
    clause_selects = []
    for t in terms:
        aux = (
            f"(( (SELECT count(*) FROM kept WHERE term = '{t}')::DOUBLE + 1.0 )"
            " / ( st.sum_ttf::DOUBLE + 1.0 ))"
        )
        expected = f"({aux} * any_value(n.decoded)::DOUBLE)"
        clause_selects.append(f"""
SELECT k.doc_id,
       CASE WHEN count(*)::DOUBLE <= {expected} THEN CAST(0.0 AS FLOAT)
            ELSE CAST(log2((count(*)::DOUBLE - {expected}) / sqrt({expected}) + 1.0)
                 AS FLOAT) END AS s
FROM kept k JOIN norms n USING (doc_id), statsf st
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.sum_ttf""")
    return _sim_family_topk_sql(analyzer, clause_selects, k)


def f2exp_topk_sql(
    analyzer: str, terms: list[str], k: int, s: float = 0.5, kk: float = 0.35
) -> str:
    """AxiomaticF2EXP top-k — exact float discipline of the engine's
    ``score_postings_f2exp``: idf = ((N+1)/df)^k, tfln denominator addend
    = s + s·dl/avgdl (avgdl FLOAT then double ops), score = boost · idf ·
    tf/(tf + addend), clamped at 0, one f32 cast per clause, Σ double,
    one f32 cast."""
    clause_selects = []
    for t in terms:
        aux = (
            f"pow(( st.doc_count::DOUBLE + 1.0 )"
            f" / (SELECT count(DISTINCT doc_id) FROM kept WHERE term = '{t}')::DOUBLE,"
            f" {kk!r})"
        )
        addend = (
            f"({s!r} + ({s!r} * any_value(n.decoded)::DOUBLE)"
            " / CAST(any_value(st2.avgdl) AS DOUBLE))"
        )
        clause_selects.append(f"""
SELECT k.doc_id,
       CAST(greatest({aux} * (count(*)::DOUBLE / (count(*)::DOUBLE + {addend})), 0.0)
            AS FLOAT) AS s
FROM kept k JOIN norms n USING (doc_id), statsf st, statsf st2
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.doc_count""")
    return _sim_family_topk_sql(analyzer, clause_selects, k)


def tagger_sql(analyzer: str, toks: list[tuple[int, str]]) -> str:
    """Text Tagger oracle (Solr /tag handler): the analyzed (pos, term)
    stream of the posted text — computed once at oracle-build time, the
    parse_fixture discipline — inner-joined to the dictionary docFreq the
    kept-CTE recomputes; non-dictionary tokens drop out of the join
    exactly like the engine's term_stats miss."""
    values = ", ".join(f"({p}, '{t}')" for p, t in toks)
    return f"""WITH {base_ctes(analyzer)},
q(pos, term) AS (VALUES {values}),
dfs AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept GROUP BY 1)
SELECT q.pos::INTEGER AS pos, q.term AS term, dfs.df AS df
FROM q JOIN dfs USING (term)
ORDER BY q.pos"""


def _funcexpr_scored_with(analyzer: str, expr: str, analyzed: dict) -> str:
    """Shared WITH-prefix for function-expression oracles: emits every CTE
    through ``scored(doc_id, fscore)`` — used by both the ranking oracle
    (``funcexpr_topk_sql``) and the frange filter oracle (``frange_sql``)."""
    from .search.funcquery import (
        FuncEnv, collect_scalars, collect_termfreqs, compile_sql, parse_expr,
        split_scale,
    )

    ast, scale_to = split_scale(parse_expr(expr))
    tf_ctes, tf_env, joins = [], {}, []
    for i, (field, surface) in enumerate(collect_termfreqs(ast)):
        term = analyzed[surface]
        tf_ctes.append(
            f"tf_{i} AS (SELECT doc_id, count(*)::BIGINT AS tf "
            f"FROM kept WHERE term = '{term}' GROUP BY 1)"
        )
        tf_env[(field, surface)] = f"COALESCE(tf_{i}.tf, 0)"
        joins.append(f"LEFT JOIN tf_{i} ON tf_{i}.doc_id = d.doc_id")
    scalars = {}
    for key in collect_scalars(ast):
        if key[0] in ("docfreq", "idf"):
            df_sql = (
                "(SELECT count(DISTINCT doc_id) FROM kept "
                f"WHERE term = '{analyzed[key[2]]}')"
            )
            scalars[key] = (
                df_sql if key[0] == "docfreq"
                else "ln(1.0 + ((SELECT doc_count FROM statsf)::DOUBLE "
                     f"- {df_sql} + 0.5) / ({df_sql} + 0.5))"
            )
        elif key[0] == "ttf":
            scalars[key] = (
                f"(SELECT count(*) FROM kept WHERE term = '{analyzed[key[2]]}')"
            )
        elif key[0] == "sumtotaltermfreq":
            scalars[key] = "(SELECT sum_ttf FROM statsf)"
        else:  # numdocs / maxdoc
            scalars[key] = "(SELECT doc_count FROM statsf)"
    env = FuncEnv(
        tf=tf_env,
        fields={
            "n_chars": "d.n_chars",
            ("str", "source"): "d.source",
            ("str", "lang"): "d.lang",
        },
        norms={"text": "n.decoded"}, scalars=scalars,
    )
    expr_sql = compile_sql(ast, env)
    ctes = (",\n" + ",\n".join(tf_ctes)) if tf_ctes else ""
    if scale_to is None:
        scored_cte = f"""scored AS (
    SELECT d.doc_id, CAST(({expr_sql}) AS FLOAT) AS fscore
    FROM documents d
    JOIN norms n ON n.doc_id = d.doc_id
    {' '.join(joins)}
)"""
    else:
        # scale(x, minT, maxT): global min/max window over the raw double
        # values, then the same double-arithmetic rescale the engine does
        # ((raw - min) * (hi - lo) / (max - min), left-assoc), f32 at the end
        lo, hi = (f"CAST({float(v)!r} AS DOUBLE)" for v in scale_to)
        scored_cte = f"""scored0 AS (
    SELECT d.doc_id, CAST(({expr_sql}) AS DOUBLE) AS rawv
    FROM documents d
    JOIN norms n ON n.doc_id = d.doc_id
    {' '.join(joins)}
),
scored AS (
    SELECT doc_id, CAST(CASE WHEN maxv = minv THEN {lo}
        ELSE {lo} + (rawv - minv) * ({hi} - {lo}) / (maxv - minv)
    END AS FLOAT) AS fscore
    FROM (SELECT doc_id, rawv, min(rawv) OVER () AS minv,
                 max(rawv) OVER () AS maxv FROM scored0)
)"""
    return f"""WITH {base_ctes(analyzer)}{ctes},
{scored_cte}"""


def funcexpr_topk_sql(analyzer: str, expr: str, k: int, analyzed: dict) -> str:
    """Function-query EXPRESSION oracle: the same Solr function string is
    parsed once and compiled to DuckDB SQL (``funcquery.compile_sql``) — an
    independent execution engine evaluating the identical AST. termfreq
    slots become kept-CTE per-doc aggregates, docfreq a scalar subquery,
    ``norm(field)`` the SmallFloat-DECODED length (norms CTE), and the final
    score is cast to float32 like the engine (absorbing sub-ulp libm-vs-JVM
    double differences in log/div)."""
    return f"""{_funcexpr_scored_with(analyzer, expr, analyzed)}
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, fscore::FLOAT AS fscore FROM (
    SELECT row_number() OVER (ORDER BY fscore DESC, doc_id ASC) AS rank, doc_id, fscore
    FROM scored
) WHERE rank <= {k} ORDER BY rank"""


def frange_sql(
    analyzer: str, expr: str, lower: float, upper: float, k: int,
    analyzed: dict,
) -> str:
    """Function range query oracle (``S/search/FunctionRangeQuery`` /
    ``{{!frange}}``): same compiled expression, filtered to
    [lower, upper] on the float32 value, doc-id order."""
    return f"""{_funcexpr_scored_with(analyzer, expr, analyzed)}
SELECT doc_id::BIGINT AS doc_id, fscore::FLOAT AS fscore FROM scored
WHERE fscore >= {float(lower)!r} AND fscore <= {float(upper)!r}
ORDER BY doc_id ASC LIMIT {k}"""


def suggest_sql(analyzer: str, pred: str, k: int) -> str:
    """Suggester/spellcheck oracle (``lucene/suggest`` Lookup): term
    dictionary filtered by ``pred``, ranked by docFreq desc, term asc."""
    return f"""WITH {base_ctes(analyzer)},
tsx AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept GROUP BY term)
SELECT rank::INTEGER AS rank, term, df FROM (
    SELECT row_number() OVER (ORDER BY df DESC, term ASC) AS rank, term, df
    FROM tsx WHERE {pred}
) WHERE rank <= {k} ORDER BY rank"""


def suggest_fuzzy_prefix_sql(
    analyzer: str,
    key: str,
    k: int,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
) -> str:
    """FuzzySuggester oracle: a term qualifies when it completes the key
    exactly, OR its first ``non_fuzzy_prefix`` chars match and some prefix
    whose length is within ``max_edits`` of the key's is within
    ``max_edits`` Levenshtein of the key — the same closed-form prefix
    window the engine evaluates (callers must pass len(key) >=
    minFuzzyLength; shorter keys are exact-prefix only by contract)."""
    n = len(key)
    dists = ", ".join(
        f"levenshtein(substr(term, 1, {n + off}), '{key}')"
        for off in range(-max_edits, max_edits + 1)
        if n + off > 0
    )
    return f"""WITH {base_ctes(analyzer)},
tsx AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept GROUP BY term),
cand AS (
    SELECT term, df FROM tsx
    WHERE term LIKE '{key}%'
       OR (substr(term, 1, {non_fuzzy_prefix}) = '{key[:non_fuzzy_prefix]}'
           AND least({dists}) <= {max_edits})
)
SELECT rank::INTEGER AS rank, term, df FROM (
    SELECT row_number() OVER (ORDER BY df DESC, term ASC) AS rank, term, df
    FROM cand
) WHERE rank <= {k} ORDER BY rank"""


def suggest_blended_infix_sql(analyzer: str, pattern: str, k: int) -> str:
    """BlendedInfixSuggester oracle (POSITION_LINEAR blender): score =
    df · (1 − 0.10 · matched-char-offset), the exact double expression the
    engine computes (instr is 1-based in both engines)."""
    return f"""WITH {base_ctes(analyzer)},
tsx AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept GROUP BY term),
blend AS (
    SELECT term, df,
           df::DOUBLE * (1.0 - 0.10 * (instr(term, '{pattern}') - 1)::DOUBLE) AS score
    FROM tsx WHERE term LIKE '%{pattern}%'
)
SELECT rank::INTEGER AS rank, term, df, score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, term ASC) AS rank,
           term, df, score
    FROM blend
) WHERE rank <= {k} ORDER BY rank"""


def monitor_matches_sql(analyzer: str, specs: dict) -> str:
    """lucene/monitor oracle: per stored query, the full (unranked) match
    set via the shared boolean-match CTEs, tagged with its query_id."""
    frags, selects = [], []
    for i, (qid, spec) in enumerate(sorted(specs.items())):
        p = f"mq{i}"
        frags.append(_bm25_match_ctes(spec, p))
        selects.append(
            f"SELECT '{qid}' AS query_id, doc_id FROM {p}match"
        )
    return f"""WITH {base_ctes(analyzer)},{','.join(frags)}
SELECT query_id, doc_id::BIGINT AS doc_id FROM ({' UNION ALL '.join(selects)})
ORDER BY query_id, doc_id"""


def analysis_debug_sql(text: str) -> str:
    """Field-analysis handler oracle: per-stage token stream of the stop
    chain over a literal string (tokenizer → lowercase → stopfilter,
    positions preserved across holes)."""
    esc = text.replace("'", "''")
    return f"""WITH base AS (
    SELECT unnest(regexp_extract_all('{esc}', '{TOKEN_RE_SQL}')) AS raw,
           generate_subscripts(regexp_extract_all('{esc}', '{TOKEN_RE_SQL}'), 1) - 1 AS pos
),
stages AS (
    SELECT '1_tokenizer' AS stage, pos::INTEGER AS pos, raw AS token FROM base
    UNION ALL
    SELECT '2_lowercase', pos::INTEGER, lower(raw) FROM base
    UNION ALL
    SELECT '3_stopfilter', pos::INTEGER, lower(raw) FROM base
    WHERE lower(raw) NOT IN ({_STOP_LIST_SQL})
)
SELECT stage, pos, token FROM stages ORDER BY stage, pos"""


def suggest_freetext_sql(
    analyzer: str, ctx: str, prefix: str, k: int, alpha: float = 0.4
) -> str:
    """FreeTextSuggester oracle: bigram counts from a positional self-join
    (pos+1 within doc), stupid backoff ALPHA·unigram for prefix matches
    the bigram order didn't already suggest — double divisions in the same
    op order as the engine."""
    return f"""WITH {base_ctes(analyzer)},
uni AS (SELECT term, count(*)::BIGINT AS cnt FROM kept GROUP BY term),
tot AS (SELECT sum(cnt)::BIGINT AS t FROM uni),
big AS (
    SELECT a.term AS w1, b.term AS w2, count(*)::BIGINT AS cnt
    FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY a.term, b.term
),
cands AS (
    SELECT w2 AS term,
           cnt::DOUBLE / (SELECT cnt FROM uni WHERE term = '{ctx}')::DOUBLE AS score,
           2 AS grams
    FROM big WHERE w1 = '{ctx}' AND w2 LIKE '{prefix}%'
    UNION ALL
    SELECT u.term, {float(alpha)!r} * (u.cnt::DOUBLE / t.t::DOUBLE), 1
    FROM uni u, tot t
    WHERE u.term LIKE '{prefix}%'
      AND NOT EXISTS (SELECT 1 FROM big WHERE w1 = '{ctx}' AND w2 = u.term)
)
SELECT rank::INTEGER AS rank, term, score::DOUBLE AS score, grams::INTEGER AS grams FROM (
    SELECT row_number() OVER (ORDER BY score DESC, term ASC) AS rank, term, score, grams
    FROM cands
) WHERE rank <= {k} ORDER BY rank"""


def word_break_sql(
    analyzer: str, break_input: str, combine_inputs: tuple[str, str]
) -> str:
    """WordBreakSpellChecker oracle: every split point joined twice against
    the term dictionary; combine = concatenation membership lookup."""
    splits = ", ".join(
        f"('{break_input[:i]}', '{break_input[i:]}')"
        for i in range(1, len(break_input))
    )
    cat = combine_inputs[0] + combine_inputs[1]
    return f"""WITH {base_ctes(analyzer)},
tsx AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept GROUP BY term),
splits(lterm, rterm) AS (VALUES {splits}),
brk AS (
    SELECT 'break' AS kind, s.lterm || ' ' || s.rterm AS suggestion,
           least(l.df, r.df)::BIGINT AS freq
    FROM splits s JOIN tsx l ON l.term = s.lterm JOIN tsx r ON r.term = s.rterm
),
comb AS (
    SELECT 'combine' AS kind, term AS suggestion, df::BIGINT AS freq
    FROM tsx WHERE term = '{cat}'
)
SELECT kind, suggestion, freq FROM (
    SELECT * FROM brk UNION ALL SELECT * FROM comb
) ORDER BY kind ASC, freq DESC, suggestion ASC"""


def rerank_topk_sql(
    analyzer: str, main_spec: BooleanSpec, rr_spec: BooleanSpec,
    rerank_docs: int, weight: float, k: int,
) -> str:
    """ReRank oracle (``S/search/ReRankQParserPlugin`` /
    ``L/queries/.../QueryRescorer#combine``): first-pass BM25 ranking, top
    ``rerank_docs`` candidates, combined = first + weight * rerank for
    candidates matching the rerank query (f32 per-op, engine lockstep),
    unmatched candidates keep the first-pass score; (score desc, doc_id
    asc) final tiebreak."""
    mfrag = _bm25_match_ctes(main_spec, "m")
    rfrag = _bm25_match_ctes(rr_spec, "r")
    return f"""WITH {base_ctes(analyzer)},{mfrag},{rfrag},
mranked AS (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r, doc_id, score
    FROM mmatch
),
cand AS (SELECT doc_id, score FROM mranked WHERE r <= {rerank_docs}),
comb AS (
    SELECT c.doc_id,
           CASE WHEN rm.doc_id IS NULL THEN c.score
                ELSE CAST(c.score + CAST({float(weight)!r} AS FLOAT) * rm.score AS FLOAT)
           END AS score
    FROM cand c LEFT JOIN rmatch rm ON rm.doc_id = c.doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM comb
) WHERE rank <= {k} ORDER BY rank"""


def elevate_topk_sql(
    analyzer: str, spec: BooleanSpec, elevated: list[int], k: int,
) -> str:
    """Query-elevation oracle (``S/handler/component/QueryElevationComponent``):
    configured doc ids pinned to the top in config order (present-in-corpus
    ones only — Solr drops unknown ids), the organic BM25 ranking following
    with elevated docs removed from it."""
    mfrag = _bm25_match_ctes(spec, "m")
    elev_rows = ", ".join(f"({int(d)}, {i + 1})" for i, d in enumerate(elevated))
    return f"""WITH {base_ctes(analyzer)},{mfrag},
elev(doc_id, eord) AS (VALUES {elev_rows}),
pres AS (
    SELECT e.doc_id, e.eord FROM elev e JOIN documents d ON d.doc_id = e.doc_id
),
organic AS (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
    FROM mmatch WHERE doc_id NOT IN (SELECT doc_id FROM elev)
),
unioned AS (
    SELECT doc_id, 1 AS elevated, eord AS o1, 0::BIGINT AS o2 FROM pres
    UNION ALL
    SELECT doc_id, 0 AS elevated, 2147483647 AS o1, r AS o2 FROM organic
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, elevated::INTEGER AS elevated FROM (
    SELECT row_number() OVER (ORDER BY o1 ASC, o2 ASC) AS rank, doc_id, elevated
    FROM unioned
) WHERE rank <= {k} ORDER BY rank"""

def spellcheck_collate_sql(
    analyzer: str, qterms: list[str], max_edits: int,
) -> str:
    """SpellCheck collation oracle (``S/spelling/SpellCheckCollator`` /
    ``DirectSolrSpellChecker``): per query term the best dictionary entry by
    (levenshtein asc, df desc, term asc) within ``max_edits``; the collated
    conjunction's exact hit count rides every row (Solr's verified
    collation)."""
    q_rows = ", ".join(f"({i}, '{t}')" for i, t in enumerate(qterms))
    return f"""WITH {base_ctes(analyzer)},
dict AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept GROUP BY term
),
q(qpos, qterm) AS (VALUES {q_rows}),
cand AS (
    SELECT q.qpos, q.qterm, d.term, levenshtein(d.term, q.qterm) AS dist, d.df
    FROM q JOIN dict d ON levenshtein(d.term, q.qterm) <= {max_edits}
),
best AS (
    SELECT qpos, qterm, term AS correction, dist, df FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qpos ORDER BY dist ASC, df DESC, term ASC
        ) AS rn FROM cand
    ) WHERE rn = 1
),
coll AS (
    SELECT count(*)::BIGINT AS hits FROM (
        SELECT k.doc_id FROM kept k JOIN best b ON k.term = b.correction
        GROUP BY k.doc_id
        HAVING count(DISTINCT k.term) = (SELECT count(*) FROM best)
    )
)
SELECT b.qpos::INTEGER AS qpos, b.qterm, b.correction,
       b.dist::INTEGER AS dist, b.df::BIGINT AS df,
       (SELECT hits FROM coll)::BIGINT AS collation_hits
FROM best b ORDER BY qpos"""


def term_vectors_sql(analyzer: str, doc_id: int) -> str:
    """Term-vector oracle (``S/handler/component/TermVectorComponent``):
    per-term tf + position extent for one doc, recomputed from the token
    stream the postings indexed."""
    return f"""WITH {base_ctes(analyzer)}
SELECT term, count(*)::BIGINT AS tf,
       min(pos)::INTEGER AS min_pos, max(pos)::INTEGER AS max_pos
FROM kept WHERE doc_id = {doc_id}
GROUP BY term ORDER BY term"""


def terms_enum_sql(analyzer: str, prefix: str, mincount: int, limit: int) -> str:
    """TermsComponent oracle (``S/handler/component/TermsComponent``):
    dictionary terms under a prefix with df/ttf, terms.mincount,
    terms.sort=count (df desc, term asc), terms.limit."""
    return f"""WITH {base_ctes(analyzer)}
SELECT term, df, ttf FROM (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
    FROM kept WHERE term LIKE '{prefix}%' GROUP BY term
    HAVING count(DISTINCT doc_id) >= {mincount}
) ORDER BY df DESC, term ASC LIMIT {limit}"""


def terms_enum_regex_sql(
    analyzer: str, pattern: str, mincount: int, limit: int
) -> str:
    """TermsComponent ``terms.regex`` oracle — unanchored regex search over
    the dictionary (Java regex and RE2 agree on the anchored alternation
    patterns the fixtures use), same mincount/sort/limit semantics.

    The engine side evaluates Java regex (``rlike``) while DuckDB uses RE2;
    the assertion pins the supported subset (literals, alternation, classes,
    anchors, basic quantifiers) where the two dialects agree — backrefs and
    lookaround would silently diverge."""
    assert not re.search(r"\\[0-9]|\(\?<?[=!]", pattern), (
        f"terms.regex pattern {pattern!r} uses backreferences/lookaround — "
        "outside the Java-regex/RE2 common subset the oracle supports"
    )
    quoted = pattern.replace("'", "''")
    return f"""WITH {base_ctes(analyzer)}
SELECT term, df, ttf FROM (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
    FROM kept WHERE regexp_matches(term, '{quoted}') GROUP BY term
    HAVING count(DISTINCT doc_id) >= {mincount}
) ORDER BY df DESC, term ASC LIMIT {limit}"""


def sorted_topk_sql(
    analyzer: str, spec: BooleanSpec, sort_field: str, ascending: bool, k: int,
) -> str:
    """Sort-by-field oracle (Solr ``sort=field`` / ``L/search/SortField``):
    the query picks the match set, a stored field orders it, doc id breaks
    ties; no score in the output."""
    frag = _bm25_match_ctes(spec, "")
    direction = "ASC" if ascending else "DESC"
    return f"""WITH {base_ctes(analyzer)},{frag}
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, sortval::BIGINT AS sortval FROM (
    SELECT row_number() OVER (
               ORDER BY d.{sort_field} {direction}, m.doc_id ASC
           ) AS rank,
           m.doc_id, d.{sort_field} AS sortval
    FROM match m JOIN documents d USING (doc_id)
) WHERE rank <= {k} ORDER BY rank"""


def cursor_page2_sql(
    analyzer: str, spec: BooleanSpec, sort_field: str, k: int,
) -> str:
    """cursorMark page-2 oracle: cursor continuation over a TOTAL order
    (field desc, doc_id asc) is exactly ranks (k, 2k] — the offset window
    reproduces the keyset page."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag}
SELECT (rank - {k})::INTEGER AS rank, doc_id::BIGINT AS doc_id, sortval::BIGINT AS sortval FROM (
    SELECT row_number() OVER (
               ORDER BY d.{sort_field} DESC, m.doc_id ASC
           ) AS rank,
           m.doc_id, d.{sort_field} AS sortval
    FROM match m JOIN documents d USING (doc_id)
) WHERE rank > {k} AND rank <= {2 * k} ORDER BY rank"""


def boostfunc_topk_sql(analyzer: str, spec: BooleanSpec, k: int) -> str:
    """Multiplicative boost-function oracle (edismax ``boost=`` /
    ``L/queries/function/FunctionScoreQuery``): score =
    f32( f64(bm25_f32) · (1 + n_chars/1000) ) — double IEEE ops on both
    engines, one final f32 cast."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag},
boosted AS (
    SELECT m.doc_id,
           CAST(CAST(m.score AS DOUBLE)
                * (1.0 + d.n_chars::DOUBLE / 1000.0) AS FLOAT) AS score
    FROM match m JOIN documents d USING (doc_id)
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM boosted
) WHERE rank <= {k} ORDER BY rank"""


def rtg_sql(
    analyzer: str,
    appended: list[tuple[int, str, str, str]],
    keys: list[int],
) -> str:
    """RealTime Get oracle (``S/handler/component/RealTimeGetComponent``):
    the live corpus = source ``documents`` UNION the soft-committed appended
    batch (inlined as VALUES, lengths recomputed with the same token rule);
    each requested key reports (found, stored fields, indexed length)."""
    app_rows = ", ".join(
        f"({k}, '{s}', '{lg}', '{t}')" for k, s, lg, t in appended
    )
    q_rows = ", ".join(f"({i}, {k})" for i, k in enumerate(keys))
    return f"""WITH {base_ctes(analyzer)},
app(doc_key, source, lang, text) AS (VALUES {app_rows}),
app_len AS (
    SELECT doc_key, source, lang,
           len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))::BIGINT AS length
    FROM app
),
live AS (
    SELECT d.doc_id AS doc_key, d.source, d.lang, dl.length
    FROM documents d JOIN doclen dl ON dl.doc_id = d.doc_id
    UNION ALL
    SELECT doc_key, source, lang, length FROM app_len
),
q(qpos, doc_key) AS (VALUES {q_rows})
SELECT q.qpos::INTEGER AS qpos, q.doc_key::BIGINT AS doc_key,
       (CASE WHEN l.length IS NOT NULL THEN 1 ELSE 0 END)::INTEGER AS found,
       l.source, l.lang, l.length::BIGINT AS length
FROM q LEFT JOIN live l USING (doc_key) ORDER BY qpos"""


def span_first_topk_sql(
    analyzer: str, term: str, end: int, k: int, start: int = 0,
) -> str:
    """SpanFirstQuery / SpanPositionRangeQuery oracle
    (``L/search/spans/SpanFirstQuery``, ``SpanPositionRangeQuery`` +
    ``SpanScorer#setFreqCurrentDoc``): tf = occurrences in position window
    [start, end) (term span at pos p ends at p+1 → keep pos < end); score =
    BM25 with that window tf and weight = idf(term) — identical f32 op
    order to the engine kernel."""
    return f"""WITH {base_ctes(analyzer)},
sfq AS (
    SELECT k.doc_id,
           CAST({_idf_expr(term)}
                * CAST(count(*)::DOUBLE / (count(*)::DOUBLE + CAST(any_value(c.cache) AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM kept k JOIN cachec c USING (doc_id), statsf st
    WHERE k.term = '{term}' AND k.pos >= {start} AND k.pos < {end}
    GROUP BY k.doc_id, st.doc_count
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM sfq
) WHERE rank <= {k} ORDER BY rank"""


def span_near_topk_sql(
    analyzer: str, t0: str, t1: str, slop: int, k: int
) -> str:
    """SpanNearQuery oracle (``L/search/spans/NearSpansOrdered`` +
    ``SpanScorer#setFreqCurrentDoc``): one candidate span per occurrence p0
    of the first term, paired with the nearest following p1 of the second
    (min over p1 > p0); width = p1 − p0 − 1; matches (width <= slop)
    contribute f32 1/(1+width), summed in DOUBLE with one final f32 cast —
    the engine kernel's exact float discipline. Weight and BM25 op order
    reuse the phrase-clause shape (f32 Σ idf, f64 ratio, f32 casts)."""
    idf_sum = " + ".join(
        f"CAST({_idf_expr(t)} AS DOUBLE)" for t in (t0, t1)
    )
    return f"""WITH {base_ctes(analyzer)},
sn0 AS (SELECT doc_id, pos FROM kept WHERE term = '{t0}'),
sn1 AS (SELECT doc_id, pos FROM kept WHERE term = '{t1}'),
spans AS (
    SELECT a.doc_id, a.pos AS p0, min(b.pos) AS p1
    FROM sn0 a JOIN sn1 b ON b.doc_id = a.doc_id AND b.pos > a.pos
    GROUP BY a.doc_id, a.pos
),
sfreq AS (
    SELECT doc_id,
           CAST(sum(CAST(CAST(1.0 AS FLOAT)
                         / (CAST(1.0 AS FLOAT) + CAST(p1 - p0 - 1 AS FLOAT))
                     AS DOUBLE)) AS FLOAT) AS freq
    FROM spans WHERE p1 - p0 - 1 <= {slop} GROUP BY doc_id
),
snhits AS (
    SELECT f.doc_id,
           CAST(CAST({idf_sum} AS FLOAT)
                * CAST(CAST(f.freq AS DOUBLE)
                       / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM sfreq f JOIN cachec c USING (doc_id), statsf st
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM snhits
) WHERE rank <= {k} ORDER BY rank"""


def covering_topk_sql(
    analyzer: str, terms: list[str], mod: int, k: int
) -> str:
    """CoveringQuery oracle: per-doc matching-clause count gated by the
    LongValuesSource threshold 1 + (docID mod ``mod``); the engine's
    numeric docvalue is the dense doc-key rank, which equals ``doc_id`` on
    this corpus (dense 0..N−1 keys → rank = key), so the oracle reads the
    threshold straight off ``doc_id``. Score = Σ matching clause f32
    scores in DOUBLE, one final f32 cast (CoveringScorer sums its
    sub-scorers, the boolean-combine discipline)."""
    pred = "term IN (" + ", ".join(f"'{t}'" for t in terms) + ")"
    return f"""WITH {base_ctes(analyzer)},{_disjunction_core(pred)},
hits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score
    FROM sc GROUP BY doc_id
    HAVING count(*) >= 1 + (doc_id % {mod})
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def surround_or_topk_sql(
    analyzer: str, clauses: list[tuple], k: int
) -> str:
    """Surround OR-query oracle: each clause is ``("w", t0, t1, slop)``
    (ordered span near — the span_near_topk_sql spans rule), ``("n", t0,
    t1, slop)`` (unordered — each occurrence of t0 pairs with the first
    t1 ≥ it, each t1 with the first t0 strictly after it, width = gap − 1
    clamped at 0 for the slop factor: the NearSpansUnordered start-order
    walk), or ``("term", t)``. Per clause: f32 slop factors summed in
    DOUBLE → f32 freq → f32(w · f32(freq/(freq+cache))) with w = f32(Σ idf)
    over the clause terms; clause scores Σ in DOUBLE per doc, one final
    f32 cast, (score desc, doc asc)."""
    sels = []
    for ci, cl in enumerate(clauses):
        if cl[0] == "term":
            t = cl[1]
            sels.append(f"""
    SELECT t.doc_id, CAST(
        CAST({_idf_expr(t)} AS FLOAT)
        * CAST(t.tf::DOUBLE / (t.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT)
        AS FLOAT) AS s
    FROM (SELECT doc_id, count(*)::BIGINT AS tf FROM kept
          WHERE term = '{t}' GROUP BY doc_id) t
    JOIN cachec c USING (doc_id), statsf st""")
            continue
        kind, t0, t1, slop = cl
        idf_sum = " + ".join(
            f"CAST({_idf_expr(t)} AS DOUBLE)" for t in (t0, t1)
        )
        if kind == "w":
            matches = f"""
        SELECT a.doc_id, mn.p1 - a.pos - 1 AS width
        FROM (SELECT doc_id, pos FROM kept WHERE term = '{t0}') a
        JOIN LATERAL (
            SELECT min(b.pos) AS p1 FROM kept b
            WHERE b.term = '{t1}' AND b.doc_id = a.doc_id AND b.pos > a.pos
        ) mn ON mn.p1 IS NOT NULL
        WHERE mn.p1 - a.pos - 1 <= {slop}"""
        else:
            matches = f"""
        SELECT a.doc_id, mn.pb - a.pos - 1 AS width
        FROM (SELECT doc_id, pos FROM kept WHERE term = '{t0}') a
        JOIN LATERAL (
            SELECT min(b.pos) AS pb FROM kept b
            WHERE b.term = '{t1}' AND b.doc_id = a.doc_id AND b.pos >= a.pos
        ) mn ON mn.pb IS NOT NULL
        WHERE mn.pb - a.pos - 1 <= {slop}
        UNION ALL
        SELECT b.doc_id, mn.pa - b.pos - 1 AS width
        FROM (SELECT doc_id, pos FROM kept WHERE term = '{t1}') b
        JOIN LATERAL (
            SELECT min(a.pos) AS pa FROM kept a
            WHERE a.term = '{t0}' AND a.doc_id = b.doc_id AND a.pos > b.pos
        ) mn ON mn.pa IS NOT NULL
        WHERE mn.pa - b.pos - 1 <= {slop}"""
        sels.append(f"""
    SELECT f.doc_id, CAST(
        CAST({idf_sum} AS FLOAT)
        * CAST(CAST(f.freq AS DOUBLE)
               / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE)) AS FLOAT)
        AS FLOAT) AS s
    FROM (
        SELECT doc_id,
               CAST(sum(CAST(CAST(1.0 AS FLOAT)
                             / (CAST(1.0 AS FLOAT)
                                + CAST(greatest(width, 0) AS FLOAT))
                         AS DOUBLE)) AS FLOAT) AS freq
        FROM ({matches}) m{ci} GROUP BY doc_id
    ) f
    JOIN cachec c USING (doc_id), statsf st""")
    return _sim_family_topk_sql(analyzer, sels, k)


def fuzzy_blended_topk_sql(
    analyzer: str, target: str, max_edits: int, max_expansions: int, k: int
) -> str:
    """Blended FuzzyQuery oracle (``TopTermsBlendedFreqScoringRewrite`` +
    ``FuzzyTermsEnum``): the expansion, the per-term boost
    (f32 1 − ed/min(len,len), float div then float sub), the df blend
    (max df over the kept expansion), and the member scoring are ALL
    derived independently in SQL from the token stream — nothing is fed
    from the engine side. Member score = f32(w · f32(tf/(tf+cache))) with
    w = boost_f32 · idf(df_blend)_f32; per-doc Σ double, one f32 cast."""
    tlen = len(target)
    return f"""WITH {base_ctes(analyzer)},
fzdict AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df
    FROM kept GROUP BY term
),
fzexp AS (
    SELECT term, df,
           CAST(1.0 AS FLOAT)
             - (CAST(levenshtein(term, '{target}') AS FLOAT)
                / CAST(least(length(term), {tlen}) AS FLOAT)) AS boost
    FROM fzdict WHERE levenshtein(term, '{target}') <= {max_edits}
),
fzt AS (
    SELECT term, df, boost FROM fzexp
    ORDER BY boost DESC, term ASC LIMIT {max_expansions}
),
fzblend AS (SELECT max(df) AS dfb FROM fzt),
fzidf AS (
    SELECT CAST(ln(1.0 + (st.doc_count - b.dfb + 0.5) / (b.dfb + 0.5))
           AS FLOAT) AS idfb
    FROM statsf st, fzblend b
),
fzmember AS (
    SELECT k.doc_id,
           CAST((any_value(f.boost) * (SELECT idfb FROM fzidf))
                * CAST(count(*)::DOUBLE / (count(*)::DOUBLE + CAST(any_value(c.cache) AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS s
    FROM kept k
    JOIN fzt f ON f.term = k.term
    JOIN cachec c ON c.doc_id = k.doc_id
    GROUP BY k.doc_id, k.term
),
fzhits AS (
    SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score
    FROM fzmember GROUP BY doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM fzhits
) WHERE rank <= {k} ORDER BY rank"""


def span_near_or_topk_sql(
    analyzer: str, slot0: tuple, slot1: tuple, slop: int, k: int
) -> str:
    """Nested-span oracle (``SpanNearQuery`` over two ``SpanOrQuery``
    operands): each operand's occurrences = union of its member terms'
    positions; the ordered matcher and slop-factor freq are the flat
    span-near recurrence; weight = f32(Σ_double per-term f32 idf) over the
    LIVE members of both operands (dead members +0.0)."""
    inl0 = ", ".join(f"'{t}'" for t in slot0)
    inl1 = ", ".join(f"'{t}'" for t in slot1)
    idf_sum = " + ".join(
        f"(CASE WHEN EXISTS (SELECT 1 FROM kept WHERE term = '{t}')"
        f" THEN CAST({_idf_expr(t)} AS DOUBLE) ELSE 0 END)"
        for t in (*slot0, *slot1)
    )
    return f"""WITH {base_ctes(analyzer)},
sno0 AS (SELECT DISTINCT doc_id, pos FROM kept WHERE term IN ({inl0})),
sno1 AS (SELECT DISTINCT doc_id, pos FROM kept WHERE term IN ({inl1})),
spans AS (
    SELECT a.doc_id, a.pos AS p0, min(b.pos) AS p1
    FROM sno0 a JOIN sno1 b ON b.doc_id = a.doc_id AND b.pos > a.pos
    GROUP BY a.doc_id, a.pos
),
sfreq AS (
    SELECT doc_id,
           CAST(sum(CAST(CAST(1.0 AS FLOAT)
                         / (CAST(1.0 AS FLOAT) + CAST(p1 - p0 - 1 AS FLOAT))
                     AS DOUBLE)) AS FLOAT) AS freq
    FROM spans WHERE p1 - p0 - 1 <= {slop} GROUP BY doc_id
),
snohits AS (
    SELECT f.doc_id,
           CAST(CAST({idf_sum} AS FLOAT)
                * CAST(CAST(f.freq AS DOUBLE)
                       / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM sfreq f JOIN cachec c USING (doc_id), statsf st
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM snohits
) WHERE rank <= {k} ORDER BY rank"""


def span_multiterm_topk_sql(
    analyzer: str, pred: str, other: str, slop: int, k: int
) -> str:
    """SpanMultiTermQueryWrapper oracle: slot0 is derived FROM the token
    stream's own dictionary by ``pred`` (the rewrite is reproduced in SQL —
    nothing fed from the engine side), slot1 is the single trailing term;
    matching is the nested-span union rule (span_near_or). Weight =
    f32(Σ idf) over the expansion + other; the Σ runs in DOUBLE over f32
    idfs — exact regardless of order (f32 values are exact in f64), so the
    set-sum here equals the engine's tuple-ordered fold bitwise."""
    idf_from_df = (
        "CAST(ln(1.0 + (st.doc_count - df + 0.5) / (df + 0.5)) AS FLOAT)"
    )
    return f"""WITH {base_ctes(analyzer)},
smd AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept GROUP BY term),
sms AS (SELECT term, df FROM smd WHERE {pred}),
smw AS (
    SELECT CAST(
        (SELECT sum(CAST({idf_from_df} AS DOUBLE)) FROM sms, statsf st)
        + (SELECT CAST({idf_from_df} AS DOUBLE)
           FROM smd, statsf st WHERE term = '{other}')
    AS FLOAT) AS w
),
sm0 AS (SELECT DISTINCT doc_id, pos FROM kept
        WHERE term IN (SELECT term FROM sms)),
sm1 AS (SELECT doc_id, pos FROM kept WHERE term = '{other}'),
smspans AS (
    SELECT a.doc_id, a.pos AS p0, min(b.pos) AS p1
    FROM sm0 a JOIN sm1 b ON b.doc_id = a.doc_id AND b.pos > a.pos
    GROUP BY a.doc_id, a.pos
),
smfreq AS (
    SELECT doc_id,
           CAST(sum(CAST(CAST(1.0 AS FLOAT)
                         / (CAST(1.0 AS FLOAT) + CAST(p1 - p0 - 1 AS FLOAT))
                     AS DOUBLE)) AS FLOAT) AS freq
    FROM smspans WHERE p1 - p0 - 1 <= {slop} GROUP BY doc_id
),
smhits AS (
    SELECT f.doc_id,
           CAST(w.w * CAST(CAST(f.freq AS DOUBLE)
                           / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE))
                       AS FLOAT) AS FLOAT) AS score
    FROM smfreq f JOIN cachec c USING (doc_id), smw w
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM smhits
) WHERE rank <= {k} ORDER BY rank"""


def span_not_topk_sql(
    analyzer: str, include: str, exclude: str, pre: int, post: int, k: int
) -> str:
    """SpanNotQuery oracle (``L/search/spans/SpanNotQuery``): an include
    occurrence at position p survives unless some exclude occurrence q has
    p − pre <= q <= p + post; tf = surviving occurrence count (each width-0
    surviving span contributes slop factor 1); score = BM25 with weight =
    idf(include) — SpanWeight builds its SimWeight from the include side's
    stats only. Identical f32 op order to the span-first oracle."""
    return f"""WITH {base_ctes(analyzer)},
sni AS (SELECT doc_id, pos FROM kept WHERE term = '{include}'),
sne AS (SELECT doc_id, pos FROM kept WHERE term = '{exclude}'),
surv AS (
    SELECT i.doc_id, i.pos
    FROM sni i
    WHERE NOT EXISTS (
        SELECT 1 FROM sne e
        WHERE e.doc_id = i.doc_id
          AND e.pos >= i.pos - {pre} AND e.pos <= i.pos + {post}
    )
),
snq AS (
    SELECT s.doc_id,
           CAST({_idf_expr(include)}
                * CAST(count(*)::DOUBLE / (count(*)::DOUBLE + CAST(any_value(c.cache) AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM surv s JOIN cachec c USING (doc_id), statsf st
    GROUP BY s.doc_id, st.doc_count
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM snq
) WHERE rank <= {k} ORDER BY rank"""


def span_or_topk_sql(analyzer: str, terms: tuple, k: int) -> str:
    """SpanOrQuery oracle (``L/search/spans/SpanOrQuery``): tf = total
    occurrences of ANY member term (positions unique per occurrence → no
    span dedup); weight = f32(Σ_double per-term f32 idf) over LIVE members
    (dead members +0.0); BM25 on the summed tf — identical f32 op order to
    the phrase-clause oracle."""
    inl = ", ".join(f"'{t}'" for t in terms)
    idf_sum = " + ".join(
        f"(CASE WHEN EXISTS (SELECT 1 FROM kept WHERE term = '{t}')"
        f" THEN CAST({_idf_expr(t)} AS DOUBLE) ELSE 0 END)"
        for t in terms
    )
    return f"""WITH {base_ctes(analyzer)},
sor AS (
    SELECT k.doc_id, count(*)::BIGINT AS tf
    FROM kept k WHERE k.term IN ({inl}) GROUP BY k.doc_id
),
sorq AS (
    SELECT s.doc_id,
           CAST(CAST({idf_sum} AS FLOAT)
                * CAST(s.tf::DOUBLE / (s.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM sor s JOIN cachec c USING (doc_id), statsf st
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM sorq
) WHERE rank <= {k} ORDER BY rank"""


def constant_score_sql(analyzer: str, spec: BooleanSpec, boost: float, k: int) -> str:
    """ConstantScoreQuery oracle (``L/search/ConstantScoreQuery``): the
    wrapped query's match set (same occur/minShouldMatch/MUST_NOT CTEs as
    the BM25 oracle), every row scored ``boost``, doc-id order."""
    frag = _bm25_match_ctes(spec, "")
    if frag.startswith("match AS ("):
        return "SELECT 1::BIGINT AS doc_id, 1.0::FLOAT AS score WHERE FALSE"
    return f"""WITH {base_ctes(analyzer)},{frag}
SELECT doc_id::BIGINT AS doc_id, CAST({float(boost)!r} AS FLOAT) AS score
FROM match ORDER BY doc_id ASC LIMIT {k}"""


def blockjoin_scores_sql(analyzer: str, spec: BooleanSpec, n_groups: int) -> str:
    """ToParentBlockJoin score-mode oracle (ScoreMode Max/Total/Avg):
    Total reproduces the engine's deterministic left fold — child f32
    scores widened to DOUBLE, summed in doc_id order via ``list_reduce``
    over an ordered ``list()`` aggregate (0.0 + x == x in IEEE, so the
    fold seeds agree); Avg = total/count in double; one f32 cast each."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag},
children AS (
    SELECT d.source, m.doc_id, m.score::FLOAT AS score
    FROM match m JOIN documents d USING (doc_id)
),
agg AS (
    SELECT source,
           max(score)::FLOAT AS score_max,
           list_reduce(list(CAST(score AS DOUBLE) ORDER BY doc_id),
                       (a, b) -> a + b) AS total_d,
           count(*)::BIGINT AS n_children
    FROM children GROUP BY source
)
SELECT source, score_max,
       CAST(total_d AS FLOAT) AS score_total,
       CAST(total_d / n_children::DOUBLE AS FLOAT) AS score_avg,
       n_children
FROM agg ORDER BY score_total DESC, source ASC LIMIT {n_groups}"""


def _feature_expr_topk_sql(
    analyzer: str, spec: BooleanSpec, feat_expr: str, k: int
) -> str:
    """Shared FeatureField oracle: score = f32(f64(bm25_f32) + feat_expr),
    feat_expr a SQL expression over ``d.n_chars`` — double IEEE ops on
    both engines, one final f32 cast."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag},
feat AS (
    SELECT m.doc_id,
           CAST(CAST(m.score AS DOUBLE) + {feat_expr} AS FLOAT) AS score
    FROM match m JOIN documents d USING (doc_id)
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM feat
) WHERE rank <= {k} ORDER BY rank"""


def feature_topk_sql(
    analyzer: str, spec: BooleanSpec, pivot: float, boost: float, k: int
) -> str:
    """FeatureField saturation-query oracle (newSaturationQuery)."""
    return _feature_expr_topk_sql(
        analyzer, spec,
        f"{float(boost)!r} * (d.n_chars::DOUBLE"
        f" / (d.n_chars::DOUBLE + {float(pivot)!r}))",
        k,
    )


def feature_log_topk_sql(
    analyzer: str, spec: BooleanSpec, scale: float, boost: float, k: int
) -> str:
    """FeatureField newLogQuery oracle: boost · ln(scale + x)."""
    return _feature_expr_topk_sql(
        analyzer, spec,
        f"{float(boost)!r} * ln({float(scale)!r} + d.n_chars::DOUBLE)",
        k,
    )


def feature_sigmoid_topk_sql(
    analyzer: str, spec: BooleanSpec, pivot: float, a: float, boost: float, k: int
) -> str:
    """FeatureField newSigmoidQuery oracle: boost · x^a/(x^a + pivot^a) —
    pivot^a is folded to a double constant like the engine does."""
    pa_ = float(pivot) ** float(a)
    return _feature_expr_topk_sql(
        analyzer, spec,
        f"{float(boost)!r} * (pow(d.n_chars::DOUBLE, {float(a)!r})"
        f" / (pow(d.n_chars::DOUBLE, {float(a)!r}) + {pa_!r}))",
        k,
    )


def rrf_topk_sql(
    analyzer: str, spec1: BooleanSpec, spec2: BooleanSpec,
    n: int, k0: int, k: int,
) -> str:
    """Reciprocal Rank Fusion oracle: each leg's rank is the BM25 oracle's
    row_number (score desc, doc_id asc) cut at n; fused =
    Σ 1/(k0 + rank) in double (integer ranks ⇒ bitwise-deterministic)."""
    frag1 = _bm25_match_ctes(spec1, "a")
    frag2 = _bm25_match_ctes(spec2, "b")
    return f"""WITH {base_ctes(analyzer)},{frag1},{frag2},
ar AS (
    SELECT doc_id, rnk FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM amatch
    ) WHERE rnk <= {n}
),
br AS (
    SELECT doc_id, rnk FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM bmatch
    ) WHERE rnk <= {n}
),
fused AS (
    SELECT doc_id,
           COALESCE(1.0 / ({float(k0)!r} + x.rnk::DOUBLE), 0.0)
         + COALESCE(1.0 / ({float(k0)!r} + y.rnk::DOUBLE), 0.0) AS score
    FROM ar x FULL OUTER JOIN br y USING (doc_id)
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::DOUBLE AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM fused
) WHERE rank <= {k} ORDER BY rank"""


def ltr_rescore_sql(
    analyzer: str, spec: BooleanSpec, feature_term: str,
    weights: tuple, rerank_docs: int, k: int,
) -> str:
    """LTR LinearModel oracle (Solr ``contrib/ltr`` LTRScoringQuery +
    LinearModel): first-pass BM25 top-N candidates, features =
    (originalScore, termfreq, n_chars), rescored ``w0·orig + w1·ln(1+tf) +
    w2·(n_chars/1000)`` in double with the engine's exact op order, one
    final f32 cast; (ltr_score desc, doc_id asc)."""
    mfrag = _bm25_match_ctes(spec, "m")
    w0, w1, w2 = (float(w) for w in weights)
    return f"""WITH {base_ctes(analyzer)},{mfrag},
mranked AS (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r, doc_id, score
    FROM mmatch
),
cand AS (SELECT doc_id, score FROM mranked WHERE r <= {rerank_docs}),
ftf AS (
    SELECT doc_id, count(*)::BIGINT AS tf FROM kept
    WHERE term = '{feature_term}' GROUP BY 1
),
scored AS (
    SELECT c.doc_id,
           CAST({w0!r} * CAST(c.score AS DOUBLE)
                + {w1!r} * ln(1.0 + COALESCE(f.tf, 0)::DOUBLE)
                + {w2!r} * (d.n_chars::DOUBLE / 1000.0) AS FLOAT) AS ltr_score
    FROM cand c
    LEFT JOIN ftf f ON f.doc_id = c.doc_id
    JOIN documents d ON d.doc_id = c.doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, ltr_score::FLOAT AS ltr_score FROM (
    SELECT row_number() OVER (ORDER BY ltr_score DESC, doc_id ASC) AS rank, doc_id, ltr_score
    FROM scored
) WHERE rank <= {k} ORDER BY rank"""


def ltr_feature_log_sql(
    analyzer: str, spec: BooleanSpec, feature_term: str, k: int,
) -> str:
    """LTR feature-logging oracle ([features] transformer): first-pass
    BM25 top-k with each extractor's f32 value as a column — the exact
    doubles the LinearModel oracle consumes, logged instead of combined."""
    mfrag = _bm25_match_ctes(spec, "m")
    return f"""WITH {base_ctes(analyzer)},{mfrag},
mranked AS (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM mmatch
),
cand AS (SELECT rank, doc_id, score FROM mranked WHERE rank <= {k}),
ftf AS (
    SELECT doc_id, count(*)::BIGINT AS tf FROM kept
    WHERE term = '{feature_term}' GROUP BY 1
)
SELECT c.rank::INTEGER AS rank, c.doc_id::BIGINT AS doc_id,
       c.score::FLOAT AS f_original,
       CAST(ln(1.0 + COALESCE(f.tf, 0)::DOUBLE) AS FLOAT) AS f_logtf,
       CAST(d.n_chars::DOUBLE / 1000.0 AS FLOAT) AS f_nchars
FROM cand c
LEFT JOIN ftf f ON f.doc_id = c.doc_id
JOIN documents d ON d.doc_id = c.doc_id
ORDER BY rank"""


def common_terms_topk_sql(
    analyzer: str, qterms: list[str], max_df_ratio: float, k: int,
) -> str:
    """CommonTermsQuery oracle (``lucene/queries/.../CommonTermsQuery``):
    the df-vs-cutoff split is recomputed IN SQL (df > ratio·docCount ⇒
    optional, else required), docs must contain every required term, score
    = Σ f32 clause scores over all matched query terms (double sum, one f32
    cast); all-common falls back to minShouldMatch=1 disjunction."""
    pred = "term IN (" + ", ".join(f"'{t}'" for t in qterms) + ")"
    return f"""WITH {base_ctes(analyzer)},{_disjunction_core(pred)},
cls AS (
    SELECT q.term, (q.df > {max_df_ratio!r} * st.doc_count) AS is_common
    FROM qt q, statsf st
),
nmust AS (SELECT count(*) FILTER (WHERE NOT is_common)::BIGINT AS n FROM cls),
agg AS (
    SELECT t.doc_id,
           count(DISTINCT t.term) FILTER (WHERE NOT c.is_common) AS must_hit,
           count(DISTINCT t.term) AS any_hit
    FROM tfq t JOIN cls c USING (term) GROUP BY t.doc_id
),
hits AS (
    SELECT a.doc_id, CAST(sum(CAST(s.s AS DOUBLE)) AS FLOAT) AS score
    FROM agg a JOIN sc s USING (doc_id), nmust m
    WHERE (m.n > 0 AND a.must_hit = m.n) OR (m.n = 0 AND a.any_hit >= 1)
    GROUP BY a.doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def phrase_prefix_topk_sql(
    analyzer: str, head_terms: tuple[str, ...], prefix: str, k: int,
    max_expansions: int = 50,
) -> str:
    """Phrase-prefix oracle (``L/search/PhraseWildcardQuery`` /
    MultiPhrasePrefixQuery shape): leading exact slots + a last slot
    expanded from the term dictionary by ``prefix`` (sorted, capped at
    ``max_expansions``), scored as a MultiPhraseQuery — tf = matching start
    positions, weight = f32(Σ_double f32 idf) with the head terms first and
    the expansion summed in sorted-term order (DuckDB ordered aggregate =
    the engine's sorted-expansion fold)."""
    joins = []
    for j in range(1, len(head_terms)):
        joins.append(
            f"JOIN kept k{j} ON k{j}.doc_id = k0.doc_id "
            f"AND k{j}.pos = k0.pos + {j} AND k{j}.term = '{head_terms[j]}'"
        )
    last = len(head_terms)
    joins.append(
        f"JOIN kept k{last} ON k{last}.doc_id = k0.doc_id "
        f"AND k{last}.pos = k0.pos + {last} "
        f"AND k{last}.term IN (SELECT term FROM expn)"
    )
    head_idf = " + ".join(
        f"CAST({_idf_expr(t)} AS DOUBLE)" for t in head_terms
    )
    head_exists = " AND ".join(
        f"EXISTS (SELECT 1 FROM kept WHERE term = '{t}')" for t in head_terms
    )
    return f"""WITH {base_ctes(analyzer)},
expn AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df
    FROM kept WHERE term LIKE '{prefix}%'
    GROUP BY term ORDER BY term LIMIT {max_expansions}
),
expw AS (
    SELECT COALESCE(sum(
        CAST(CAST(ln(1.0 + (st.doc_count - e.df + 0.5) / (e.df + 0.5)) AS FLOAT) AS DOUBLE)
        ORDER BY e.term), 0) AS w
    FROM expn e, statsf st
),
mph AS (
    SELECT k0.doc_id, count(*)::BIGINT AS tf
    FROM kept k0 {' '.join(joins)}
    WHERE k0.term = '{head_terms[0]}'
    GROUP BY k0.doc_id
),
hits AS (
    SELECT p.doc_id,
           CAST(CAST({head_idf} + (SELECT w FROM expw) AS FLOAT)
                * CAST(p.tf::DOUBLE / (p.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM mph p JOIN cachec c USING (doc_id), statsf st
    WHERE {head_exists}
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def complex_phrase_topk_sql(
    analyzer: str, parts: list[tuple[str, str]], k: int,
    max_expansions: int = 50,
) -> str:
    """ComplexPhraseQueryParser oracle (``L/queryparser/complexPhrase/
    ComplexPhraseQueryParser.java``): each ``("like", pat)`` slot is the
    dictionary expansion (sorted, capped at ``max_expansions``) and each
    ``("term", t)`` slot an exact term; scored as a MultiPhraseQuery —
    tf = matching start positions, weight = f32 of the float64 fold of
    per-member f32 idfs in slot order (expansion members in sorted-term
    order, the engine's ``expand_terms`` order — DuckDB ordered aggregate
    = the engine's sorted-expansion fold)."""
    expn_ctes, w_chain, slot_conds, exists = [], [], [], []
    for j, (kind, val) in enumerate(parts):
        if kind == "like":
            expn_ctes.append(f"""
expn{j} AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df
    FROM kept WHERE term LIKE '{val}'
    GROUP BY term ORDER BY term LIMIT {max_expansions}
),
expw{j} AS (
    SELECT COALESCE(sum(
        CAST(CAST(ln(1.0 + (st.doc_count - e.df + 0.5) / (e.df + 0.5)) AS FLOAT) AS DOUBLE)
        ORDER BY e.term), 0) AS w
    FROM expn{j} e, statsf st
)""")
            w_chain.append(f"(SELECT w FROM expw{j})")
            slot_conds.append(f"k{j}.term IN (SELECT term FROM expn{j})")
            exists.append(f"EXISTS (SELECT 1 FROM expn{j})")
        else:
            w_chain.append(f"CAST({_idf_expr(val)} AS DOUBLE)")
            slot_conds.append(f"k{j}.term = '{val}'")
            exists.append(f"EXISTS (SELECT 1 FROM kept WHERE term = '{val}')")
    joins = " ".join(
        f"JOIN kept k{j} ON k{j}.doc_id = k0.doc_id AND k{j}.pos = k0.pos + {j} "
        f"AND {slot_conds[j]}"
        for j in range(1, len(parts))
    )
    expn_frag = (",".join(expn_ctes) + ",") if expn_ctes else ""
    return f"""WITH {base_ctes(analyzer)},{expn_frag}
mph AS (
    SELECT k0.doc_id, count(*)::BIGINT AS tf
    FROM kept k0 {joins}
    WHERE {slot_conds[0]}
    GROUP BY k0.doc_id
),
hits AS (
    SELECT p.doc_id,
           CAST(CAST({' + '.join(w_chain)} AS FLOAT)
                * CAST(p.tf::DOUBLE / (p.tf::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM mph p JOIN cachec c USING (doc_id), statsf st
    WHERE {' AND '.join(exists)}
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM hits
) WHERE rank <= {k} ORDER BY rank"""


def facet_on_query_sql(
    analyzer: str, spec: BooleanSpec, facet_col: str, limit: int,
) -> str:
    """Facet-over-query-DocSet oracle (``S/request/SimpleFacets``): the main
    query's match CTE joined to the stored field, bucket counts top-N by
    (count desc, value asc)."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag}
SELECT d.{facet_col} AS bucket, count(*)::BIGINT AS cnt
FROM match m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY 1 ORDER BY cnt DESC, bucket ASC LIMIT {limit}"""


def group_facet_sql(
    analyzer: str, spec: BooleanSpec, group_col: str, facet_col: str,
    limit: int,
) -> str:
    """Grouped-facet oracle (``group.facet=true`` — ``S/search/
    Grouping.java``): per facet bucket, the count of DISTINCT groups with
    at least one matching doc."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag}
SELECT d.{facet_col} AS bucket, count(DISTINCT d.{group_col})::BIGINT AS cnt
FROM match m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY 1 ORDER BY cnt DESC, bucket ASC LIMIT {limit}"""


def facet_block_children_sql(
    analyzer: str, spec: BooleanSpec, facet_col: str,
) -> str:
    """Block-children domain-switch facet oracle
    (``S/search/facet/FacetRequest`` ``domain:{blockChildren:...}``): the
    query's match CTE selects parents (distinct ``source`` groups of
    matched docs); the facet counts over ALL docs of those groups."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag},
parents AS (
    SELECT DISTINCT d.source FROM match m JOIN documents d ON d.doc_id = m.doc_id
)
SELECT d.{facet_col} AS bucket, count(*)::BIGINT AS cnt
FROM documents d JOIN parents p ON d.source = p.source
GROUP BY 1 ORDER BY cnt DESC, bucket ASC"""


def stats_on_query_sql(
    analyzer: str, spec: BooleanSpec, stat_col: str,
) -> str:
    """Stats-over-query-DocSet oracle (``S/handler/component/
    StatsComponent``): one aggregate row over the match CTE joined to the
    stored field; exact DECIMAL sum, mean = sum/count in double."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag},
st2 AS (
    SELECT count(*)::BIGINT AS cnt,
           min(d.{stat_col})::BIGINT AS min_v,
           max(d.{stat_col})::BIGINT AS max_v,
           CAST(sum(CAST(d.{stat_col} AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
    FROM match m JOIN documents d ON d.doc_id = m.doc_id
)
SELECT cnt, min_v, max_v, sum_v, sum_v / CAST(cnt AS DOUBLE) AS mean_v FROM st2"""


def join_filter_topk_sql(
    analyzer: str, spec: BooleanSpec, inner_terms: list[str],
    from_col: str, to_col: str, k: int, inner_occur: str = "and",
) -> str:
    """Query-time join FILTER oracle (Solr ``{!join from= to=}`` /
    ``lucene/join/.../JoinUtil.java`` ScoreMode.None): the outer BM25 top-k
    restricted to docs whose ``to_col`` value appears among the from-values
    of docs matching the inner query (presence semantics — the join filter
    is non-scoring, so inner scores are irrelevant). ``inner_occur``:
    'and' = conjunction of the inner terms, 'or' = disjunction."""
    inl = ", ".join(f"'{t}'" for t in inner_terms)
    if inner_occur == "and":
        inner_docs = (
            f"SELECT doc_id FROM kept WHERE term IN ({inl}) "
            f"GROUP BY doc_id HAVING count(DISTINCT term) = {len(inner_terms)}"
        )
    else:
        inner_docs = f"SELECT DISTINCT doc_id FROM kept WHERE term IN ({inl})"
    filter_pred = (
        f"{to_col} IN (SELECT DISTINCT d2.{from_col} FROM documents d2 "
        f"WHERE d2.doc_id IN ({inner_docs}))"
    )
    return bm25_topk_sql(analyzer, spec, k, filter_pred=filter_pred)


def join_score_topk_sql(
    analyzer: str, inner_spec: BooleanSpec, from_col: str, to_col: str, k: int,
) -> str:
    """Scoring join oracle (``JoinUtil#createJoinQuery`` ScoreMode.Max /
    Solr ``{!join score=max}``): every doc whose ``to_col`` value appears
    among the inner matches' from-values scores the MAX inner f32 BM25
    score over that join key (f32 max is order-independent — bitwise)."""
    frag = _bm25_match_ctes(inner_spec, "j")
    return f"""WITH {base_ctes(analyzer)},{frag},
ks AS (
    SELECT d.{from_col} AS jkey, max(m.score) AS jscore
    FROM jmatch m JOIN documents d USING (doc_id)
    GROUP BY d.{from_col}
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY k.jscore DESC, d.doc_id ASC) AS rank,
           d.doc_id, k.jscore AS score
    FROM documents d JOIN ks k ON d.{to_col} = k.jkey
) WHERE rank <= {k} ORDER BY rank"""


def span_contain_topk_sql(
    analyzer: str, big0: str, big1: str, big_slop: int, little: str,
    mode: str, k: int,
) -> str:
    """SpanContainingQuery / SpanWithinQuery oracle (``L/search/spans/
    SpanContainingQuery``, ``SpanWithinQuery``): big = ordered two-term
    SpanNear (one candidate span per start, nearest following end, width <=
    big_slop); containment = big.p0 <= little.q <= big.p1 (ContainSpans on
    a unit little). mode='within': freq = count of enclosed little
    occurrences (slop factor 1 each); mode='containing': freq = Σ f32
    1/(1+width) over enclosing big spans, summed in DOUBLE, one f32 cast.
    Weight = f32(Σ idf over big0, big1, little) — SpanContainQuery builds
    its SimWeight from both sides."""
    idf_sum = " + ".join(
        f"CAST({_idf_expr(t)} AS DOUBLE)" for t in (big0, big1, little)
    )
    if mode == "within":
        sfreq = f"""
sfreq AS (
    SELECT l.doc_id, count(*)::BIGINT AS freq
    FROM snl l
    WHERE EXISTS (
        SELECT 1 FROM bigm b
        WHERE b.doc_id = l.doc_id AND b.p0 <= l.pos AND l.pos <= b.p1
    )
    GROUP BY l.doc_id
)"""
        ratio = "CAST(f.freq::DOUBLE / (f.freq::DOUBLE + CAST(c.cache AS DOUBLE)) AS FLOAT)"
    else:
        sfreq = f"""
sfreq AS (
    SELECT b.doc_id,
           CAST(sum(CAST(CAST(1.0 AS FLOAT)
                         / (CAST(1.0 AS FLOAT) + CAST(b.p1 - b.p0 - 1 AS FLOAT))
                     AS DOUBLE)) AS FLOAT) AS freq
    FROM bigm b
    WHERE EXISTS (
        SELECT 1 FROM snl l
        WHERE l.doc_id = b.doc_id AND b.p0 <= l.pos AND l.pos <= b.p1
    )
    GROUP BY b.doc_id
)"""
        ratio = "CAST(CAST(f.freq AS DOUBLE) / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE)) AS FLOAT)"
    return f"""WITH {base_ctes(analyzer)},
sn0 AS (SELECT doc_id, pos FROM kept WHERE term = '{big0}'),
sn1 AS (SELECT doc_id, pos FROM kept WHERE term = '{big1}'),
snl AS (SELECT doc_id, pos FROM kept WHERE term = '{little}'),
spans AS (
    SELECT a.doc_id, a.pos AS p0, min(b.pos) AS p1
    FROM sn0 a JOIN sn1 b ON b.doc_id = a.doc_id AND b.pos > a.pos
    GROUP BY a.doc_id, a.pos
),
bigm AS (
    SELECT doc_id, p0, p1 FROM spans WHERE p1 - p0 - 1 <= {big_slop}
),{sfreq},
schits AS (
    SELECT f.doc_id,
           CAST(CAST({idf_sum} AS FLOAT) * {ratio} AS FLOAT) AS score
    FROM sfreq f JOIN cachec c USING (doc_id), statsf st
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM schits
) WHERE rank <= {k} ORDER BY rank"""


def interval_unordered_topk_sql(
    analyzer: str, t0: str, t1: str, maxgaps: int, k: int,
    ordered: bool = False,
) -> str:
    """Unordered-interval oracle (``lucene/queries/.../intervals/
    Intervals.java#unordered`` + ``#maxgaps``): minimal two-term intervals
    = adjacent opposite-term pairs in the merged per-doc position stream
    (one lead() window); match when gaps = next_pos − pos − 1 <= maxgaps;
    freq = Σ f32 1/(1+gaps) in DOUBLE with one f32 cast; weight and BM25 op
    order reuse the phrase-clause shape."""
    idf_sum = " + ".join(
        f"CAST({_idf_expr(t)} AS DOUBLE)" for t in (t0, t1)
    )
    pair_pred = (
        f"term = '{t0}' AND nt = '{t1}'" if ordered else "nt <> term"
    )
    return f"""WITH {base_ctes(analyzer)},
iv0 AS (
    SELECT doc_id, term, pos,
           lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nt,
           lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS np
    FROM kept WHERE term IN ('{t0}', '{t1}')
),
ivfreq AS (
    SELECT doc_id,
           CAST(sum(CAST(CAST(1.0 AS FLOAT)
                         / (CAST(1.0 AS FLOAT) + CAST(np - pos - 1 AS FLOAT))
                     AS DOUBLE)) AS FLOAT) AS freq
    FROM iv0
    WHERE nt IS NOT NULL AND {pair_pred} AND np - pos - 1 <= {maxgaps}
    GROUP BY doc_id
),
ivhits AS (
    SELECT f.doc_id,
           CAST(CAST({idf_sum} AS FLOAT)
                * CAST(CAST(f.freq AS DOUBLE)
                       / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM ivfreq f JOIN cachec c USING (doc_id), statsf st
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM ivhits
) WHERE rank <= {k} ORDER BY rank"""


def bf_topk_sql(analyzer: str, spec: BooleanSpec, k: int) -> str:
    """ADDITIVE boost-function oracle (edismax ``bf=`` — optional
    FunctionQuery clause): score = f32( f64(bm25_f32) + n_chars/2000 )."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag},
boosted AS (
    SELECT m.doc_id,
           CAST(CAST(m.score AS DOUBLE)
                + d.n_chars::DOUBLE / 2000.0 AS FLOAT) AS score
    FROM match m JOIN documents d USING (doc_id)
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM boosted
) WHERE rank <= {k} ORDER BY rank"""


def external_file_boost_sql(analyzer: str, spec: BooleanSpec, k: int) -> str:
    """ExternalFileField additive-boost oracle (``S/schema/
    ExternalFileField.java``): the external float is the embeddings
    table's first vector component keyed on doc_id (defVal=0 when
    absent); score = f32( f64(bm25_f32) + f64(f32 ext) )."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag},
boosted AS (
    SELECT m.doc_id,
           CAST(CAST(m.score AS DOUBLE)
                + COALESCE(CAST(CAST(e.embedding[1] AS FLOAT) AS DOUBLE), 0.0)
            AS FLOAT) AS score
    FROM match m LEFT JOIN embeddings e ON e.vec_id = m.doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM boosted
) WHERE rank <= {k} ORDER BY rank"""


def boost_by_query_sql(
    analyzer: str, spec: BooleanSpec, bspec: BooleanSpec, b: float, k: int,
) -> str:
    """``FunctionScoreQuery#boostByQuery`` oracle: main-query score × f32(b)
    when the doc also matches the boost query, ×1 otherwise; the boost
    query never adds matches."""
    import numpy as np

    bf32 = float(np.float32(b))
    frag = _bm25_match_ctes(spec, "")
    bfrag = _bm25_match_ctes(bspec, "b")
    return f"""WITH {base_ctes(analyzer)},{frag},{bfrag},
boosted AS (
    SELECT m.doc_id,
           CAST(CAST(m.score AS DOUBLE)
                * CASE WHEN bm.doc_id IS NOT NULL
                       THEN CAST(CAST({bf32!r} AS FLOAT) AS DOUBLE)
                       ELSE 1.0 END
            AS FLOAT) AS score
    FROM match m LEFT JOIN (SELECT DISTINCT doc_id FROM bmatch) bm USING (doc_id)
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM boosted
) WHERE rank <= {k} ORDER BY rank"""


def mlt_terms_sql(analyzer: str, src_doc_id: int, top_terms: int) -> str:
    """MLT interestingTerms=details oracle: the source doc's terms ranked
    by classic tf·idf (idf = ln(N/(df+1)) + 1), (score desc, term asc),
    f32 score — the exact list the MLT disjunction is built from."""
    return f"""WITH {base_ctes(analyzer)},
src_tf AS (
    SELECT term, count(*)::BIGINT AS tf FROM kept WHERE doc_id = {src_doc_id} GROUP BY term
),
src_df AS (
    SELECT k.term, count(DISTINCT k.doc_id)::BIGINT AS df
    FROM kept k JOIN src_tf USING (term) GROUP BY 1
),
mlt AS (
    SELECT s.term,
           s.tf::DOUBLE * (ln(st.doc_count::DOUBLE / (d.df + 1.0)) + 1.0) AS mlt_score
    FROM src_tf s JOIN src_df d USING (term), statsf st
)
SELECT rank::INTEGER AS rank, term, CAST(mlt_score AS FLOAT) AS mlt_score FROM (
    SELECT row_number() OVER (ORDER BY mlt_score DESC, term ASC) AS rank, term, mlt_score
    FROM mlt
) WHERE rank <= {top_terms} ORDER BY rank"""


def _ltr_tree_sql(node, fmap) -> str:
    if "value" in node:
        return repr(float(node["value"]))
    f = fmap[node["feature"]]
    return (
        f"(CASE WHEN {f} <= {float(node['threshold'])!r} "
        f"THEN {_ltr_tree_sql(node['left'], fmap)} "
        f"ELSE {_ltr_tree_sql(node['right'], fmap)} END)"
    )


def ltr_trees_sql(
    analyzer: str, spec: BooleanSpec, feature_term: str,
    trees: tuple, rerank_docs: int, k: int,
) -> str:
    """LTR tree-ensemble oracle (``MultipleAdditiveTreesModel``): same
    candidate set and features as the LinearModel oracle; the ensemble is
    the identical nested CASE tree, weighted double sum, one f32 cast."""
    mfrag = _bm25_match_ctes(spec, "m")
    fmap = {
        "orig": "CAST(c.score AS DOUBLE)",
        "tf": "COALESCE(f.tf, 0)::DOUBLE",
        "n_chars": "d.n_chars::DOUBLE",
    }
    ens = " + ".join(
        f"({float(w)!r} * {_ltr_tree_sql(root, fmap)})" for w, root in trees
    )
    return f"""WITH {base_ctes(analyzer)},{mfrag},
mranked AS (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r, doc_id, score
    FROM mmatch
),
cand AS (SELECT doc_id, score FROM mranked WHERE r <= {rerank_docs}),
ftf AS (
    SELECT doc_id, count(*)::BIGINT AS tf FROM kept
    WHERE term = '{feature_term}' GROUP BY 1
),
scored AS (
    SELECT c.doc_id, CAST({ens} AS FLOAT) AS ltr_score
    FROM cand c
    LEFT JOIN ftf f ON f.doc_id = c.doc_id
    JOIN documents d ON d.doc_id = c.doc_id
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, ltr_score::FLOAT AS ltr_score FROM (
    SELECT row_number() OVER (ORDER BY ltr_score DESC, doc_id ASC) AS rank, doc_id, ltr_score
    FROM scored
) WHERE rank <= {k} ORDER BY rank"""


def result_clusters_sql(
    analyzer: str, spec: BooleanSpec, n_docs: int,
) -> str:
    """Result-clustering oracle (ClusteringComponent analog): top-N page,
    per-doc dominant classic-tf·idf term (argmax, ties → term asc),
    clusters grouped by label with size + best first-pass rank."""
    frag = _bm25_match_ctes(spec, "")
    return f"""WITH {base_ctes(analyzer)},{frag},
page AS (
    SELECT doc_id, rank FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        FROM match
    ) WHERE rank <= {n_docs}
),
dtf AS (
    SELECT k.doc_id, k.term, count(*)::BIGINT AS tf
    FROM kept k JOIN page USING (doc_id) GROUP BY 1, 2
),
ddf AS (
    SELECT k.term, count(DISTINCT k.doc_id)::BIGINT AS df
    FROM kept k WHERE k.term IN (SELECT DISTINCT term FROM dtf) GROUP BY 1
),
lab AS (
    SELECT doc_id, term AS label FROM (
        SELECT t.doc_id, t.term,
               row_number() OVER (
                   PARTITION BY t.doc_id
                   ORDER BY t.tf::DOUBLE * (ln(st.doc_count::DOUBLE / (d.df + 1.0)) + 1.0) DESC,
                            t.term ASC
               ) AS rn
        FROM dtf t JOIN ddf d USING (term), statsf st
    ) WHERE rn = 1
)
SELECT label, count(*)::BIGINT AS n_docs, min(p.rank)::INTEGER AS best_rank
FROM lab JOIN page p USING (doc_id)
GROUP BY label ORDER BY n_docs DESC, label ASC"""


def localstats_topk_sql(analyzer: str, spec, k: int, n_shards: int = 4) -> str:
    """LocalStatsCache distributed-search oracle
    (``S/search/stats/LocalStatsCache`` + ``QueryComponent#mergeIds``): per
    shard ``s``, the FULL ``bm25_topk_sql`` pipeline runs over documents
    routed by ``doc_id % n_shards = s`` — so df/docCount/avgdl (and hence
    idf and the norm cache) are SHARD-LOCAL — and contributes its top-k;
    the merge re-ranks the union by (score desc, doc_id asc)."""
    shard_qs = []
    for s in range(n_shards):
        q = bm25_topk_sql(analyzer, spec, k).replace(
            "FROM documents",
            f"FROM (SELECT * FROM documents WHERE doc_id % {n_shards} = {s})",
        )
        shard_qs.append(f"(SELECT doc_id, score FROM ({q}))")
    union = "\nUNION ALL\n".join(shard_qs)
    return f"""SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM ({union})
) WHERE rank <= {k} ORDER BY rank"""


def diversified_topk_sql(
    analyzer: str, spec, k: int, max_per_key: int, key_col: str = "source",
) -> str:
    """DiversifiedTopDocsCollector oracle: BM25 match set, per-key rank by
    (score desc, doc asc), survivors (rank ≤ max_per_key) re-ranked the
    same way, top-k."""
    frag = _bm25_match_ctes(spec, "", None)
    return f"""WITH {base_ctes(analyzer)},{frag},
withkey AS (
    SELECT m.doc_id, d.{key_col} AS key, m.score
    FROM match m JOIN documents d USING (doc_id)
),
div AS (
    SELECT doc_id, key, score,
           row_number() OVER (PARTITION BY key ORDER BY score DESC, doc_id ASC) AS rn
    FROM withkey
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, key AS {key_col}, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, key, score
    FROM div WHERE rn <= {max_per_key}
) WHERE rank <= {k} ORDER BY rank"""


def dv_boost_topk_sql(analyzer: str, spec: BooleanSpec, k: int) -> str:
    """Oracle for ``dv_boost_topk`` over the DV-updated fixture
    (``L/index/DocValuesUpdate.NumericDocValuesUpdate`` stacking): the
    resolved ``popularity`` value is gen-2 (key%6==0 → key%4+2) over
    gen-1 (key%3==0 → key%5+10) over base (key%7+1) — the latest-wins
    CASE order below IS the generation order; boosted score =
    f32(f64(bm25) * f64(dv)), page by (boosted desc, doc_id asc)."""
    frag = _bm25_match_ctes(spec)
    return f"""WITH {base_ctes(analyzer)},{frag}
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY bscore DESC, doc_id ASC) AS rank,
           doc_id, bscore AS score
    FROM (
        SELECT doc_id,
               CAST(CAST(score AS DOUBLE) * CAST(
                   CASE WHEN doc_id % 6 = 0 THEN doc_id % 4 + 2
                        WHEN doc_id % 3 = 0 THEN doc_id % 5 + 10
                        ELSE doc_id % 7 + 1 END AS DOUBLE) AS FLOAT) AS bscore
        FROM match
    )
) WHERE rank <= {k} ORDER BY rank"""


def field_masking_span_topk_sql(
    analyzer: str, title_expr_sql: str, tt: str, bt: str, slop: int, k: int
) -> str:
    """FieldMaskingSpanQuery oracle (``L/search/spans/
    FieldMaskingSpanQuery``): sn0 positions come from the TITLE projection's
    token stream (the masked field's parallel tokenization), sn1 from the
    body; the ordered-near pairing, slop-factor freq and BM25 shape are
    ``span_near_topk_sql``'s rules against BODY norms/stats; the title
    term's idf binds the TITLE df with the body docCount (SpanWeight
    buildSimWeight over per-subquery TermStates under the masked-to
    field's collectionStatistics)."""
    idf_t = (
        "CAST(ln(1.0 + (st.doc_count - "
        f"(SELECT count(DISTINCT doc_id) FROM t_kept WHERE term = '{tt}')"
        " + 0.5) / ("
        f"(SELECT count(DISTINCT doc_id) FROM t_kept WHERE term = '{tt}')"
        " + 0.5)) AS FLOAT)"
    )
    idf_sum = f"CAST({idf_t} AS DOUBLE) + CAST({_idf_expr(bt)} AS DOUBLE)"
    return f"""WITH t_docs AS (
    SELECT doc_id, {title_expr_sql} AS text FROM documents
),
t_tl AS (
    SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS toks FROM t_docs
),
t_kept AS (
    SELECT doc_id, lower(unnest(toks)) AS term,
           generate_subscripts(toks, 1) - 1 AS pos
    FROM t_tl
),
{base_ctes(analyzer)},
sn0 AS (SELECT doc_id, pos FROM t_kept WHERE term = '{tt}'),
sn1 AS (SELECT doc_id, pos FROM kept WHERE term = '{bt}'),
spans AS (
    SELECT a.doc_id, a.pos AS p0, min(b.pos) AS p1
    FROM sn0 a JOIN sn1 b ON b.doc_id = a.doc_id AND b.pos > a.pos
    GROUP BY a.doc_id, a.pos
),
sfreq AS (
    SELECT doc_id,
           CAST(sum(CAST(CAST(1.0 AS FLOAT)
                         / (CAST(1.0 AS FLOAT) + CAST(p1 - p0 - 1 AS FLOAT))
                     AS DOUBLE)) AS FLOAT) AS freq
    FROM spans WHERE p1 - p0 - 1 <= {slop} GROUP BY doc_id
),
fmhits AS (
    SELECT f.doc_id,
           CAST(CAST({idf_sum} AS FLOAT)
                * CAST(CAST(f.freq AS DOUBLE)
                       / (CAST(f.freq AS DOUBLE) + CAST(c.cache AS DOUBLE)) AS FLOAT)
            AS FLOAT) AS score
    FROM sfreq f JOIN cachec c USING (doc_id), statsf st
)
SELECT rank::INTEGER AS rank, doc_id::BIGINT AS doc_id, score::FLOAT AS score FROM (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id, score
    FROM fmhits
) WHERE rank <= {k} ORDER BY rank"""


def docsonly_topk_sql(analyzer: str, terms: list[str], k: int) -> str:
    """DOCS-indexed field disjunction top-k (``L/index/IndexOptions.DOCS``
    / FieldType#setIndexOptions, Solr ``omitTermFreqAndPositions``):
    ``PostingsEnum#freq()`` reads 1 for every posting, so the per-clause
    BM25 score is f32(idf · f32(1/(1 + cache))) — norms STILL apply (the
    field keeps lengths; only tf is dropped at read time). Σ double, one
    f32 cast, the boolean-combine discipline."""
    clause_selects = []
    for t in terms:
        clause_selects.append(f"""
SELECT k.doc_id,
       CAST({_idf_expr(t)}
            * CAST(1.0 / (1.0 + CAST(any_value(c.cache) AS DOUBLE)) AS FLOAT)
        AS FLOAT) AS s
FROM kept k JOIN cachec c USING (doc_id), statsf st
WHERE k.term = '{t}'
GROUP BY k.doc_id, st.doc_count""")
    return _sim_family_topk_sql(analyzer, clause_selects, k)
