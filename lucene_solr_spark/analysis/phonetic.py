"""American Soundex phonetic encoder.

Analog of ``lucene/analysis/phonetic/.../PhoneticFilter`` with the
commons-codec ``Soundex`` encoder (the scheme behind Solr's
``solr.PhoneticFilterFactory`` default) applied at QUERY time as a
MultiTermQuery-style dictionary expansion: the query token's code is
matched against the soundex codes of every indexed term, and the
expansion scores as a plain BM25 disjunction (SCORING_BOOLEAN_REWRITE),
mirroring how a phonetic-analyzed field matches sound-alike spellings.

Algorithm (classic American Soundex):
  1. drop ``h``/``w`` (they never separate same-code letters),
  2. map consonants to digit classes (bfpv→1 cgjkqsxz→2 dt→3 l→4 mn→5 r→6),
  3. collapse adjacent equal digits (vowels left in place still separate),
  4. drop vowels (``aeiouy``),
  5. code = upper(first letter) + next 3 digits (skipping the first
     letter's own digit when it is a consonant), zero-padded.

The same five steps are emitted as portable SQL / Spark column
expressions (``soundex_sql_expr`` / ``soundex_spark_col``) so the engine
expansion and the DuckDB oracle compute the code independently with
identical semantics. The digit-run collapse is chained per digit class
(``1+``→``1`` … ``6+``→``6``) instead of a ``(\\d)\\1+`` backreference —
RE2 (DuckDB) has no backreferences.
"""

from __future__ import annotations

import re

_CONSONANT_MAP = str.maketrans("bfpvcgjkqsxzdtlmnr", "111122222222334556")
_VOWELISH = set("aeiouyhw")


def soundex(word: str) -> str:
    """Soundex code of one lowercase a-z word (e.g. ``stram`` → ``S365``)."""
    if not word:
        return ""
    s = word.replace("h", "").replace("w", "")
    s = s.translate(_CONSONANT_MAP)
    for d in "123456":
        s = re.sub(f"{d}+", d, s)
    digits = "".join(ch for ch in s if ch.isdigit())
    if word[0] not in _VOWELISH:
        digits = digits[1:]
    return word[0].upper() + (digits + "000")[:3]


def soundex_sql_expr(col: str) -> str:
    """The 5-step pipeline as one DuckDB SQL scalar expression over ``col``."""
    s = f"translate(translate({col}, 'hw', ''), 'bfpvcgjkqsxzdtlmnr', '111122222222334556')"
    for d in "123456":
        s = f"regexp_replace({s}, '{d}+', '{d}', 'g')"
    s4 = f"translate({s}, 'aeiouy', '')"
    digits = (
        f"CASE WHEN substr({col}, 1, 1) IN "
        f"('a','e','i','o','u','y','h','w') THEN {s4} "
        f"ELSE substr({s4}, 2) END"
    )
    return f"upper(substr({col}, 1, 1)) || substr(rpad({digits}, 3, '0'), 1, 3)"


def soundex_spark_col(col):
    """The same pipeline as a Spark Column (pure JVM expressions — the
    dictionary scan needs no Python UDF)."""
    from pyspark.sql import functions as F

    s = F.translate(
        F.translate(col, "hw", ""), "bfpvcgjkqsxzdtlmnr", "111122222222334556"
    )
    for d in "123456":
        s = F.regexp_replace(s, f"{d}+", d)
    s4 = F.translate(s, "aeiouy", "")
    first = F.substring(col, 1, 1)
    digits = F.when(
        first.isin(*list("aeiouyhw")), s4
    ).otherwise(F.substring(s4, 2, 1 << 30))
    return F.concat(F.upper(first), F.substring(F.rpad(digits, 3, "0"), 1, 3))
