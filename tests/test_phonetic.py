"""Soundex goldens + Python/SQL/Spark-expression agreement
(analysis/phonetic; ref lucene/analysis/phonetic PhoneticFilter +
commons-codec Soundex)."""

import duckdb
import pytest

from lucene_solr_spark.analysis.phonetic import soundex, soundex_sql_expr

# canonical American Soundex vectors (incl. the h/w adjacency rule)
GOLDENS = {
    "robert": "R163",
    "rupert": "R163",
    "ashcraft": "A261",
    "ashcroft": "A261",
    "tymczak": "T522",
    "pfister": "P236",
    "honeyman": "H555",
    "lloyd": "L300",
    "washington": "W252",
    "lee": "L000",
    "gutierrez": "G362",
    "jackson": "J250",
}


@pytest.mark.parametrize("word,code", sorted(GOLDENS.items()))
def test_goldens(word, code):
    assert soundex(word) == code


def test_sql_expr_matches_python():
    words = sorted(GOLDENS) + ["stram", "merj", "scan", "a", "b", "hash", "window"]
    vals = ", ".join(f"('{w}')" for w in words)
    rows = duckdb.sql(
        f"SELECT w, {soundex_sql_expr('w')} AS c FROM (VALUES {vals}) t(w) ORDER BY w"
    ).fetchall()
    for w, c in rows:
        assert c == soundex(w), w


def test_spark_col_matches_python(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.phonetic import soundex_spark_col

    words = sorted(GOLDENS) + ["stram", "merj", "scan", "a", "b"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: r.c
        for r in df.select("w", soundex_spark_col(F.col("w")).alias("c")).collect()
    }
    for w in words:
        assert got[w] == soundex(w), w
