"""Function-query (ValueSource) expression parser + compiler unit tests
(``S/search/ValueSourceParser`` grammar subset). The end-to-end ranking gate
is the driver entry ``ft_funcexpr_topk`` (same AST compiled to Spark and to
DuckDB); these cover the parser's shape and error surface."""

import pytest

from lucene_solr_spark.search.funcquery import (
    Call, Field, Num, Str, collect_scalars, collect_termfreqs, parse_expr,
)


def test_parse_nested():
    ast = parse_expr("sum(product(2, termfreq(text,'merge')), div(norm(text), n_chars))")
    assert isinstance(ast, Call) and ast.fn == "sum" and len(ast.args) == 2
    prod = ast.args[0]
    assert prod.fn == "product"
    assert prod.args[0] == Num(2.0)
    assert prod.args[1] == Call("termfreq", (Field("text"), Str("merge")))
    div = ast.args[1]
    assert div.args[0] == Call("norm", (Field("text"),))
    assert div.args[1] == Field("n_chars")


def test_parse_field_function_unwraps():
    assert parse_expr("field(n_chars)") == Field("n_chars")


def test_parse_numbers_and_negatives():
    ast = parse_expr("map(x, -1, 1.5, 0)")
    assert ast.args[1] == Num(-1.0) and ast.args[2] == Num(1.5)


@pytest.mark.parametrize("bad", [
    "sum(1)",                 # variadic needs >= 2
    "div(1, 2, 3)",           # fixed arity
    "nosuchfn(1, 2)",         # unknown function
    "sum(1, 2",               # unbalanced parens
    "sum(1, 2)) extra",       # trailing input
    "termfreq('text', 1)",    # field must be a name
    "",                       # empty
])
def test_parse_errors_are_loud(bad):
    with pytest.raises(ValueError):
        parse_expr(bad)


def test_collectors_are_ordered_unique():
    ast = parse_expr(
        "sum(termfreq(text,'a'), termfreq(text,'b'), termfreq(text,'a'),"
        " docfreq(text,'a'), numdocs(), docfreq(text,'a'))"
    )
    assert collect_termfreqs(ast) == [("text", "a"), ("text", "b")]
    assert collect_scalars(ast) == [("docfreq", "text", "a"), ("numdocs",)]


def test_split_scale_outermost_only():
    from lucene_solr_spark.search.funcquery import split_scale

    ast, to = split_scale(parse_expr("scale(sum(n_chars, 1), 0, 20)"))
    assert to == (0.0, 20.0)
    assert isinstance(ast, Call) and ast.fn == "sum"
    ast2, to2 = split_scale(parse_expr("sum(n_chars, 1)"))
    assert to2 is None and ast2.fn == "sum"
    with pytest.raises(ValueError):
        split_scale(parse_expr("sum(scale(n_chars, 0, 1), 2)"))
    with pytest.raises(ValueError):
        parse_expr("scale(n_chars, 0, x)")  # targets must be numeric


def test_idf_is_a_scalar_source():
    ast = parse_expr("product(idf(text,'merge'), termfreq(text,'merge'))")
    assert collect_scalars(ast) == [("idf", "text", "merge")]
    assert collect_termfreqs(ast) == [("text", "merge")]


def test_compile_spark_constant_fold(spark):
    """Pure-arithmetic expressions evaluate exactly (one-row sanity)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.funcquery import FuncEnv, compile_spark

    env = FuncEnv(tf={}, fields={"x": F.lit(9.0)}, norms={}, scalars={})
    ast = parse_expr("sum(product(2, 3), div(sub(10, x), 2), sqrt(x), if(0, 99, 1))")
    got = spark.range(1).select(compile_spark(ast, env).alias("v")).collect()[0].v
    assert got == 6.0 + 0.5 + 3.0 + 1.0


def test_recip_linear_spark_sql_parity(spark):
    """recip(x,m,a,b)=a/(m·x+b) and linear(x,m,c)=m·x+c evaluate identically
    under both compilers (ReciprocalFloatFunction / LinearFloatFunction)."""
    import duckdb
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.funcquery import (
        FuncEnv, compile_spark, compile_sql,
    )

    expr = "sum(recip(x, 2, 10, 1), linear(x, 3, 0.5))"
    ast = parse_expr(expr)
    env_s = FuncEnv(tf={}, fields={"x": F.lit(4.0)}, norms={}, scalars={})
    got = spark.range(1).select(compile_spark(ast, env_s).alias("v")).collect()[0].v
    env_q = FuncEnv(tf={}, fields={"x": "4.0"}, norms={}, scalars={})
    want = duckdb.sql(f"SELECT {compile_sql(ast, env_q)} AS v").fetchone()[0]
    assert got == want == (10.0 / (2 * 4.0 + 1) + (3 * 4.0 + 0.5))


def test_strdist_spark_sql_parity(spark):
    """strdist(s1, s2) — StrDistValueSource 'edit' measure: normalized
    Levenshtein similarity 1 − d/max(len), f32-rounded like the reference's
    float return; literal-vs-field and both compilers agree."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.funcquery import (
        FuncEnv, compile_spark, compile_sql,
    )

    expr = "strdist('src1', s)"
    ast = parse_expr(expr)
    for val, dist in [("src12", 1), ("src1", 0), ("other", 5)]:
        env_s = FuncEnv(
            tf={}, fields={("str", "s"): F.lit(val)}, norms={}, scalars={}
        )
        got = spark.range(1).select(
            compile_spark(ast, env_s).alias("v")
        ).collect()[0].v
        env_q = FuncEnv(tf={}, fields={("str", "s"): f"'{val}'"}, norms={}, scalars={})
        want = duckdb.sql(f"SELECT {compile_sql(ast, env_q)} AS v").fetchone()[0]
        ref = float(np.float32(1.0 - dist / max(4, len(val))))
        assert got == want == ref, (val, got, want, ref)


def test_strdist_validation_is_loud():
    with pytest.raises(ValueError, match="strdist"):
        parse_expr("strdist(1, source)")
