"""Solr function-query (ValueSource) expression surface.

Reference: ``S/search/ValueSourceParser.java`` registers the named function
sources; ``lucene/queries/function/valuesource/*`` implements them. Solr
exposes them as ``sort=query($f)``, boost functions, and pseudo-fields. This
module implements the standard arithmetic/conditional subset plus the
index-backed relevance sources, compiled TWICE from one AST:

- ``compile_spark``: a pyspark ``Column`` tree — pure JVM expressions
  (whole-stage-codegen friendly; no Python in the scoring path), with
  ``termfreq`` slots resolved to pre-joined columns and index scalars
  (docfreq/numdocs/maxdoc) folded as literals, exactly like Lucene resolves
  ``TermStates`` once per query.
- ``compile_sql``: the equivalent DuckDB SQL expression for the oracle gate.

Functions (names and semantics per ValueSourceParser):
  sum, sub, product, div, abs, log (base 10 — Solr's ``log``), ln, sqrt,
  recip (ReciprocalFloatFunction a/(m·x+b)), linear (m·x+c),
  exp, pow, max, min, if (cond != 0), map(x, lo, hi, target),
  termfreq(field, term), docfreq(field, term), norm(field) (the
  SmallFloat-DECODED quantized length the similarity sees), field(name) /
  bare field name, numdocs(), maxdoc(),
  strdist(s1, s2) (StrDistValueSource, Solr-default 'edit' measure:
  normalized Levenshtein similarity 1 − d/max(len), f32 like the
  reference's float return).

Grammar:  expr := NUMBER | NAME | NAME '(' [expr (',' expr)*] ')' | 'str'
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F

_TOKENIZE = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*|-?\d+\.?\d*|'[^']*'|[(),])")

# arity: exact int, or (min, max) tuple; None = variadic >= 2
_FUNCTIONS: dict[str, object] = {
    "sum": None, "product": None, "max": None, "min": None,
    "sub": 2, "div": 2, "pow": 2,
    "abs": 1, "log": 1, "ln": 1, "sqrt": 1, "exp": 1,
    "if": 3, "map": 4, "scale": 3, "recip": 4, "linear": 3,
    "termfreq": 2, "docfreq": 2, "idf": 2, "norm": 1, "field": 1,
    "numdocs": 0, "maxdoc": 0,
    # index-statistic scalars (TotalTermFreqValueSource /
    # SumTotalTermFreqValueSource — S/search/ValueSourceParser "ttf",
    # "sumtotaltermfreq")
    "ttf": 2, "sumtotaltermfreq": 1,
    # strdist(s1, s2) — StrDistValueSource with the Solr-default 'edit'
    # measure (lucene/spell LevenshteinDistance#getDistance): normalized
    # similarity (float) 1 − levenshtein/max(len); args are string
    # literals or string fields
    "strdist": 2,
}


@dataclass(frozen=True)
class Num:
    value: float


@dataclass(frozen=True)
class Str:
    value: str


@dataclass(frozen=True)
class Field:
    name: str


@dataclass(frozen=True)
class Call:
    fn: str
    args: tuple


def parse_expr(text: str):
    """Recursive-descent parse → AST. Raises ValueError on syntax errors."""
    toks: list[str] = []
    i = 0
    while i < len(text):
        m = _TOKENIZE.match(text, i)
        if not m:
            raise ValueError(f"function query: bad token at {text[i:i + 20]!r}")
        toks.append(m.group(1))
        i = m.end()
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        if pos >= len(toks):
            raise ValueError("function query: unexpected end of input")
        t = toks[pos]
        if expected is not None and t != expected:
            raise ValueError(f"function query: expected {expected!r}, got {t!r}")
        pos += 1
        return t

    def expr():
        t = take()
        if t.startswith("'"):
            return Str(t[1:-1])
        if re.fullmatch(r"-?\d+\.?\d*", t):
            return Num(float(t))
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
            raise ValueError(f"function query: unexpected {t!r}")
        if peek() != "(":
            return Field(t)  # bare field reference
        take("(")
        args = []
        if peek() != ")":
            args.append(expr())
            while peek() == ",":
                take(",")
                args.append(expr())
        take(")")
        fn = t.lower()
        if fn not in _FUNCTIONS:
            raise ValueError(f"function query: unknown function {fn!r}")
        arity = _FUNCTIONS[fn]
        if arity is None:
            if len(args) < 2:
                raise ValueError(f"function query: {fn} needs >=2 args")
        elif len(args) != arity:
            raise ValueError(f"function query: {fn} takes {arity} args, got {len(args)}")
        if fn == "field":
            if not isinstance(args[0], Field):
                raise ValueError("function query: field() takes a field name")
            return args[0]
        if fn in ("termfreq", "docfreq", "idf", "ttf"):
            if not isinstance(args[0], Field) or not isinstance(args[1], (Str, Field)):
                raise ValueError(f"function query: {fn}(field, term)")
        if fn == "sumtotaltermfreq" and not isinstance(args[0], Field):
            raise ValueError("function query: sumtotaltermfreq(field)")
        if fn == "strdist" and not all(
            isinstance(a, (Str, Field)) for a in args
        ):
            raise ValueError(
                "function query: strdist(s1, s2) takes string literals "
                "or string fields"
            )
        if fn == "scale" and not (
            isinstance(args[1], Num) and isinstance(args[2], Num)
        ):
            raise ValueError("function query: scale(x, minTarget, maxTarget) "
                             "takes numeric targets")
        return Call(fn, tuple(args))

    out = expr()
    if pos != len(toks):
        raise ValueError(f"function query: trailing input {toks[pos:]!r}")
    return out


def _walk(node):
    yield node
    if isinstance(node, Call):
        for a in node.args:
            yield from _walk(a)


def collect_termfreqs(ast) -> list[tuple[str, str]]:
    """Ordered-unique (field, surface_term) pairs needing a postings join."""
    out: list[tuple[str, str]] = []
    for n in _walk(ast):
        if isinstance(n, Call) and n.fn == "termfreq":
            key = (n.args[0].name, _term_text(n.args[1]))
            if key not in out:
                out.append(key)
    return out


def collect_scalars(ast) -> list[tuple[str, ...]]:
    """Ordered-unique scalar sources: ('docfreq'|'idf', field, term) |
    ('numdocs',) | ('maxdoc',) — resolved once per query, like Lucene
    TermStates."""
    out: list[tuple[str, ...]] = []
    for n in _walk(ast):
        key = None
        if isinstance(n, Call) and n.fn in ("docfreq", "idf", "ttf"):
            key = (n.fn, n.args[0].name, _term_text(n.args[1]))
        elif isinstance(n, Call) and n.fn in ("numdocs", "maxdoc"):
            key = (n.fn,)
        elif isinstance(n, Call) and n.fn == "sumtotaltermfreq":
            key = (n.fn, n.args[0].name)
        if key is not None and key not in out:
            out.append(key)
    return out


def split_scale(ast):
    """``scale(x, minT, maxT)`` needs the GLOBAL min/max of x — a full-pass
    aggregate, so it is supported as the OUTERMOST function only (its Solr
    use; upstream docs flag it as a full-index pass too). Returns
    (inner_ast, (minT, maxT)) or (ast, None)."""
    if isinstance(ast, Call) and ast.fn == "scale":
        return ast.args[0], (ast.args[1].value, ast.args[2].value)
    for n in _walk(ast):
        if isinstance(n, Call) and n.fn == "scale":
            raise ValueError(
                "function query: scale() is supported as the outermost "
                "function only (requires a global min/max pass)"
            )
    return ast, None


def _term_text(node) -> str:
    return node.value if isinstance(node, Str) else node.name


class FuncEnv:
    """Resolution environment shared by both compilers.

    ``tf``: (field, surface_term) → Column (Spark) or SQL fragment (str).
    ``fields``: field name → Column / SQL fragment (includes the pseudo-field
    resolved by ``norm(field)`` under key ``("norm", field)``).
    ``scalars``: collect_scalars key → float.
    """

    def __init__(self, tf, fields, norms, scalars):
        self.tf = tf
        self.fields = fields
        self.norms = norms
        self.scalars = scalars


def compile_spark(ast, env: FuncEnv) -> Column:
    D = "double"

    def c(n) -> Column:
        if isinstance(n, Num):
            return F.lit(n.value).cast(D)
        if isinstance(n, Field):
            if n.name not in env.fields:
                raise ValueError(f"function query: unknown field {n.name!r}")
            return env.fields[n.name].cast(D)
        assert isinstance(n, Call)
        if n.fn == "termfreq":
            return env.tf[(n.args[0].name, _term_text(n.args[1]))].cast(D)
        if n.fn == "norm":
            return env.norms[n.args[0].name].cast(D)
        if n.fn in ("docfreq", "idf", "numdocs", "maxdoc", "ttf",
                    "sumtotaltermfreq"):
            key = collect_scalars(n)[0]
            return F.lit(float(env.scalars[key])).cast(D)
        if n.fn == "strdist":
            # LevenshteinDistance#getDistance: 1f − dist/max(len) — a FLOAT
            # result (one f32 round, both compilers), then double onward
            def _s(x):
                if isinstance(x, Str):
                    return F.lit(x.value)
                if ("str", x.name) not in env.fields:
                    raise ValueError(
                        f"function query: unknown string field {x.name!r}"
                    )
                return env.fields[("str", x.name)]

            c1, c2 = _s(n.args[0]), _s(n.args[1])
            sim = F.lit(1.0).cast(D) - (
                F.levenshtein(c1, c2).cast(D)
                / F.greatest(F.length(c1), F.length(c2)).cast(D)
            )
            return sim.cast("float").cast(D)
        a = [c(x) for x in n.args]
        if n.fn == "sum":
            out = a[0]
            for x in a[1:]:
                out = out + x
            return out
        if n.fn == "product":
            out = a[0]
            for x in a[1:]:
                out = out * x
            return out
        if n.fn == "sub":
            return a[0] - a[1]
        if n.fn == "div":
            return a[0] / a[1]
        if n.fn == "pow":
            return F.pow(a[0], a[1])
        if n.fn == "abs":
            return F.abs(a[0])
        if n.fn == "log":
            return F.log10(a[0])
        if n.fn == "ln":
            return F.log(a[0])
        if n.fn == "sqrt":
            return F.sqrt(a[0])
        if n.fn == "exp":
            return F.exp(a[0])
        if n.fn == "max":
            return F.greatest(*a)
        if n.fn == "min":
            return F.least(*a)
        if n.fn == "if":
            return F.when(a[0] != F.lit(0.0), a[1]).otherwise(a[2])
        if n.fn == "map":
            x, lo, hi, target = a
            return F.when((x >= lo) & (x <= hi), target).otherwise(x)
        if n.fn == "recip":
            # ReciprocalFloatFunction: a/(m*x+b) — recency boosts etc.
            x, m, aa, b = a
            return aa / (m * x + b)
        if n.fn == "linear":
            # LinearFloatFunction: m*x+c
            x, m, cc = a
            return m * x + cc
        raise ValueError(f"function query: unhandled {n.fn}")

    return c(ast)


def compile_sql(ast, env: FuncEnv) -> str:
    def c(n) -> str:
        if isinstance(n, Num):
            return f"CAST({n.value!r} AS DOUBLE)"
        if isinstance(n, Field):
            if n.name not in env.fields:
                raise ValueError(f"function query: unknown field {n.name!r}")
            return f"CAST({env.fields[n.name]} AS DOUBLE)"
        assert isinstance(n, Call)
        if n.fn == "termfreq":
            return f"CAST({env.tf[(n.args[0].name, _term_text(n.args[1]))]} AS DOUBLE)"
        if n.fn == "norm":
            return f"CAST({env.norms[n.args[0].name]} AS DOUBLE)"
        if n.fn in ("docfreq", "idf", "numdocs", "maxdoc", "ttf",
                    "sumtotaltermfreq"):
            key = collect_scalars(n)[0]
            v = env.scalars[key]  # SQL fragment (scalar subquery) or number
            return (
                f"CAST({v} AS DOUBLE)" if isinstance(v, str)
                else f"CAST({float(v)!r} AS DOUBLE)"
            )
        if n.fn == "strdist":
            def _s(x):
                if isinstance(x, Str):
                    return "'" + x.value.replace("'", "''") + "'"
                if ("str", x.name) not in env.fields:
                    raise ValueError(
                        f"function query: unknown string field {x.name!r}"
                    )
                return env.fields[("str", x.name)]

            s1, s2 = _s(n.args[0]), _s(n.args[1])
            return (
                f"CAST(CAST(1.0 - levenshtein({s1}, {s2})::DOUBLE"
                f" / greatest(length({s1}), length({s2}))::DOUBLE"
                " AS FLOAT) AS DOUBLE)"
            )
        a = [c(x) for x in n.args]
        if n.fn == "sum":
            return "(" + " + ".join(a) + ")"
        if n.fn == "product":
            return "(" + " * ".join(a) + ")"
        if n.fn == "sub":
            return f"({a[0]} - {a[1]})"
        if n.fn == "div":
            return f"({a[0]} / {a[1]})"
        if n.fn == "pow":
            return f"power({a[0]}, {a[1]})"
        if n.fn == "abs":
            return f"abs({a[0]})"
        if n.fn == "log":
            return f"log10({a[0]})"
        if n.fn == "ln":
            return f"ln({a[0]})"
        if n.fn == "sqrt":
            return f"sqrt({a[0]})"
        if n.fn == "exp":
            return f"exp({a[0]})"
        if n.fn == "max":
            return f"greatest({', '.join(a)})"
        if n.fn == "min":
            return f"least({', '.join(a)})"
        if n.fn == "if":
            return f"(CASE WHEN {a[0]} <> 0 THEN {a[1]} ELSE {a[2]} END)"
        if n.fn == "map":
            x, lo, hi, target = a
            return f"(CASE WHEN {x} >= {lo} AND {x} <= {hi} THEN {target} ELSE {x} END)"
        if n.fn == "recip":
            x, m, aa, b = a
            return f"({aa} / (({m} * {x}) + {b}))"
        if n.fn == "linear":
            x, m, cc = a
            return f"(({m} * {x}) + {cc})"
        raise ValueError(f"function query: unhandled {n.fn}")

    return c(ast)
