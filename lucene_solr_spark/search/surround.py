"""Surround query-language parser → BooleanSpec.

Analog of ``lucene/queryparser/surround`` (``parser/QueryParser.jj`` +
``query/DistanceQuery``), restricted to the surface the span kernels
execute:

- ``kW(a, b)`` — ordered distance query: SpanNearQuery(ordered) with
  slop = k − 1 (DistanceQuery passes opDistance − 1 as the span slop);
- ``kN(a, b)`` — unordered distance query: SpanNearQuery(unordered),
  same slop mapping (NearSpansUnordered matching);
- ``W``/``N`` with no prefix default to distance 1 (adjacent);
- bare terms, and infix ``AND`` / ``OR`` / ``NOT`` combining clauses at
  ONE level (AND → MUST, OR → SHOULD, NOT → MUST_NOT on a bare term —
  surround's full nesting/precedence tower is out of scope and raises,
  documented engine limit rather than silently wrong results);
- operators are case-insensitive, like the reference grammar.

Distance operands here are single terms (analyzed through the index
chain); the reference also allows nested subqueries as operands — that
nesting maps onto the engine's span_near_or kernel for OR-operands only
and is left to the caller via ``SpanNearOrClause`` directly.
"""

from __future__ import annotations

import re

from .query import (
    BooleanSpec,
    SpanNearClause,
    SpanNearUnorderedClause,
    TermClause,
)

_DIST_RE = re.compile(
    r"^(\d*)([wWnN])\(\s*([^\s,()]+)\s*,\s*([^\s,()]+)\s*\)$"
)
_OP_RE = re.compile(r"\s+(AND|OR|NOT)\s+", re.IGNORECASE)


def parse_surround(query: str, analyzer) -> BooleanSpec:
    """Parse one surround query string into a BooleanSpec."""
    parts = _OP_RE.split(query.strip())
    # parts = [clause, op, clause, op, clause, ...]
    ops = {parts[i].upper() for i in range(1, len(parts), 2)}
    if len(ops) > 1:
        raise ValueError(
            "surround subset: one operator type per query (no precedence "
            f"tower); got {sorted(ops)}"
        )
    op = ops.pop() if ops else "OR"
    spec = BooleanSpec()

    def one_term(surface: str) -> str:
        toks = analyzer.analyze(surface)
        if not toks:
            raise ValueError(f"surround operand analyzed to nothing: {surface!r}")
        return toks[0][0]

    for i, raw in enumerate(parts[::2]):
        m = _DIST_RE.match(raw.strip())
        if m:
            dist = int(m.group(1)) if m.group(1) else 1
            if dist < 1:
                raise ValueError(f"surround distance must be >= 1: {raw!r}")
            cls = (
                SpanNearClause if m.group(2).lower() == "w"
                else SpanNearUnorderedClause
            )
            clause = cls((one_term(m.group(3)), one_term(m.group(4))), dist - 1)
        else:
            if "(" in raw or ")" in raw:
                raise ValueError(
                    f"surround subset: nested subqueries not supported: {raw!r}"
                )
            clause = TermClause(one_term(raw))
        if op == "AND":
            spec.must.append(clause)
        elif op == "NOT":
            if i == 0:
                spec.must.append(clause)
            elif isinstance(clause, TermClause):
                spec.must_not.append(clause)
            else:
                raise ValueError("surround subset: NOT operand must be a term")
        else:
            spec.should.append(clause)
    return spec
