"""SimpleQueryParser → BooleanSpec.

Analog of ``L/queryparser/simple/SimpleQueryParser.java`` — the
end-user-safe grammar whose defining property is that it NEVER throws:
any malformed operator sequence degrades to plain text instead of an
error. Supported operators (the upstream default feature set, minus
NEAR_OPERATOR which the classic parser's phrase slop already covers):

- whitespace      → default operator (OR, ``SHOULD`` — upstream default)
- ``+``           → AND  (both neighbours required)
- ``|``           → OR
- ``-``           → NOT  (next atom prohibited)
- ``"..."``       → phrase (analyzed, stop holes preserved); trailing
  ``~N`` = slop
- trailing ``*``  → prefix query, expanded against the term dictionary
  (SCORING_BOOLEAN rewrite — the engine's MultiTermQuery discipline)
- ``(...)``       → grouping at ONE level (a pure disjunction compiles to
  one OrGroupClause, the flat-kernel subtree; deeper mixes degrade to the
  surrounding default operator — degrading, never raising, IS the
  SimpleQueryParser contract)

Graceful-degradation rules mirrored from upstream: an unbalanced quote
consumes to end-of-string as the phrase body; a dangling operator at the
end is ignored; consecutive operators keep the LAST one; ``-`` applied to
nothing is dropped. The parser therefore accepts EVERY input string.

Operator precedence note: upstream builds a left-to-right tree where
``+`` binds the two adjacent atoms. With the flat boolean kernels the
faithful subset is: any ``+`` in a (sub)expression promotes ALL its atoms
to MUST (the conjunction the user asked for); otherwise atoms are SHOULD.
This matches upstream exactly for the homogeneous expressions the entry
fixtures use and is documented as the flat-engine approximation for mixed
``a + b | c`` chains (upstream: ``(a AND b) OR c``).
"""

from __future__ import annotations

import re

from .query import BooleanSpec, OrGroupClause, PhraseClause, TermClause

_ATOM_RE = re.compile(r'[^\s+|()"-][^\s+|()"]*')


def _atoms(segment: str, analyzer, expand):
    """Parse one parenthesis-free segment → (clauses, prohibited, has_plus).

    Returns analyzed clause objects for the kept atoms, the prohibited
    (``-``-prefixed) term clauses, and whether a ``+`` operator appeared.
    """
    clauses: list = []
    prohibited: list = []
    has_plus = False
    i, n = 0, len(segment)
    negate_next = False
    while i < n:
        ch = segment[i]
        if ch.isspace():
            i += 1
        elif ch == "+":
            has_plus = True
            negate_next = False
            i += 1
        elif ch == "|":
            negate_next = False
            i += 1
        elif ch == "-":
            negate_next = True
            i += 1
        elif ch == '"':
            j = segment.find('"', i + 1)
            body = segment[i + 1:j] if j >= 0 else segment[i + 1:]
            i = (j + 1) if j >= 0 else n
            slop = 0
            m = re.match(r"~(\d+)", segment[i:])
            if m:
                slop, i = int(m.group(1)), i + m.end()
            analyzed = analyzer.analyze(body)
            if analyzed:
                if len(analyzed) == 1:
                    cl = TermClause(analyzed[0][0])
                else:
                    base = analyzed[0][1]
                    cl = PhraseClause(
                        tuple(t for t, _ in analyzed),
                        tuple(p - base for _, p in analyzed),
                        slop=slop,
                    )
                (prohibited if negate_next else clauses).append(cl)
            negate_next = False
        else:
            m = _ATOM_RE.match(segment, i)
            if not m:  # stray operator char — degrade: skip it
                i += 1
                continue
            word = m.group(0)
            i = m.end()
            if word.endswith("*") and expand is not None:
                terms = expand("prefix", word[:-1].lower())
                if terms:
                    cl = (
                        TermClause(terms[0]) if len(terms) == 1
                        else OrGroupClause(tuple(terms))
                    )
                else:
                    cl = None
            else:
                analyzed = analyzer.analyze(word.rstrip("*"))
                if not analyzed:
                    cl = None
                elif len(analyzed) == 1:
                    cl = TermClause(analyzed[0][0])
                else:
                    cl = OrGroupClause(tuple(t for t, _ in analyzed))
            if cl is not None:
                (prohibited if negate_next else clauses).append(cl)
            negate_next = False
    return clauses, prohibited, has_plus


def parse_simple(query: str, analyzer, expand=None) -> BooleanSpec:
    """Parse one SimpleQueryParser string; never raises on user input."""
    spec = BooleanSpec()
    # one level of (...) groups: a parenthesised pure disjunction becomes
    # one OrGroupClause atom in the surrounding expression
    out_parts: list[str] = []
    group_clauses: list = []
    depth = 0
    start = 0
    for i, ch in enumerate(query):
        if ch == "(" and depth == 0:
            out_parts.append(query[start:i])
            start = i + 1
            depth = 1
        elif ch == "(" and depth:
            depth += 1  # nested: swallowed into the group text (degrades)
        elif ch == ")" and depth:
            depth -= 1
            if depth == 0:
                inner, inner_neg, inner_plus = _atoms(
                    query[start:i], analyzer, expand
                )
                if inner and not inner_neg and not inner_plus and all(
                    isinstance(c, TermClause) for c in inner
                ):
                    group_clauses.append(
                        OrGroupClause(tuple(c.term for c in inner))
                    )
                else:
                    # mixed group: degrade — splice its text back into the
                    # outer expression (never raise)
                    out_parts.append(" " + query[start:i] + " ")
                start = i + 1
    out_parts.append(query[start:] if depth == 0 else query[start:])
    clauses, prohibited, has_plus = _atoms(
        " ".join(out_parts), analyzer, expand
    )
    clauses.extend(group_clauses)
    if has_plus:
        spec.must.extend(clauses)
    else:
        spec.should.extend(clauses)
    for cl in prohibited:
        if isinstance(cl, TermClause):
            spec.must_not.append(cl)
        # prohibited phrases/groups degrade to their first term (flat
        # must_not is term-only) — still never raises
        elif isinstance(cl, PhraseClause):
            spec.must_not.append(TermClause(cl.terms[0]))
        elif isinstance(cl, OrGroupClause):
            spec.must_not.extend(TermClause(t) for t in cl.terms)
    return spec
