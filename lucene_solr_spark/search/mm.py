"""DisMax ``mm`` (minimum-should-match) spec grammar
(``S/util/SolrPluginUtils.java#calculateMinShouldMatch`` /
``#setMinShouldMatch``): the request-parameter language that maps the
number of OPTIONAL clauses to a required count.

Grammar (upstream-faithful, including its quirks):

- bare integer ``3`` → exactly 3; negative ``-2`` → total − 2
- percentage ``75%`` → int(total · 75 / 100) computed in FLOAT32 (the
  reference does ``(result * percent) * (1/100f)`` in Java float math —
  reproduced with np.float32 so edge percentages truncate identically);
  negative percent subtracts the truncated magnitude from the total
- conditionals ``"2<-25% 9<-3"``: space-separated ``upper<spec`` pairs,
  evaluated left to right; if the optional-clause count is <= the FIRST
  upper bound not yet exceeded the accumulated result applies — with the
  upstream's initial result = ALL clauses required (so a count at or
  below the smallest bound requires everything)
- final clamp: never above the clause count, never below 0
"""

from __future__ import annotations

import numpy as np


def calculate_min_should_match(optional_clause_count: int, spec: str) -> int:
    """Port of ``SolrPluginUtils#calculateMinShouldMatch`` semantics
    (verified against the upstream javadoc examples in
    tests/test_mm_spec.py)."""
    result = optional_clause_count
    spec = spec.strip()
    if "<" in spec:
        # normalize optional spaces around '<', then split conditionals
        spec = "<".join(p.strip() for p in spec.split("<"))
        for s in spec.split():
            upper_s, _, sub = s.partition("<")
            if not sub:
                raise ValueError(f"invalid mm conditional: {s!r}")
            upper = int(upper_s)
            if optional_clause_count <= upper:
                return result
            result = calculate_min_should_match(optional_clause_count, sub)
        return result
    if spec.endswith("%"):
        percent = int(spec[:-1])
        calc = (np.float32(result) * np.float32(percent)) * (
            np.float32(1.0) / np.float32(100.0)
        )
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    if optional_clause_count < result:
        return optional_clause_count
    return 0 if result < 0 else result
