"""Solr date-math expression parser (``S/util/DateMathParser``).

Grammar (after the instant anchor): a sequence of
``/UNIT`` (round down to unit), ``+N UNIT``, ``-N UNIT`` — e.g.
``NOW/DAY-7DAYS+3HOURS``. The anchor is ``NOW`` or an ISO-8601 instant
ending in ``Z``. All arithmetic is UTC (Solr's default TZ), naive
datetimes in/out.

Used by the range-facet date path (``facet.range.start=NOW/DAY-3DAYS``
style requests); certified by pytest goldens mirroring DateMathParser's
documented examples plus a driver entry whose oracle re-derives the same
instants with DuckDB ``date_trunc``/``INTERVAL`` arithmetic.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

_UNITS = {
    "YEAR": "year", "YEARS": "year",
    "MONTH": "month", "MONTHS": "month",
    "DAY": "day", "DAYS": "day", "DATE": "day",
    "HOUR": "hour", "HOURS": "hour",
    "MINUTE": "minute", "MINUTES": "minute", "MINS": "minute", "MIN": "minute",
    "SECOND": "second", "SECONDS": "second", "SECS": "second", "SEC": "second",
    "MILLI": "milli", "MILLIS": "milli",
    "MILLISECOND": "milli", "MILLISECONDS": "milli",
}

_OP_RE = re.compile(r"([+\-/])(\d*)([A-Z]+)")


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "year":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "month":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return dt.replace(second=0, microsecond=0)
    if unit == "second":
        return dt.replace(microsecond=0)
    if unit == "milli":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise ValueError(f"unknown unit {unit!r}")


def _add(dt: datetime, unit: str, n: int) -> datetime:
    if unit == "year":
        # calendar add (Java Calendar semantics); Feb 29 clamps to Feb 28
        y = dt.year + n
        try:
            return dt.replace(year=y)
        except ValueError:
            return dt.replace(year=y, day=28)
    if unit == "month":
        m = dt.month - 1 + n
        y, m = dt.year + m // 12, m % 12 + 1
        day = dt.day
        while True:
            try:
                return dt.replace(year=y, month=m, day=day)
            except ValueError:
                day -= 1  # clamp to month end, Calendar-style
    step = {
        "day": timedelta(days=1),
        "hour": timedelta(hours=1),
        "minute": timedelta(minutes=1),
        "second": timedelta(seconds=1),
        "milli": timedelta(milliseconds=1),
    }[unit]
    return dt + n * step


def parse_date_math(expr: str, now: datetime) -> datetime:
    """Evaluate a Solr date-math string against a fixed ``now`` instant."""
    expr = expr.strip()
    if expr.startswith("NOW"):
        dt, rest = now, expr[3:]
    else:
        # ISO anchor up to the first math operator
        m = re.match(r"([0-9T:.\-]+)Z?(.*)$", expr)
        if not m:
            raise ValueError(f"bad date math anchor in {expr!r}")
        iso, rest = m.group(1), m.group(2)
        dt = datetime.fromisoformat(iso)
    pos = 0
    for m in _OP_RE.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"unparsed date math at {rest[pos:]!r}")
        pos = m.end()
        op, num, unit_tok = m.groups()
        unit = _UNITS.get(unit_tok)
        if unit is None:
            raise ValueError(f"unknown date math unit {unit_tok!r}")
        if op == "/":
            if num:
                raise ValueError("rounding takes no count")
            dt = _round_down(dt, unit)
        else:
            n = int(num) if num else 1
            dt = _add(dt, unit, n if op == "+" else -n)
    if pos != len(rest):
        raise ValueError(f"unparsed date math tail {rest[pos:]!r}")
    return dt
