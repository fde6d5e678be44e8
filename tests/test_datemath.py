"""Goldens for the Solr date-math parser (``S/util/DateMathParser``)."""

from datetime import datetime

import pytest

from lucene_solr_spark.util.datemath import parse_date_math

NOW = datetime(2024, 1, 5, 13, 27, 42, 123456)


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("NOW", NOW),
        ("NOW/DAY", datetime(2024, 1, 5)),
        ("NOW/HOUR", datetime(2024, 1, 5, 13)),
        ("NOW/MINUTE", datetime(2024, 1, 5, 13, 27)),
        ("NOW/SECOND", datetime(2024, 1, 5, 13, 27, 42)),
        ("NOW/YEAR", datetime(2024, 1, 1)),
        ("NOW/MONTH", datetime(2024, 1, 1)),
        ("NOW/DAY-7DAYS", datetime(2023, 12, 29)),
        ("NOW/DAY+3DAYS", datetime(2024, 1, 8)),
        ("NOW+2YEARS", datetime(2026, 1, 5, 13, 27, 42, 123456)),
        ("NOW-1DAY", datetime(2024, 1, 4, 13, 27, 42, 123456)),
        # implicit count of 1
        ("NOW/DAY+DAY", datetime(2024, 1, 6)),
        # chained ops evaluate left to right
        ("NOW/DAY-7DAYS+3HOURS", datetime(2023, 12, 29, 3)),
        ("NOW/HOUR+30MINUTES", datetime(2024, 1, 5, 13, 30)),
        # month arithmetic with end-of-month clamp (Calendar semantics)
        ("2024-01-31T00:00:00Z+1MONTH", datetime(2024, 2, 29)),
        ("2023-01-31T00:00:00Z+1MONTH", datetime(2023, 2, 28)),
        ("2024-03-31T00:00:00Z-1MONTH", datetime(2024, 2, 29)),
        # leap-day year arithmetic clamps to Feb 28
        ("2024-02-29T12:00:00Z+1YEAR", datetime(2025, 2, 28, 12)),
        # ISO anchor with math
        ("2024-01-05T13:27:00Z/DAY-3DAYS", datetime(2024, 1, 2)),
        ("2024-06-15T10:30:00Z/MONTH+6MONTHS", datetime(2024, 12, 1)),
        # month rollover across years
        ("2024-11-15T00:00:00Z+3MONTHS", datetime(2025, 2, 15)),
        ("2024-02-15T00:00:00Z-3MONTHS", datetime(2023, 11, 15)),
        ("NOW/MILLI", datetime(2024, 1, 5, 13, 27, 42, 123000)),
        ("NOW+500MILLIS", datetime(2024, 1, 5, 13, 27, 42, 623456)),
    ],
)
def test_date_math_goldens(expr, expected):
    assert parse_date_math(expr, NOW) == expected


@pytest.mark.parametrize(
    "bad", ["NOW/5DAYS", "NOW+DAYZ", "NOW*3DAYS", "NOW/DAY junk", "gibberish"]
)
def test_date_math_rejects(bad):
    with pytest.raises(ValueError):
        parse_date_math(bad, NOW)
