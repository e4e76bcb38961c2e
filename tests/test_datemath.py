"""ES date-math grammar semantics (functions/datemath.py)."""

from datetime import datetime

import pytest

from connectors_spark.functions.datemath import (
    DateMathError,
    parse_date_math,
)

NOW = datetime(2024, 3, 15, 10, 30, 45, 123456)


def test_anchor_forms():
    assert parse_date_math("2024-01-05") == datetime(2024, 1, 5)
    assert parse_date_math("2024-01-05T06:07:08") == \
        datetime(2024, 1, 5, 6, 7, 8)
    assert parse_date_math("2024-02") == datetime(2024, 2, 1)
    assert parse_date_math("now", now=NOW) == NOW


def test_arithmetic_and_rounding():
    assert parse_date_math("now-7d", now=NOW) == \
        datetime(2024, 3, 8, 10, 30, 45, 123456)
    assert parse_date_math("now-7d/d", now=NOW) == datetime(2024, 3, 8)
    assert parse_date_math("now/h", now=NOW) == \
        datetime(2024, 3, 15, 10)
    assert parse_date_math("now+2h-30m/m", now=NOW) == \
        datetime(2024, 3, 15, 12, 0, 0)  # /m truncates seconds
    assert parse_date_math("2024-01-10||+5d/d") == datetime(2024, 1, 15)


def test_week_rounds_to_monday():
    # 2024-01-03 is a Wednesday; its week's Monday is 2024-01-01
    assert parse_date_math("2024-01-03||/w") == datetime(2024, 1, 1)
    # a Monday rounds to itself
    assert parse_date_math("2024-01-08||/w") == datetime(2024, 1, 8)


def test_month_arithmetic_clamps_day():
    # Joda/ES behavior: Jan 31 + 1M = Feb 29 (2024 is a leap year)
    assert parse_date_math("2024-01-31||+1M") == datetime(2024, 2, 29)
    assert parse_date_math("2023-01-31||+1M") == datetime(2023, 2, 28)
    assert parse_date_math("2024-12-15||+1M") == datetime(2025, 1, 15)
    assert parse_date_math("2024-03-31||-1M") == datetime(2024, 2, 29)
    assert parse_date_math("2024-06-10||+2y/y") == datetime(2026, 1, 1)


def test_errors():
    with pytest.raises(DateMathError, match="anchor"):
        parse_date_math("not-a-date||/d")
    with pytest.raises(DateMathError, match="adjustment|trailing"):
        parse_date_math("now/q", now=NOW)
    with pytest.raises(DateMathError, match="trailing|adjustment"):
        parse_date_math("now-7dx", now=NOW)
    with pytest.raises(DateMathError, match="empty"):
        parse_date_math("  ")


def test_date_math_fuzz_never_crashes_untyped():
    """Property: any string either parses or raises DateMathError —
    never an untyped exception; rounding is idempotent; +Nd / -Nd
    cancel."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=400, deadline=None)
    @given(st.text(alphabet="now0123456789yMwdhHms+-/|T:. ", max_size=24))
    def check(s):
        try:
            parse_date_math(s, now=NOW)
        except DateMathError:
            pass

    check()

    @settings(max_examples=100, deadline=None)
    @given(st.integers(0, 500), st.sampled_from("yMwdhHms"))
    def invariants(n, unit):
        once = parse_date_math(f"now/{unit}", now=NOW)
        assert parse_date_math(f"now/{unit}/{unit}", now=NOW) == once
        assert parse_date_math(f"now+{n}d-{n}d", now=NOW) == NOW

    invariants()
