"""Quartz-cron next-run (C8)."""

from datetime import datetime

import pytest

from connectors_spark.plans.cron import CronError, next_run

T = datetime(2025, 3, 10, 14, 30, 45)  # Monday


def test_every_minute():
    assert next_run("0 * * * * ?", T) == datetime(2025, 3, 10, 14, 31, 0)


def test_daily_at_noon():
    assert next_run("0 0 12 * * ?", T) == datetime(2025, 3, 11, 12, 0, 0)


def test_step_and_list():
    assert next_run("0 */15 * * * ?", T) == datetime(2025, 3, 10, 14, 45, 0)
    assert next_run("0 5,35 9-17 * * ?", T) == datetime(2025, 3, 10, 14, 35, 0)


def test_mixed_literal_and_step_in_list():
    # '5,10/20' = {5} ∪ {10,30,50}: the literal 5 must NOT expand to 5..59
    # (Quartz semantics; the step applies only to the part that carries it)
    assert next_run("5,10/20 * * * * ?", T) == datetime(2025, 3, 10, 14, 30, 50)
    t = datetime(2025, 3, 10, 14, 30, 50)
    assert next_run("5,10/20 * * * * ?", t) == datetime(2025, 3, 10, 14, 31, 5)
    # and NOT every second: 14:30:46 is not a fire time
    assert next_run("5,10/20 * * * * ?", T) != datetime(2025, 3, 10, 14, 30, 46)


def test_dow_and_month_names():
    # next Friday
    assert next_run("0 0 0 ? * FRI", T) == datetime(2025, 3, 14, 0, 0, 0)
    # first second of next July
    assert next_run("0 0 0 1 JUL ?", T) == datetime(2025, 7, 1, 0, 0, 0)


def test_seven_field_and_strictly_after():
    assert next_run("0 0 12 * * ? 2099", T) == datetime(2025, 3, 11, 12, 0, 0)
    t = datetime(2025, 3, 10, 12, 0, 0)
    assert next_run("0 0 12 * * ?", t) == datetime(2025, 3, 11, 12, 0, 0)


def test_dom_29_february():
    assert next_run("0 0 0 29 FEB ?", T) == datetime(2028, 2, 29, 0, 0, 0)


def test_invalid():
    with pytest.raises(CronError):
        next_run("0 0 25 * * ?", T)
    with pytest.raises(CronError):
        next_run("* * *", T)
