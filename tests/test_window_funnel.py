"""Ordered-step funnel conversion (ClickHouse windowFunnel shape)."""

import datetime as dt

from connectors_spark.operators.transform import window_funnel

STEPS = ["view", "click", "purchase"]


def _df(spark, rows):
    t0 = dt.datetime(2025, 1, 1)
    data = [(u, t0 + dt.timedelta(microseconds=us), et)
            for u, us, et in rows]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string")


def _levels(spark, rows, window_us=100):
    df = _df(spark, rows)
    return {r["key"]: r["funnel_level"]
            for r in window_funnel(df, STEPS, window_us).collect()}


def test_funnel_levels_closed_form(spark):
    rows = [
        (1, 0, "view"), (1, 10, "click"), (1, 50, "purchase"),   # 3
        (2, 0, "view"), (2, 10, "click"), (2, 200, "purchase"),  # 2
        (3, 0, "view"), (3, 5, "purchase"), (3, 10, "click"),    # 2
        (4, 0, "click"), (4, 10, "purchase"),                    # 0
        (5, 0, "view"), (5, 200, "click"),                       # 1
    ]
    assert _levels(spark, rows) == {1: 3, 2: 2, 3: 2, 4: 0, 5: 1}


def test_greedy_earliest_next_is_optimal(spark):
    # greedy t2=10 still reaches the purchase at 95 inside the window
    rows = [(6, 0, "view"), (6, 10, "click"), (6, 90, "click"),
            (6, 95, "purchase")]
    assert _levels(spark, rows) == {6: 3}


def test_max_over_multiple_starts(spark):
    # start at 0 dies (click outside window); start at 100 completes
    rows = [(7, 0, "view"), (7, 150, "click"), (7, 100, "view"),
            (7, 160, "purchase")]
    assert _levels(spark, rows) == {7: 3}


def test_strictly_increasing_times_required(spark):
    # click at the SAME instant as the view does not chain
    rows = [(8, 0, "view"), (8, 0, "click")]
    assert _levels(spark, rows) == {8: 1}


def test_two_step_funnel(spark):
    df = _df(spark, [(9, 0, "view"), (9, 30, "click")])
    got = {r["key"]: r["funnel_level"]
           for r in window_funnel(df, ["view", "click"], 100).collect()}
    assert got == {9: 2}


def test_duplicate_steps_rejected(spark):
    import pytest as _pt
    df = _df(spark, [(1, 0, "view")])
    with _pt.raises(ValueError):
        window_funnel(df, ["view", "click", "view"], 100)
