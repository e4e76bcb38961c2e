"""as-of join + gap-fill unit semantics (operators/timeseries.py)."""

import math

import pytest

from connectors_spark.operators.timeseries import asof_join, gapfill


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def trades(spark):
    # left: lookups; right: quotes — classic as-of fixture
    left = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:00:05"),
         (2, "a", "2024-01-01 10:00:10"),
         (3, "b", "2024-01-01 10:00:01"),
         (4, "c", "2024-01-01 10:00:10")],
        "id long, k string, ts string",
    ).selectExpr("id", "k", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1.0),
         ("a", "2024-01-01 10:00:10", 2.0),
         ("b", "2024-01-01 10:00:02", 5.0)],
        "k string, ts string, px double",
    ).selectExpr("k", "cast(ts as timestamp) ts", "px")
    return left, right


def test_asof_backward_inclusive(trades):
    left, right = trades
    out = asof_join(left, right, on="k", left_ts="ts",
                    right_cols=["px"])
    got = {r.id: r.px for r in out.collect()}
    # id 1: latest quote <= 10:00:05 is 10:00:00 -> 1.0
    # id 2: quote AT 10:00:10 matches (inclusive) -> 2.0
    # id 3: no quote <= 10:00:01 for b -> NULL
    # id 4: key c has no quotes at all -> NULL (left outer)
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: None}
    assert out.count() == left.count()  # left-preserving


def test_asof_strict_excludes_equal_ts(trades):
    left, right = trades
    out = asof_join(left, right, on="k", left_ts="ts",
                    right_cols=["px"], strict=True)
    got = {r.id: r.px for r in out.collect()}
    # id 2: the 10:00:10 quote is now excluded -> falls back to 1.0
    assert got[2] == 1.0
    assert got[1] == 1.0 and got[3] is None


def test_asof_tolerance_drops_stale_match(trades):
    left, right = trades
    out = asof_join(left, right, on="k", left_ts="ts",
                    right_cols=["px"], tolerance_sec=3)
    got = {r.id: r.px for r in out.collect()}
    # id 1: match is 5s old > 3s tolerance -> NULL; id 2: 0s old -> 2.0
    assert got[1] is None and got[2] == 2.0
    assert out.count() == left.count()


def test_asof_matched_ts_column_suffixed(trades):
    left, right = trades
    out = asof_join(left, right, on="k", left_ts="ts",
                    right_cols=["px"])
    assert "ts_r" in out.columns  # collision with left's ts -> suffix
    by_id = {r.id: r.ts_r for r in out.collect()}
    assert str(by_id[2]) == "2024-01-01 10:00:10"


def test_asof_reserved_column_rejected(spark, trades):
    left, right = trades
    bad = left.withColumnRenamed("id", "__tag")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(bad, right, on="k", left_ts="ts")


def test_gapfill_locf_and_interp(spark):
    df = spark.createDataFrame(
        [("u", 0, 10.0), ("u", 40, 30.0), ("v", 25, 7.0)],
        "k string, sec long, val double",
    ).selectExpr("k", "cast(sec as timestamp) ts", "val")
    out = gapfill(df, key="k", ts="ts", value="val", bucket_sec=10)
    rows = {(r.k, r.bucket): (r.v, r.locf_v, r.interp_v)
            for r in out.collect()}
    # u spans buckets 0..40: gaps at 10,20,30 lerp 10->30 over 4 steps
    assert rows[("u", 0)] == (10.0, 10.0, 10.0)
    assert rows[("u", 10)] == (None, 10.0, 15.0)
    assert rows[("u", 20)] == (None, 10.0, 20.0)
    assert rows[("u", 30)] == (None, 10.0, 25.0)
    assert rows[("u", 40)] == (30.0, 30.0, 30.0)
    # v: single bucket -> one-element spine (sequence(mn, mn) is valid)
    assert rows[("v", 20)] == (7.0, 7.0, 7.0)
    assert len(rows) == 6


def test_gapfill_trailing_gap_is_locf_leading_stays_null(spark):
    # two real buckets with a spine that still starts/ends on data:
    # force a leading gap by checking interp semantics on a crafted
    # frame where the first spine bucket is a gap is impossible by
    # construction (bounds come from data) — instead verify the
    # branch orders: a gap between points lerps, after-last would locf.
    df = spark.createDataFrame(
        [("u", 0, 1.0), ("u", 10, 1.0), ("u", 30, 4.0)],
        "k string, sec long, val double",
    ).selectExpr("k", "cast(sec as timestamp) ts", "val")
    out = gapfill(df, key="k", ts="ts", value="val", bucket_sec=10)
    rows = {r.bucket: (r.locf_v, r.interp_v) for r in out.collect()}
    assert rows[20] == (1.0, 2.5)  # midpoint of 1.0 -> 4.0
    assert rows[30] == (4.0, 4.0)


def test_gapfill_agg_validation(spark):
    df = spark.createDataFrame([("u", 0, 1.0)], "k string, sec long, "
                               "val double").selectExpr(
        "k", "cast(sec as timestamp) ts", "val")
    with pytest.raises(ValueError, match="unknown agg"):
        gapfill(df, key="k", ts="ts", value="val", bucket_sec=10,
                agg="median")


def test_gapfill_sum_agg(spark):
    df = spark.createDataFrame(
        [("u", 1, 2.0), ("u", 3, 3.0), ("u", 21, 1.0)],
        "k string, sec long, val double",
    ).selectExpr("k", "cast(sec as timestamp) ts", "val")
    out = gapfill(df, key="k", ts="ts", value="val", bucket_sec=10,
                  agg="sum")
    rows = {r.bucket: r.v for r in out.collect()}
    assert rows[0] == 5.0 and rows[10] is None and rows[20] == 1.0


def test_asof_plan_has_no_cartesian(trades):
    left, right = trades
    out = asof_join(left, right, on="k", left_ts="ts",
                    right_cols=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Independent oracle: pandas.merge_asof implements the same
    backward as-of semantics from a separate codebase — 600 random
    lookups against 300 quotes across 8 keys, all three variants."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    left_pd = pd.DataFrame({
        "id": np.arange(600),
        "k": rng.integers(0, 8, 600).astype("int64"),
        "ts": pd.to_datetime(rng.integers(0, 10_000, 600), unit="s"),
    })
    right_pd = pd.DataFrame({
        "k": rng.integers(0, 8, 300).astype("int64"),
        "ts": pd.to_datetime(rng.integers(0, 10_000, 300), unit="s"),
        "px": np.round(rng.random(300), 6),
    })
    # merge_asof needs unique (k, ts) on the right for determinism —
    # same precondition asof_join documents; dedupe keeping max px
    right_pd = (right_pd.sort_values(["k", "ts", "px"])
                .drop_duplicates(["k", "ts"], keep="last")
                .reset_index(drop=True))

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)

    for kwargs, pd_kwargs in [
        (dict(), dict(allow_exact_matches=True)),
        (dict(strict=True), dict(allow_exact_matches=False)),
        (dict(tolerance_sec=500),
         dict(allow_exact_matches=True,
              tolerance=pd.Timedelta(seconds=500))),
    ]:
        got = {r.id: r.px for r in asof_join(
            left, right, on="k", left_ts="ts",
            right_cols=["px"], **kwargs).collect()}
        exp_df = pd.merge_asof(
            left_pd.sort_values("ts"), right_pd.sort_values("ts"),
            on="ts", by="k", direction="backward", **pd_kwargs)
        exp = {int(r.id): (None if pd.isna(r.px) else float(r.px))
               for r in exp_df.itertuples()}
        assert got == exp, f"variant {kwargs} diverged from merge_asof"


def test_gapfill_matches_pandas_resample_oracle(spark):
    """Independent oracle: pandas resample + ffill/interpolate on a
    seeded random series per key."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    rows = []
    for k in ("a", "b"):
        ts = np.sort(rng.choice(np.arange(0, 600, 10), 12,
                                replace=False))
        for t in ts:
            rows.append((k, int(t), float(np.round(rng.random(), 6))))
    pdf = pd.DataFrame(rows, columns=["k", "sec", "val"])
    df = (spark.createDataFrame(pdf)
          .selectExpr("k", "cast(sec as timestamp) ts", "val"))
    got = {(r.k, r.bucket): (r.locf_v, r.interp_v)
           for r in gapfill(df, key="k", ts="ts", value="val",
                            bucket_sec=10).collect()}

    for k in ("a", "b"):
        sub = pdf[pdf.k == k].copy()
        sub["ts"] = pd.to_datetime(sub.sec, unit="s")
        ser = sub.set_index("ts").val.resample("10s").mean()
        locf = ser.ffill()
        # pandas interpolate(method="time") == our lerp on the spine;
        # trailing NaNs (none here: series ends on data) ffill
        interp = ser.interpolate(method="time").ffill()
        for t, lv in locf.items():
            b = int(t.timestamp())
            gl, gi = got[(k, b)]
            assert gl == pytest.approx(lv, rel=1e-9), (k, b, "locf")
            assert gi == pytest.approx(interp[t], rel=1e-9), (k, b)
    assert len(got) == sum(
        1 for k in ("a", "b")
        for _ in pd.date_range(
            pd.to_datetime(pdf[pdf.k == k].sec.min(), unit="s"),
            pd.to_datetime(pdf[pdf.k == k].sec.max(), unit="s"),
            freq="10s"))


def test_predict_linear_exact_line(spark):
    from connectors_spark.operators.timeseries import predict_linear
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    rows = [("m", t0 + dt.timedelta(seconds=s), 1.0 + 0.1 * s)
            for s in (0, 10, 20)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    r = predict_linear(df, horizon_sec=3600).collect()[0]
    assert r["n"] == 3
    assert r["slope"] == 0.1
    # last sample value 3.0 at x=20; predicted at x=3620 -> 1 + 0.1*3620
    assert r["predicted"] == 363.0


def test_predict_linear_constant_and_degenerate(spark):
    from connectors_spark.operators.timeseries import predict_linear
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    rows = ([("flat", t0 + dt.timedelta(seconds=s), 7.5) for s in (0, 60, 120)]
            + [("one", t0, 4.0)])
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double")
    got = {r["series"]: r for r in predict_linear(df).collect()}
    assert got["flat"]["slope"] == 0.0
    assert got["flat"]["predicted"] == 7.5
    # single timestamp: vx = 0 -> NULL fit
    assert got["one"]["slope"] is None
    assert got["one"]["predicted"] is None
