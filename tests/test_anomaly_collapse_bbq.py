"""rolling_mad_anomaly, collapse_inner_hits, bbq_rescore_topk."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from connectors_spark.operators.anomaly import rolling_mad_anomaly
from connectors_spark.operators.query import collapse_inner_hits
from connectors_spark.operators.similarity import bbq_rescore_topk


def test_anomaly_flags_spike_not_baseline(spark):
    # 13 quiet days then one 10x spike: only the spike crosses
    vals = [10, 11, 10, 9, 10, 11, 10, 10, 9, 11, 10, 10, 100]
    rows = [("a", d, v) for d, v in enumerate(vals)]
    daily = spark.createDataFrame(rows, "k string, day int, cnt int")
    out = rolling_mad_anomaly(daily, "k", "day", "cnt",
                              window=7, threshold=3.0)
    got = {r.day: r for r in out.collect()}
    assert got[12].is_anomaly
    assert not any(got[d].is_anomaly for d in range(12))
    # day 12 window = [9,11,10,10,100,...last7]: median stays ~10
    assert got[12].med == pytest.approx(10.0)


def test_anomaly_median_mad_match_numpy(spark):
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 50, size=30).tolist()
    daily = spark.createDataFrame(
        [("k", d, v) for d, v in enumerate(vals)],
        "k string, day int, cnt int")
    out = {r.day: r for r in
           rolling_mad_anomaly(daily, "k", "day", "cnt",
                               window=7).collect()}
    for d in range(30):
        wnd = np.array(vals[max(0, d - 6):d + 1], dtype=float)
        med = np.median(wnd)
        mad = np.median(np.abs(wnd - med))
        assert out[d].med == pytest.approx(med)
        assert out[d].mad == pytest.approx(mad)
        expect = abs(vals[d] - med) / max(1.4826 * mad, 1.0)
        assert out[d].score == pytest.approx(round(expect, 6), abs=1e-6)


def test_anomaly_window_partitioned_per_key(spark):
    rows = [("a", d, 10) for d in range(8)] + [("b", d, 1000)
                                               for d in range(8)]
    daily = spark.createDataFrame(rows, "k string, day int, cnt int")
    out = rolling_mad_anomaly(daily, "k", "day", "cnt", window=7)
    # flat series per key -> score 0 everywhere (no cross-key bleed)
    assert all(r.score == 0.0 for r in out.collect())


@pytest.fixture(scope="module")
def scored_langs(spark):
    rows = []
    # lang l0 best (scores 9.x), l1 next, l2, l3 worst; 5 docs each
    for li in range(4):
        for d in range(5):
            rows.append((li * 10 + d, float(9 - li) - d * 0.1,
                         f"l{li}"))
    return spark.createDataFrame(rows, "doc_id long, score double, "
                                       "lang string")


def test_collapse_inner_hits_shape_and_order(scored_langs):
    got = collapse_inner_hits(scored_langs, "lang",
                              inner_n=3, top_groups=2).collect()
    assert len(got) == 6
    by = {(r.group_rank, r.inner_rank): r for r in got}
    assert by[(1, 1)].lang == "l0" and by[(1, 1)].doc_id == 0
    assert by[(1, 3)].doc_id == 2
    assert by[(2, 1)].lang == "l1" and by[(2, 1)].doc_id == 10
    assert all(r.group_size == 5 for r in got)


def test_collapse_inner_hits_matches_collapse_field_best(spark,
                                                         scored_langs):
    from connectors_spark.operators.query import collapse_field

    best = {r.lang: r.doc_id
            for r in collapse_field(scored_langs, "lang", top_n=4)
            .collect()}
    inner = collapse_inner_hits(scored_langs, "lang",
                                inner_n=1, top_groups=4).collect()
    assert {r.lang: r.doc_id for r in inner} == best


N_VEC, DIM = 120, 8


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(11)
    m = rng.randn(N_VEC, DIM).astype(np.float64)
    rows = [(i, m[i].tolist()) for i in range(N_VEC)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), m


def test_bbq_rescore_exact_scores_and_recall(vec_df):
    df, m = vec_df
    qs = df.filter(F.col("vec_id") == 0)
    got = bbq_rescore_topk(df, qs, k=5, oversample=6).collect()
    got.sort(key=lambda r: r.rank)
    # exact scores are true f64 cosines
    norms = np.sqrt((m * m).sum(axis=1))
    cos = np.round(m @ m[0] / (norms * norms[0]), 6)
    cos[0] = -2  # self excluded
    for r in got:
        assert r.score == pytest.approx(cos[r.vec_id], abs=2e-6)
    # with a healthy oversample the top-5 equal exact brute force
    exact_top = np.argsort([(-c, i) for i, c in enumerate(cos)], axis=0)
    order = sorted(range(N_VEC), key=lambda i: (-cos[i], i))[:5]
    assert [r.vec_id for r in got] == order
    # coarse score close to exact (int8 error is small)
    for r in got:
        assert abs(r.coarse - r.score) < 0.05


def test_bbq_flat_vector_quantizes_without_nan(spark):
    rows = [(0, [1.0] * 4), (1, [1.0, 2.0, 3.0, 4.0]),
            (2, [2.0, 2.0, 2.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = bbq_rescore_topk(df, df.filter(F.col("vec_id") == 1),
                           k=2, oversample=2).collect()
    assert len(got) == 2
    assert all(r.score is not None and r.coarse is not None for r in got)


def test_alert_episodes_throttle(spark):
    from connectors_spark.operators.anomaly import alert_episodes
    import datetime as dt

    d = dt.date
    rows = [
        # k=a: breach days 2,3,4 (one episode -> fires once at day 2),
        # then a gap > throttle, breach day 8 fires again
        ("a", d(2024, 1, 1), 1.0), ("a", d(2024, 1, 2), 9.0),
        ("a", d(2024, 1, 3), 9.0), ("a", d(2024, 1, 4), 9.0),
        ("a", d(2024, 1, 5), 1.0), ("a", d(2024, 1, 6), 1.0),
        ("a", d(2024, 1, 7), 1.0), ("a", d(2024, 1, 8), 9.0),
        # k=b: breaches separated by exactly throttle_days (2) do NOT
        # re-fire (datediff must EXCEED the throttle)
        ("b", d(2024, 1, 1), 9.0), ("b", d(2024, 1, 3), 9.0),
        ("b", d(2024, 1, 6), 9.0),
    ]
    daily = spark.createDataFrame(rows, "k string, day date, m double")
    out = alert_episodes(daily, "k", "day", "m", 5.0, throttle_days=2)
    got = {(r.k, str(r.day)): (r.breached, r.fired)
           for r in out.collect()}
    assert got[("a", "2024-01-02")] == (True, True)
    assert got[("a", "2024-01-03")] == (True, False)   # throttled
    assert got[("a", "2024-01-04")] == (True, False)   # throttled
    assert got[("a", "2024-01-05")] == (False, False)
    assert got[("a", "2024-01-08")] == (True, True)    # new episode
    assert got[("b", "2024-01-01")] == (True, True)
    assert got[("b", "2024-01-03")] == (True, False)   # gap == throttle
    assert got[("b", "2024-01-06")] == (True, True)    # gap > throttle
