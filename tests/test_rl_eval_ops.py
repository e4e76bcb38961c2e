"""RL / eval data-pipeline operators — closed-form oracles:
GRPO group advantage (Shao 2024), unbiased pass@k (Chen 2021 eq. 1),
self-consistency majority vote (Wang 2022), and PromQL
histogram_quantile interpolation."""

import math

from pyspark.sql import functions as F


def _grpo(spark, rows):
    from connectors_spark.operators.pretrain import grpo_advantage

    df = spark.createDataFrame(rows,
                               "prompt_id long, doc_id long, reward double")
    out = grpo_advantage(df).collect()
    return {r.doc_id: r for r in out}


def test_grpo_advantage_closed_form(spark):
    # group [0.2, 0.4, 0.6]: mean .4, std_pop = sqrt(0.08/3)
    got = _grpo(spark, [(1, 10, 0.2), (1, 11, 0.4), (1, 12, 0.6)])
    z = round(0.2 / math.sqrt(0.08 / 3), 6)  # 1.224745
    assert got[10].advantage == -z
    assert got[11].advantage == 0.0
    assert got[12].advantage == z
    assert all(got[d].n_group == 3 for d in (10, 11, 12))


def test_grpo_zero_variance_and_singleton(spark):
    got = _grpo(spark, [(1, 1, 0.5), (1, 2, 0.5), (2, 3, 0.9)])
    assert got[1].advantage == 0.0 and got[2].advantage == 0.0
    assert got[3].advantage == 0.0 and got[3].n_group == 1


def _passk(spark, rows, ks):
    from connectors_spark.operators.pretrain import pass_at_k

    df = spark.createDataFrame(rows, "problem_id long, correct boolean")
    out = pass_at_k(df, ks=ks).collect()
    return {r.problem_id: r for r in out}


def test_pass_at_k_closed_form(spark):
    # n=10, c=3: pass@1 = 1 - 7/10; pass@5 = 1 - C(7,5)/C(10,5)
    #                                      = 1 - 21/252; pass@10 = 1
    rows = [(1, i < 3) for i in range(10)]
    got = _passk(spark, rows, ks=(1, 5, 10))[1]
    assert (got.n_samples, got.n_correct) == (10, 3)
    assert got.pass_at_1 == 0.3
    assert got.pass_at_5 == round(1 - 21 / 252, 6)
    assert got.pass_at_10 == 1.0


def test_pass_at_k_none_correct_and_undefined(spark):
    rows = [(1, False) for _ in range(10)] + [(2, True), (2, False),
                                              (2, False)]
    got = _passk(spark, rows, ks=(1, 5, 10))
    assert got[1].pass_at_1 == 0.0
    assert got[1].pass_at_5 == 0.0
    # problem 2 has n=3 < k for k=5,10 -> estimator undefined (NULL)
    assert got[2].pass_at_1 == round(1 - 2 / 3, 6)
    assert got[2].pass_at_5 is None and got[2].pass_at_10 is None


def _vote(spark, answers):
    from connectors_spark.operators.pretrain import self_consistency_vote

    df = spark.createDataFrame([(1, a) for a in answers],
                               "problem_id long, answer long")
    return self_consistency_vote(df).collect()[0]


def test_self_consistency_majority(spark):
    r = _vote(spark, [1, 1, 2, 3])
    assert (r.voted_answer, r.n_votes_win, r.n_total,
            r.n_distinct_answers, r.vote_share) == (1, 2, 4, 3, 0.5)


def test_self_consistency_tie_breaks_to_smallest_answer(spark):
    r = _vote(spark, [2, 2, 1, 1, 3])
    assert (r.voted_answer, r.n_votes_win, r.vote_share) == (1, 2, 0.4)


def _hq(spark, buckets, qs):
    from connectors_spark.operators.timeseries import histogram_quantile

    df = spark.createDataFrame([("m", le, c) for le, c in buckets],
                               "metric string, le double, cnt long")
    out = histogram_quantile(df, qs=qs).collect()
    return {round(r.q, 2): r.quantile for r in out}


def test_histogram_quantile_interpolation(spark):
    got = _hq(spark, [(1.0, 10), (2.0, 10), (5.0, 10)], (0.2, 0.5, 0.9))
    # rank 6 -> first bucket, lower=0: 0 + 1*(6-0)/10
    assert got[0.2] == 0.6
    # rank 15 -> le=2 bucket: 1 + (2-1)*(15-10)/10
    assert got[0.5] == 1.5
    # rank 27 -> le=5 bucket: 2 + 3*(27-20)/10
    assert got[0.9] == 4.1


def test_histogram_quantile_inf_clamps_to_max_finite(spark):
    got = _hq(spark, [(1.0, 5), (float("inf"), 5)], (0.9,))
    assert got[0.9] == 1.0


def test_histogram_quantile_nonpositive_first_bucket_returns_bound(spark):
    """promql/quantile.go: a crossing in the first bucket with le <= 0
    returns the bucket's upper bound itself — interpolating from
    lower=0 would produce a value ABOVE the bound."""
    got = _hq(spark, [(-1.0, 10), (2.0, 10)], (0.2, 0.9))
    assert got[0.2] == -1.0          # rank 4 -> first bucket, le=-1 <= 0
    # later buckets still interpolate from the previous le
    assert got[0.9] == -1.0 + 3.0 * (18 - 10) / 10
