"""Bradley-Terry MM fitting: closed-form 2-item case + ordering."""

from __future__ import annotations

import math

from connectors_spark.operators.graph import bradley_terry_strengths


def test_two_item_closed_form(spark):
    # A beats B 3x, B beats A 1x  =>  s_A/(s_A+s_B) = 3/4  =>  s_A = 3 s_B
    rows = [(0, 1)] * 3 + [(1, 0)]
    df = spark.createDataFrame(rows, "winner int, loser int")
    got = {r.item: r for r in
           bradley_terry_strengths(df, n_iter=50).collect()}
    assert got[0].wins == 3 and got[1].wins == 1
    assert math.isclose(got[0].strength / got[1].strength, 3.0,
                        rel_tol=1e-9)
    assert math.isclose(got[0].strength + got[1].strength, 1.0,
                        rel_tol=1e-12)


def test_transitive_ordering_recovered(spark):
    # round-robin where lower index beats higher index 2:1
    rows = []
    for a in range(4):
        for b in range(a + 1, 4):
            rows += [(a, b)] * 2 + [(b, a)]
    df = spark.createDataFrame(rows, "winner int, loser int")
    s = {r.item: r.strength for r in
         bradley_terry_strengths(df, n_iter=30).collect()}
    assert s[0] > s[1] > s[2] > s[3]
    # symmetric schedule => symmetric strengths: items 0/3 and 1/2 are
    # mirror images, so their strengths multiply out symmetrically
    assert math.isclose(sum(s.values()), 1.0, rel_tol=1e-12)
