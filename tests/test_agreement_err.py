"""Inter-annotator agreement (Cohen/Fleiss kappa) + ERR@k."""

import pytest

from connectors_spark.operators.agreement import cohen_kappa, fleiss_kappa


def test_cohen_kappa_closed_form(spark):
    df = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 1), (1, 1), (2, 2)], "a long, b long")
    r = cohen_kappa(df, "a", "b").collect()[0]
    # n=5 agree=4; marginals a={0:2,1:2,2:1} b={0:1,1:3,2:1} -> mprod=9
    assert r.n_items == 5
    assert r.po == 0.8
    assert r.pe == round(9 / 25, 6)
    assert r.kappa == round((5 * 4 - 9) / (25 - 9), 6)  # 0.6875


def test_cohen_kappa_perfect_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 2), (None, 1), (1, None)], "a long, b long")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r.n_items == 2 and r.po == 1.0 and r.kappa == 1.0


def test_fleiss_kappa_closed_form(spark):
    rows = []
    for item, labels in enumerate([(0, 0, 0), (0, 0, 1),
                                   (1, 1, 1), (0, 1, 2)]):
        rows += [(item, lb) for lb in labels]
    long_df = spark.createDataFrame(rows, "item long, label long")
    r = fleiss_kappa(long_df, "item", "label").collect()[0]
    # n=4 m=3 s=26 tj2=62 -> pbar=14/24, pe=62/144,
    # kappa = (12*14 - 62*2) / (2*(144-62)) = 44/164
    assert (r.n_items, r.m_raters) == (4, 3)
    assert r.pbar == round(14 / 24, 6)
    assert r.pe == round(62 / 144, 6)
    assert r.kappa == round(44 / 164, 6)


def test_fleiss_kappa_rejects_ragged_panel(spark):
    long_df = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 1), (1, 1), (1, 2)], "item long, label long")
    with pytest.raises(ValueError, match="fixed rater panel"):
        fleiss_kappa(long_df, "item", "label")


def test_err_at_k_closed_form(spark):
    from connectors_spark.operators.query import err_at_k

    ranked = spark.createDataFrame(
        [("q", 1, 10), ("q", 2, 11), ("q", 3, 12), ("q", 4, 13),
         ("q2", 1, 10), ("q3", 1, 14)],
        "query_id string, rank int, doc_id long")
    judg = spark.createDataFrame(
        [("q", 10, 1), ("q", 12, 1), ("q2", 10, 1)],
        "query_id string, doc_id long, rel int")
    out = {r.query_id: r for r in err_at_k(ranked, judg, k=10).collect()}
    # q: rel at ranks 1,3 -> 1/2 + (1/4)/3 = 0.583333
    assert out["q"].n_rel_in_k == 2
    assert out["q"].err == round(0.5 + 0.25 / 3, 6)
    assert out["q2"].err == 0.5
    # q3: no relevant docs -> err 0
    assert out["q3"].n_rel_in_k == 0 and out["q3"].err == 0.0


def test_err_respects_k_and_order(spark):
    from connectors_spark.operators.query import err_at_k

    ranked = spark.createDataFrame(
        [("q", r, 100 + r) for r in range(1, 12)],
        "query_id string, rank int, doc_id long")
    judg = spark.createDataFrame(
        [("q", 111, 1)], "query_id string, doc_id long, rel int")
    # relevant doc sits at rank 11 -> outside k=10 -> err 0
    r = err_at_k(ranked, judg, k=10).collect()[0]
    assert r.err == 0.0 and r.n_rel_in_k == 0
    # rank 2 beats rank 5 for the same single relevant doc
    j2 = spark.createDataFrame(
        [("q", 102, 1)], "query_id string, doc_id long, rel int")
    j5 = spark.createDataFrame(
        [("q", 105, 1)], "query_id string, doc_id long, rel int")
    e2 = err_at_k(ranked, j2, k=10).collect()[0].err
    e5 = err_at_k(ranked, j5, k=10).collect()[0].err
    assert e2 == 0.25 and e5 == 0.1 and e2 > e5
