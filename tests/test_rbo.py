"""Truncated Rank-Biased Overlap (Webber, Moffat & Zobel 2010)."""

from connectors_spark.operators.query import (
    rank_biased_overlap,
    rbo_suffix_weights,
)


def _run(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, rank int, vec_id long")


def _py_rbo(a, b, k, p):
    """Direct python replay of the operator's integer convention."""
    suffix, scale = rbo_suffix_weights(k, p)
    n_u = 0
    pos_b = {doc: r for r, doc in enumerate(b[:k], start=1)}
    for ra, doc in enumerate(a[:k], start=1):
        rb = pos_b.get(doc)
        if rb is not None:
            n_u += suffix[max(ra, rb) - 1]
    return round(n_u * scale, 6)


def test_identical_runs_score_one(spark):
    rows = [(7, r, 100 + r) for r in range(1, 11)]
    out = rank_biased_overlap(_run(spark, rows), _run(spark, rows),
                              k=10, p=0.9).collect()[0]
    assert out.overlap_at_k == 10
    assert out.rbo == _py_rbo([100 + r for r in range(1, 11)],
                              [100 + r for r in range(1, 11)], 10, 0.9)
    assert abs(out.rbo - 1.0) <= 2e-6  # only weight quantization away


def test_disjoint_runs_score_zero(spark):
    a = [(1, r, r) for r in range(1, 11)]
    b = [(1, r, 100 + r) for r in range(1, 11)]
    out = rank_biased_overlap(_run(spark, a), _run(spark, b)).collect()[0]
    assert (out.overlap_at_k, out.rbo) == (0, 0.0)


def test_top_weightedness(spark):
    base = list(range(1, 11))
    swap_top = [2, 1] + base[2:]          # disturb ranks 1-2
    swap_tail = base[:8] + [10, 9]        # disturb ranks 9-10
    a = [(1, r, d) for r, d in enumerate(base, start=1)]
    t1 = [(1, r, d) for r, d in enumerate(swap_top, start=1)]
    t2 = [(1, r, d) for r, d in enumerate(swap_tail, start=1)]
    r_top = rank_biased_overlap(_run(spark, a), _run(spark, t1)).collect()[0]
    r_tail = rank_biased_overlap(_run(spark, a), _run(spark, t2)).collect()[0]
    # same set overlap, but the head disturbance must cost more
    assert r_top.overlap_at_k == r_tail.overlap_at_k == 10
    assert r_top.rbo < r_tail.rbo


def test_matches_python_oracle_on_partial_overlap(spark):
    a_docs = [3, 1, 4, 15, 9, 2, 6, 5, 35, 8]
    b_docs = [1, 3, 9, 99, 2, 4, 77, 5, 8, 66]
    a = [(5, r, d) for r, d in enumerate(a_docs, start=1)]
    b = [(5, r, d) for r, d in enumerate(b_docs, start=1)]
    out = rank_biased_overlap(_run(spark, a), _run(spark, b),
                              k=10, p=0.9).collect()[0]
    assert out.rbo == _py_rbo(a_docs, b_docs, 10, 0.9)
    assert out.overlap_at_k == len(set(a_docs) & set(b_docs))


def test_query_missing_from_run_b_gets_zero(spark):
    a = [(1, r, r) for r in range(1, 4)] + [(2, r, r) for r in range(1, 4)]
    b = [(1, r, r) for r in range(1, 4)]
    out = {r.query_id: r for r in
           rank_biased_overlap(_run(spark, a), _run(spark, b),
                               k=3).collect()}
    assert set(out) == {1, 2}
    assert out[2].rbo == 0.0 and out[2].overlap_at_k == 0
