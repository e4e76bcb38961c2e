"""ES intervals `match` source: ordered/unordered + max_gaps width."""

from connectors_spark.functions.analysis import tokenize
from connectors_spark.operators.query import intervals_match


def _toks(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return tokenize(docs, "text", "doc_id")


def test_unordered_matches_both_orders(spark):
    toks = _toks(spark, ["big x slow", "slow big", "big y y slow"])
    got = {r["doc_id"]: (r["n_chains"], r["min_width"])
           for r in intervals_match(toks, ["big", "slow"],
                                    max_gaps=1, ordered=False).collect()}
    # doc 0: width 3, gaps 1 -> match; doc 1: reversed order, width 2,
    # gaps 0 -> match (unordered); doc 2: width 4, gaps 2 -> excluded
    assert got == {0: (1, 3), 1: (1, 2)}


def test_ordered_requires_query_order(spark):
    toks = _toks(spark, ["slow big"])
    assert intervals_match(toks, ["big", "slow"],
                           max_gaps=5, ordered=True).collect() == []
    got = intervals_match(toks, ["slow", "big"],
                          max_gaps=0, ordered=True).collect()
    assert [(r["n_chains"], r["min_width"]) for r in got] == [(1, 2)]


def test_three_term_unordered_any_permutation(spark):
    toks = _toks(spark, ["scan merge table", "table x scan merge"])
    got = {r["doc_id"]: (r["n_chains"], r["min_width"])
           for r in intervals_match(
               toks, ["table", "scan", "merge"],
               max_gaps=1, ordered=False).collect()}
    # doc 0: width 3, gaps 0; doc 1: width 4, gaps 1
    assert got == {0: (1, 3), 1: (1, 4)}


def test_width_constraint_is_span_not_pairwise(spark):
    # ordered pairwise slops pass individually but total span slack
    # exceeds max_gaps -> the WIDTH constraint must reject
    toks = _toks(spark, ["a x b x c"])
    assert intervals_match(toks, ["a", "b", "c"],
                           max_gaps=1, ordered=True).collect() == []
    got = intervals_match(toks, ["a", "b", "c"],
                          max_gaps=2, ordered=True).collect()
    assert [(r["n_chains"], r["min_width"]) for r in got] == [(1, 5)]


def test_chain_count_counts_all_tuples(spark):
    toks = _toks(spark, ["big slow big slow"])
    got = intervals_match(toks, ["big", "slow"],
                          max_gaps=2, ordered=True).collect()
    # chains: (0,1) w2, (0,3) w4, (2,3) w2 -> 3 chains, min width 2
    assert [(r["n_chains"], r["min_width"]) for r in got] == [(3, 2)]


def test_unordered_rejects_duplicate_terms(spark):
    toks = _toks(spark, ["big big"])
    try:
        intervals_match(toks, ["big", "big"], ordered=False)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
