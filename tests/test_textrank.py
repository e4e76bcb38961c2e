"""Per-document extractive TextRank."""

from connectors_spark.operators.graph import textrank_sentences


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, sent_idx int, tokens array<string>")


def test_symmetric_pair_splits_isolated_keeps_floor(spark):
    rows = [(1, 0, ["spark", "merge"]), (1, 1, ["spark", "scan"]),
            (1, 2, ["zebra"])]
    got = {r["sent_idx"]: (r["pos"], r["score"])
           for r in textrank_sentences(_df(spark, rows),
                                       top_n=3).collect()}
    # the connected pair holds 1/3 each (symmetric fixpoint); the
    # isolated sentence keeps the teleport floor (1-d)/N = 0.05
    assert got[0] == (1, 0.333333)   # tie -> lower sent_idx first
    assert got[1] == (2, 0.333333)
    assert got[2] == (3, 0.05)


def test_chain_center_is_most_central(spark):
    rows = [(2, 0, ["a", "b"]), (2, 1, ["b", "c"]), (2, 2, ["c", "d"])]
    got = textrank_sentences(_df(spark, rows), top_n=1).collect()
    assert len(got) == 1 and got[0]["sent_idx"] == 1
    assert got[0]["score"] > 0.5


def test_top_n_limits_per_doc(spark):
    rows = [(d, s, [f"t{d}", f"s{s}"]) for d in (1, 2)
            for s in range(4)]
    out = textrank_sentences(_df(spark, rows), top_n=2).collect()
    assert len(out) == 4
    assert {(r["doc_id"], r["pos"]) for r in out} == {
        (1, 1), (1, 2), (2, 1), (2, 2)}


def test_duplicate_tokens_in_sentence_count_once(spark):
    # edge weight uses DISTINCT shared tokens: repeating a token must
    # not change the graph
    a = [(3, 0, ["x", "x", "y"]), (3, 1, ["x", "z"])]
    b = [(3, 0, ["x", "y"]), (3, 1, ["x", "z"])]
    ra = {r["sent_idx"]: r["score"]
          for r in textrank_sentences(_df(spark, a), top_n=3).collect()}
    rb = {r["sent_idx"]: r["score"]
          for r in textrank_sentences(_df(spark, b), top_n=3).collect()}
    assert ra == rb
