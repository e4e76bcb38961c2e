"""dup_span_excise: keep-first, span merging, coverage accounting."""

from __future__ import annotations

from connectors_spark.operators.dedup import dup_span_excise


def _run(spark, rows, window=4):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_span_excise(df, window=window)
    return {r.doc_id: r for r in out.collect()}


def test_keep_first_excises_later_copy_only(spark):
    span = "alpha beta gamma delta"  # 4 tokens = one whole window
    rows = [
        (1, span + " unique tail words here"),
        (2, "totally different prefix " + span),
    ]
    got = _run(spark, rows, window=4)
    # doc 1 holds the first occurrence: nothing excised
    assert got[1].n_excised == 0 and got[1].n_spans == 0
    assert got[1].kept_frac == 1.0
    # doc 2's copy is cut: exactly the 4-token window
    assert got[2].n_excised == 4 and got[2].n_spans == 1
    assert abs(got[2].kept_frac - round((7 - 4) / 7, 6)) < 1e-9


def test_overlapping_windows_merge_into_one_span(spark):
    # doc 2 repeats a 6-token run of doc 1 -> three overlapping
    # 4-windows merge into ONE span covering 6 positions
    run = "a b c d e f"
    rows = [(1, run + " x y z"), (2, "p q r " + run)]
    got = _run(spark, rows, window=4)
    assert got[2].n_spans == 1
    assert got[2].n_excised == 6
    assert got[1].n_excised == 0


def test_within_doc_repeat_is_excised(spark):
    # the SAME doc repeating its own window: second occurrence cut
    rows = [(1, "a b c d zz a b c d")]
    got = _run(spark, rows, window=4)
    assert got[1].n_excised == 4 and got[1].n_spans == 1


def test_short_docs_report_zero(spark):
    rows = [(1, "a b"), (2, "")]
    got = _run(spark, rows, window=4)
    for d in (1, 2):
        assert got[d].n_excised == 0 and got[d].n_spans == 0
        assert got[d].kept_frac == 1.0


def test_disjoint_repeats_count_two_spans(spark):
    rows = [
        (1, "a b c d mmm nnn ooo ppp e f g h"),
        (2, "a b c d qqq rrr sss ttt e f g h"),
    ]
    got = _run(spark, rows, window=4)
    assert got[2].n_spans == 2
    assert got[2].n_excised == 8
    assert got[1].n_excised == 0


def test_excise_properties_random_corpora(spark):
    """Hypothesis-driven invariants, verified against a brute-force
    Python oracle: n_excised == |union of non-first dup windows'
    covered positions|, never exceeding n_tokens."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    W = 3
    word = st.sampled_from(list("abcde"))
    doc = st.lists(word, min_size=0, max_size=12)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def check(docs):
        rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
        got = _run(spark, rows, window=W)
        # brute-force oracle: global first-occurrence keep, coverage
        seen: dict = {}
        covered = {i: set() for i in range(len(docs))}
        for i, d in enumerate(docs):
            for p in range(len(d) - W + 1):
                key = tuple(d[p:p + W])
                if key in seen:
                    covered[i].update(range(p, p + W))
                else:
                    seen[key] = (i, p)
        for i, d in enumerate(docs):
            r = got[i]
            assert r.n_tokens == len(d)
            assert r.n_excised == len(covered[i])
            assert r.n_excised <= r.n_tokens

    check()
