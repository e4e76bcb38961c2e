"""C4 cleaning rules: each planted violation drops exactly its page."""

from __future__ import annotations

from connectors_spark.functions.text import c4_line_rules


def test_c4_rule_outcomes(spark):
    from connectors_spark.entry_queries import _C4_BAD_WORDS, _C4_LINES
    df = spark.createDataFrame(
        _C4_LINES, "doc_id int, line_no int, line string")
    out = {r.doc_id: r for r in
           c4_line_rules(df, bad_words=_C4_BAD_WORDS).collect()}
    assert out[0].keep == 1 and out[0].n_kept_lines == 3  # "short line." <5 words
    assert out[1].keep == 0 and out[1].n_sentences == 2
    assert out[2].keep == 0 and out[2].has_lorem == 1
    assert out[3].keep == 0 and out[3].has_brace == 1
    assert out[4].keep == 0 and out[4].has_badword == 1
    assert out[5].keep == 1 and out[5].n_sentences == 3  # multi-sentence line
    assert out[5].n_kept_lines == 1                      # junk lines not kept


def test_c4_line_word_minimum(spark):
    df = spark.createDataFrame(
        [(0, "one two three four five."), (0, "one two three four."),
         (0, "six seven eight nine ten!"), (0, "a b c d e?")],
        ["doc_id", "line"])
    r = c4_line_rules(df).collect()[0]
    assert r.n_kept_lines == 3 and r.n_sentences == 3 and r.keep == 1
