"""SymSpell deletion-neighborhood batch spell correction."""

from pyspark.sql import functions as F

from connectors_spark.operators.query import (_deletion_keys,
                                              symspell_correct)


def _lex(spark, rows):
    return spark.createDataFrame(rows, "term string, df long")


def _inp(spark, words):
    return spark.createDataFrame([(w,) for w in words], "input string")


def test_deletion_keys_closed_form(spark):
    got = (spark.range(1)
           .select(_deletion_keys(F.lit("abc")).alias("k"))
           .collect()[0]["k"])
    assert sorted(got) == ["ab", "abc", "ac", "bc"]
    # length-1 string: itself + the empty key (substitution channel)
    got1 = (spark.range(1)
            .select(_deletion_keys(F.lit("a")).alias("k"))
            .collect()[0]["k"])
    assert sorted(got1) == ["", "a"]


def test_all_three_edit_channels(spark):
    lex = _lex(spark, [("spark", 10)])
    # substitution, insertion, deletion, exact
    inp = _inp(spark, ["sparc", "sparkk", "spak", "spark"])
    got = {r["input"]: (r["suggestion"], r["dist"])
           for r in symspell_correct(lex, inp).collect()}
    assert got["sparc"] == ("spark", 1)
    assert got["sparkk"] == ("spark", 1)
    assert got["spak"] == ("spark", 1)
    assert got["spark"] == ("spark", 0)


def test_transposition_is_distance_2_and_excluded(spark):
    # "ab" vs "ba" share the deletion key "a"/"b" but plain
    # levenshtein is 2 -> the verify filter must drop the pair
    lex = _lex(spark, [("ab", 5)])
    got = symspell_correct(lex, _inp(spark, ["ba"])).collect()
    assert got == []


def test_rank_dist_then_df_then_term(spark):
    # exact match beats any distance-1 candidate regardless of df
    lex = _lex(spark, [("cat", 1), ("cap", 100), ("car", 100)])
    got = symspell_correct(lex, _inp(spark, ["cat"]), top_n=3).collect()
    assert [(r["suggestion"], r["dist"]) for r in got] == [
        ("cat", 0), ("cap", 1), ("car", 1)]  # df tie -> term ASC
    # among distance-1 candidates, higher df wins
    lex2 = _lex(spark, [("cap", 100), ("car", 7)])
    top = symspell_correct(lex2, _inp(spark, ["cat"])).collect()
    assert [(r["suggestion"], r["df"]) for r in top] == [("cap", 100)]


def test_no_nested_loop_join_in_plan(spark):
    lex = _lex(spark, [("spark", 10), ("store", 4)])
    plan = (symspell_correct(lex, _inp(spark, ["sparc", "stor"]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
