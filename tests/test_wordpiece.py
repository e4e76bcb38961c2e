"""WordPiece greedy longest-match-first tokenization (BERT rule)."""

from pyspark.sql import functions as F

from connectors_spark.functions.analysis import (
    WORDPIECE_MAX_WORD, wordpiece_py, wordpiece_struct_col)


def test_greedy_longest_match_first_closed_form():
    # "the" (P3) beats "th" (P2) beats "t" (P1) at position 0;
    # "ate" is a P3 continuation; trailing single char closes.
    assert wordpiece_py("theater") == ("the ##ate ##r", 3, False)
    # no 3/2-gram matches anywhere -> all single chars
    assert wordpiece_py("xyz") == ("x ##y ##z", 3, False)
    # single-char word is one start piece, no continuation marker
    assert wordpiece_py("a") == ("a", 1, False)
    # digits are P1 pieces
    assert wordpiece_py("42") == ("4 ##2", 2, False)


def test_unk_rules():
    # over the length cap -> whole-word [UNK], exactly one piece
    long_word = "a" * (WORDPIECE_MAX_WORD + 1)
    assert wordpiece_py(long_word) == ("[UNK]", 1, True)
    # exactly at the cap still tokenizes
    at_cap = "a" * WORDPIECE_MAX_WORD
    pieces, n, unk = wordpiece_py(at_cap)
    assert not unk and n == WORDPIECE_MAX_WORD
    # a character outside every vocab tier -> [UNK] (BERT: any
    # unmatched position fails the whole word)
    assert wordpiece_py("café") == ("[UNK]", 1, True)
    assert wordpiece_py("foo_bar") == ("[UNK]", 1, True)


def test_spark_column_matches_python_mirror(spark):
    words = ["theater", "xyz", "a", "42", "the", "ing", "concatenate",
             "estimation", "terrier", "q", "0", "zz", "ononon",
             "a" * WORDPIECE_MAX_WORD, "a" * (WORDPIECE_MAX_WORD + 1),
             "café", "foo_bar", "thethethethethe", "andand"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    wp = wordpiece_struct_col(F.col("word"))
    got = {r["word"]: (r["pieces"], r["n_pieces"], r["has_unk"])
           for r in df.select(
               "word", wp["pieces"].alias("pieces"),
               wp["n_pieces"].alias("n_pieces"),
               wp["has_unk"].alias("has_unk")).collect()}
    for w in words:
        assert got[w] == wordpiece_py(w), w


def test_piece_roundtrip_reconstructs_word():
    # stripping '##' markers and joining must reproduce the word
    # whenever no [UNK] fired (greedy never skips or overlaps)
    for w in ["theater", "concatenate", "estimation", "spark",
              "tokenization", "42abc", "retrieval"]:
        pieces, n, unk = wordpiece_py(w)
        if len(w) <= WORDPIECE_MAX_WORD:
            assert not unk
            joined = "".join(p.removeprefix("##")
                             for p in pieces.split(" "))
            assert joined == w
            assert n == len(pieces.split(" "))
