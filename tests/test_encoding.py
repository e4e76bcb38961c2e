"""Mojibake repair semantics (functions/encoding.py)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from connectors_spark.functions.encoding import (
    MOJIBAKE_CHARS,
    mangle,
    mangle_col,
    repair_mojibake,
    repair_table,
)


def test_known_artifacts():
    assert mangle("é") == "Ã©"
    assert mangle("’") == "â€™"
    assert mangle("€") == "â‚¬"
    table = dict(repair_table())
    assert table["Ã©"] == "é"
    assert table["â€™"] == "’"


def test_table_longest_first_no_partial_rewrites():
    lens = [len(bad) for bad, _ in repair_table()]
    assert lens == sorted(lens, reverse=True)


def _py_repair(s: str) -> str:
    for bad, good in repair_table():
        s = s.replace(bad, good)
    return s


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=MOJIBAKE_CHARS + "abc XYZ.,", max_size=40))
def test_repair_inverts_mangle_property(s):
    corrupted = "".join(
        mangle(c) if c in MOJIBAKE_CHARS else c for c in s)
    assert _py_repair(corrupted) == s


def test_spark_repair_matches_python(spark):
    def corrupt(t):
        return "".join(mangle(c) if ord(c) > 127 else c for c in t)

    clean = {1: "caff\u00e8 \u2014 r\u00e9sum\u00e9",
             2: "plain ascii",
             3: "d\u00e9j\u00e0 vu \u2026 \u20ac5"}
    rows = [(i, corrupt(t)) for i, t in clean.items()]
    assert rows[0][1] == "caff\u00c3\u00a8 \u00e2\u20ac\u201d r\u00c3\u00a9sum\u00c3\u00a9"
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.text for r in
           repair_mojibake(df, "text").collect()}
    assert out == clean
    for i, t in rows:
        assert out[i] == _py_repair(t)


def test_spark_mangle_then_repair_roundtrip(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "héllo – “wörld” …")], "id long, text string")
    staged = df.select(
        "id", F.col("text").alias("orig"),
        mangle_col(F.col("text")).alias("bad"))
    fixed = repair_mojibake(staged, "bad", out_col="fixed")
    r = fixed.collect()[0]
    assert r.bad != r.orig
    assert r.fixed == r.orig


def test_repair_is_noop_on_clean_ascii(spark):
    df = spark.createDataFrame(
        [(1, "just plain text, no damage.")], "id long, text string")
    assert repair_mojibake(df, "text").collect()[0].text == \
        "just plain text, no damage."


def test_nfc_normalize_composes_and_validates(spark):
    from connectors_spark.functions.encoding import nfc_normalize
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "cafe\u0301"),  # e + combining acute -> e-acute
         (2, "ﬁne"),          # fi ligature: NFC keeps, NFKC folds
         (3, None)],
        "id long, text string")
    nfc = {r.id: r.text for r in nfc_normalize(df, "text").collect()}
    assert nfc[1] == "caf\u00e9" and len(nfc[1]) == 4
    assert nfc[2] == "ﬁne"
    assert nfc[3] is None
    nfkc = {r.id: r.text
            for r in nfc_normalize(df, "text", form="NFKC").collect()}
    assert nfkc[2] == "fine"
    with _pytest.raises(ValueError, match="normalization form"):
        nfc_normalize(df, "text", form="NFX")
