"""Ingest-edge sanitize: plan-time schema recursion must match the
reference's per-record serialize() semantics (sdk/source.py:656-691)."""

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from connectors_spark.operators.sanitize import sanitize_documents


def test_sanitize_nested_types(spark):
    rows = [(
        12345,                                            # numeric id
        datetime.datetime(2025, 3, 1, 12, 30, 45),        # ts
        datetime.date(2025, 3, 2),                        # date
        Decimal("1.25"),                                  # decimal
        b"hello \xffworld",                               # bytes w/ bad utf8
        [datetime.datetime(2025, 1, 1, 0, 0, 0), None],   # array<ts>
        {"k": Decimal("2.5")},                            # map<str,decimal>
        (datetime.date(2024, 12, 31), b"inner", [Decimal("0.5")]),
    )]
    schema = ("doc_id long, ts timestamp, d date, dec decimal(10,2), "
              "bin binary, arr array<timestamp>, m map<string,decimal(10,2)>, "
              "s struct<sd:date, sb:binary, sa:array<decimal(10,2)>>")
    df = spark.createDataFrame(rows, schema)
    out = sanitize_documents(df).collect()[0]

    assert out.doc_id == "12345"                          # _id -> str
    assert out.ts == "2025-03-01T12:30:45+00:00"          # isoformat utc
    assert out.d == "2025-03-02"
    assert out.dec == 1.25 and isinstance(out.dec, float)
    assert out.bin == "hello world"                       # errors='ignore'
    assert out.arr == ["2025-01-01T00:00:00+00:00", None]
    assert out.m == {"k": 2.5}
    assert out.s.sd == "2024-12-31" and out.s.sb == "inner"
    assert out.s.sa == [0.5]


def test_sanitize_stays_jvm(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2025, 1, 1))], "doc_id long, ts timestamp"
    )
    out = sanitize_documents(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
