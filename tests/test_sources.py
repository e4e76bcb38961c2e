"""Source registry readers (S1/S3/S7/S9 mappings)."""

from datetime import datetime

import pytest

from connectors_spark.sources.registry import (
    get_source,
    read_binary_glob,
    read_time_window,
)


def test_registry_lookup():
    assert get_source("parquet") is not None
    with pytest.raises(KeyError):
        get_source("definitely-not-registered")


def test_parquet_reader(spark, sf_dir):
    df = get_source("parquet")(spark, f"{sf_dir}/events.parquet")
    assert df.count() > 0


def test_binary_glob_reader(spark, tmp_path):
    (tmp_path / "a.txt").write_bytes(b"hello")
    (tmp_path / "b.txt").write_bytes(b"world!")
    (tmp_path / "c.bin").write_bytes(b"\x00\x01")
    df = read_binary_glob(spark, str(tmp_path), glob="*.txt")
    rows = {r.path.split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert bytes(rows["a.txt"].content) == b"hello"
    assert rows["b.txt"].length == 6
    assert read_binary_glob(spark, str(tmp_path)).count() == 3


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    df.write.mode("overwrite").option("header", True).csv(str(tmp_path / "c"))
    got_j = get_source("json")(spark, str(tmp_path / "j"),
                               schema="id long, v string")
    got_c = get_source("csv")(spark, str(tmp_path / "c"),
                              schema="id long, v string")
    assert sorted((r.id, r.v) for r in got_j.collect()) == [(1, "x"), (2, "y")]
    assert sorted((r.id, r.v) for r in got_c.collect()) == [(1, "x"), (2, "y")]


def test_time_window(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi = datetime(2024, 1, 10), datetime(2024, 1, 20)
    win = read_time_window(events, lo, hi)
    n = win.count()
    assert 0 < n < events.count()
    assert win.filter((win.ts < lo) | (win.ts > hi)).count() == 0


def test_dbapi_table_drain_and_catalog(spark, tmp_path):
    """S4 as a WORKING implementation: a real RDBMS (SQLite over DBAPI)
    drained through keyset pagination into a distributed DataFrame via
    the paged-source machinery (spill, cursor checkpoint, resume), plus
    the S5 catalog scan (row counts + max pk)."""
    import sqlite3

    from connectors_spark.sources.dbapi import dbapi_catalog, read_dbapi_table

    db = str(tmp_path / "src.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE items (id INTEGER PRIMARY KEY, name TEXT, qty INTEGER)")
    con.executemany("INSERT INTO items VALUES (?, ?, ?)",
                    [(i, f"item-{i:04d}", i % 7) for i in range(1, 138)])
    con.commit()
    con.close()

    connect = lambda: sqlite3.connect(db)
    out = read_dbapi_table(
        spark, connect, "items", pk="id",
        schema="id long, name string, qty long",
        spill_dir=str(tmp_path / "spill"), fetch_size=50,
    )
    rows = sorted((r.id, r.name, r.qty) for r in out.collect())
    assert len(rows) == 137
    assert rows[0] == (1, "item-0001", 1) and rows[-1] == (137, "item-0137", 4)

    # resume: a second drain over the same spill dir re-reads from the
    # checkpoint ('done') without touching the database
    def explode(_):
        raise AssertionError("finished stream must not re-fetch")
    again = read_dbapi_table(
        spark, lambda: _NoConnect(), "items", pk="id",
        schema="id long, name string, qty long",
        spill_dir=str(tmp_path / "spill"),
    )
    assert again.count() == 137

    cat = {r.table_name: (r.n_rows, r.max_pk)
           for r in dbapi_catalog(spark, connect, [("items", "id")]).collect()}
    assert cat == {"items": (137, "137")}


class _NoConnect:
    """Connection stand-in proving the resumed drain never queries."""
    def cursor(self):
        raise AssertionError("finished stream must not open a cursor")
    def close(self):
        pass
