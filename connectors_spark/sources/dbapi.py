"""RDBMS source over a DBAPI connection (S4/S5) — no JDBC needed.

The reference pages relational sources with `SELECT ... ORDER BY <pk>
LIMIT n OFFSET m` at fetch_size=50 (reference: app/connectors_service/
connectors/sources/postgresql/queries.py:35-37, client.py:24;
generic_database.py:77-111) and reads catalog metadata (tables, primary
keys, row counts) from information_schema (queries.py:16-45). This
module re-expresses both against any Python DBAPI connection factory
(sqlite3 in-sandbox; psycopg/mysql drop in by passing their paramstyle
placeholder — `placeholder="%s"` — since they reject qmark, the
default here):

- `read_dbapi_table` drains a table through KEYSET pagination
  (`WHERE pk > last ORDER BY pk LIMIT n` — strictly better than the
  reference's OFFSET paging, which rescans discarded rows at depth) and
  feeds the pages through `read_paged`, inheriting its spill-bounded
  buffering, atomic cursor checkpoints, crash-resume and linear-backoff
  retries. The returned DataFrame is a plain parquet scan: downstream
  transformations distribute normally.
- `dbapi_catalog` lists tables with row counts and max(pk) — the S5
  catalog scan.

On a real cluster the page pull is the sequential edge (like every
cursor API); Spark's own JDBC partitioned reads replace it when a JDBC
driver exists. This path exists so the S4 contract is a WORKING
implementation, not an option surface.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from connectors_spark.sources.paged import read_paged

FETCH_SIZE = 50  # reference: postgresql/client.py:24


def read_dbapi_table(
    spark: SparkSession,
    connect: Callable,
    table: str,
    pk: str,
    schema: str,
    spill_dir: str,
    fetch_size: int = FETCH_SIZE,
    columns: list[str] | None = None,
    placeholder: str = "?",
) -> DataFrame:
    """Drain `table` ordered by `pk` through keyset pagination into a
    distributed DataFrame. `connect`: zero-arg factory returning a DBAPI
    connection — opened lazily and REOPENED after a failed page fetch,
    so `read_paged`'s backoff retries get a fresh connection instead of
    a possibly-dead one. `placeholder` is the driver's paramstyle
    marker: "?" (qmark: sqlite3), "%s" (format/pyformat: psycopg,
    MySQLdb). Identifiers are validated (alnum/_ only) because DBAPI
    placeholders cannot bind them."""
    for ident in (table, pk, *(columns or [])):
        if not ident.replace("_", "").isalnum():
            raise ValueError(f"invalid identifier {ident!r}")
    cols = ", ".join(columns) if columns else "*"
    ph = placeholder
    state: dict = {"con": None}

    def fetch_page(cursor_val):
        if state["con"] is None:
            state["con"] = connect()
        try:
            cur = state["con"].cursor()
            if cursor_val is None:
                cur.execute(
                    f"SELECT {cols} FROM {table} ORDER BY {pk} LIMIT {ph}",
                    (fetch_size,),
                )
            else:
                cur.execute(
                    f"SELECT {cols} FROM {table} WHERE {pk} > {ph} "
                    f"ORDER BY {pk} LIMIT {ph}",
                    (cursor_val, fetch_size),
                )
            names = [d[0] for d in cur.description]
            rows = [dict(zip(names, r)) for r in cur.fetchall()]
        except Exception:
            try:
                state["con"].close()
            except Exception:
                pass
            state["con"] = None  # next retry reconnects
            raise
        if len(rows) < fetch_size:
            return rows, None  # final page
        return rows, str(rows[-1][pk])

    try:
        return read_paged(spark, _coerce_cursor(fetch_page, pk),
                          schema, spill_dir)
    finally:
        if state["con"] is not None:
            state["con"].close()


def _coerce_cursor(fetch_page, pk):
    """read_paged persists cursors as JSON strings; numeric pks must
    compare numerically on the next page pull."""
    def wrapped(cursor_val):
        if cursor_val is not None:
            try:
                cursor_val = int(cursor_val)
            except ValueError:
                pass
        return fetch_page(cursor_val)
    return wrapped


def dbapi_catalog(spark: SparkSession, connect: Callable,
                  tables: list[tuple[str, str]]) -> DataFrame:
    """(table_name, n_rows, max_pk): the S5 catalog scan — row counts +
    max primary key per table (the reference's information_schema walk,
    queries.py:16-45). `tables`: [(table, pk)]."""
    con = connect()
    try:
        rows = []
        for table, pk in tables:
            if not table.replace("_", "").isalnum() \
                    or not pk.replace("_", "").isalnum():
                raise ValueError(f"invalid identifier {table!r}/{pk!r}")
            cur = con.cursor()
            cur.execute(f"SELECT count(*), max({pk}) FROM {table}")
            n, mx = cur.fetchone()
            rows.append((table, int(n), None if mx is None else str(mx)))
    finally:
        con.close()
    return spark.createDataFrame(
        rows, "table_name string, n_rows long, max_pk string"
    )
