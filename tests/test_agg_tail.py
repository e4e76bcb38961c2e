"""Aggregation-tail ops: point-in-polygon compiler, moving percentiles."""

import duckdb
import pytest

from connectors_spark.functions.scalars import point_in_polygon_sql

_SQUAREISH = [(0.0, 0.1), (10.0, 0.0), (10.0, 10.1), (0.0, 10.0)]


def _inside(x, y):
    sql = point_in_polygon_sql(str(x), str(y), _SQUAREISH)
    return duckdb.sql(f"SELECT {sql}").fetchone()[0]


def test_pip_known_points():
    assert _inside(5.0, 5.0)
    assert not _inside(15.0, 5.0)
    assert not _inside(-1.0, 5.0)
    assert not _inside(5.0, 11.0)


def test_pip_rejects_horizontal_edges():
    with pytest.raises(ValueError, match="horizontal edge"):
        point_in_polygon_sql("x", "y", [(0, 0), (1, 0), (1, 1)])


def test_pip_spark_duckdb_agree(spark):
    # the same compiled fragment must give bit-identical verdicts
    pts = [(float(i * 3 % 17) - 2, float(i * 5 % 19) - 3) for i in range(40)]
    sql = point_in_polygon_sql("x", "y", _SQUAREISH)
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(pts, ["x", "y"])
    got_spark = sorted(
        (r.x, r.y) for r in sdf.filter(F.expr(sql)).collect())
    vals = ", ".join(f"({x}, {y})" for x, y in pts)
    got_duck = sorted(duckdb.sql(
        f"SELECT x, y FROM (VALUES {vals}) t(x, y) WHERE {sql}").fetchall())
    assert got_spark == got_duck and len(got_spark) > 0
