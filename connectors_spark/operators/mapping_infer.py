"""ES dynamic-mapping inference analog: classify string values into
Elasticsearch dynamic-mapping types and reduce per field.

Reference semantics (public ES behavior the connectors pipeline relies
on when it bulk-indexes extracted documents without explicit mappings):
dynamic field mapping detects boolean / long / double (numeric
detection), ISO-style dates (date detection), and falls back to
``text`` with a ``keyword`` sub-field. ES resolves per-field type from
the FIRST document and rejects later conflicts; the batch analog here
resolves the whole corpus at once with the standard promotion lattice:

- long + double            → double  (numeric widening)
- any-scalar + text        → text
- boolean/date + numeric   → text    (no safe widening)

Everything is JVM-side: one regex classification per value, per-field
``bool_or`` flags, one CASE reduction — a single map-side-combinable
aggregation over the (field, value) stream at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Anchored, engine-portable (Spark rlike / DuckDB regexp_matches with
# identical patterns — both anchor explicitly).
RE_BOOL = "^(true|false)$"
RE_LONG = r"^-?\d{1,18}$"
RE_DOUBLE = r"^-?\d+\.\d+([eE][+-]?\d+)?$"
RE_DATE = r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2}(\.\d+)?)?$"


def classify_value(col: Column) -> Column:
    """Dynamic-mapping class of one string value (NULL stays NULL —
    ES skips null values during detection)."""
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(col.rlike(RE_BOOL), "boolean")
        .when(col.rlike(RE_LONG), "long")
        .when(col.rlike(RE_DOUBLE), "double")
        .when(col.rlike(RE_DATE), "date")
        .otherwise("text")
    )


def resolve_type_expr(has: dict[str, Column]) -> Column:
    """Promotion-lattice CASE over per-class bool_or flags."""
    numeric = has["long"] | has["double"]
    return (
        F.when(has["text"], "text")
        .when(has["date"] & (numeric | has["boolean"]), "text")
        .when(has["boolean"] & numeric, "text")
        .when(has["double"], "double")
        .when(has["long"], "long")
        .when(has["date"], "date")
        .when(has["boolean"], "boolean")
        .otherwise(F.lit(None).cast("string"))
    )


def infer_mapping(kv: DataFrame, field_col: str = "field",
                  value_col: str = "val") -> DataFrame:
    """(field, es_type, n_values) from a long-format (field, string
    value) frame. ``es_type`` is the resolved dynamic type; text
    implies the text-with-keyword-subfield multi-field convention.
    Fields whose values are all NULL resolve to NULL es_type (ES
    creates no mapping for them)."""
    cls = classify_value(F.col(value_col)).alias("_cls")
    tagged = kv.select(F.col(field_col).alias("field"), cls)
    flags = {
        t: F.max((F.col("_cls") == t).cast("boolean")).alias(f"_h_{t}")
        for t in ("boolean", "long", "double", "date", "text")
    }
    agg = tagged.groupBy("field").agg(
        *flags.values(),
        F.count("_cls").alias("n_values"),
    )
    has = {t: F.coalesce(F.col(f"_h_{t}"), F.lit(False))
           for t in ("boolean", "long", "double", "date", "text")}
    return agg.select(
        "field",
        resolve_type_expr(has).alias("es_type"),
        F.col("n_values").cast("long").alias("n_values"),
    )


def classify_sql_duckdb(expr: str) -> str:
    """DuckDB twin of classify_value — same anchored patterns."""
    return f"""CASE
  WHEN {expr} IS NULL THEN NULL
  WHEN regexp_matches({expr}, '{RE_BOOL}') THEN 'boolean'
  WHEN regexp_matches({expr}, '{RE_LONG}') THEN 'long'
  WHEN regexp_matches({expr}, '{RE_DOUBLE}') THEN 'double'
  WHEN regexp_matches({expr}, '{RE_DATE}') THEN 'date'
  ELSE 'text' END"""


RESOLVE_SQL_DUCKDB = """CASE
  WHEN h_text THEN 'text'
  WHEN h_date AND (h_long OR h_double OR h_boolean) THEN 'text'
  WHEN h_boolean AND (h_long OR h_double) THEN 'text'
  WHEN h_double THEN 'double'
  WHEN h_long THEN 'long'
  WHEN h_date THEN 'date'
  WHEN h_boolean THEN 'boolean'
  ELSE NULL END"""
