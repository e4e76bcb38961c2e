"""Ingest-edge document serialization — the typed-schema twin of the
reference's per-record sanitize/serialize step.

The reference normalizes every extracted document before indexing:
datetime/date/time -> isoformat, Decimal -> float, bytes -> utf-8
(errors ignored), recursively through nested dicts/lists (reference:
libs/connectors_sdk/connectors_sdk/source.py:656-691 serialize), and
coerces `_id` to a string (app/connectors_service/connectors/utils.py:
794-800 sanitize). It does this per record in Python because its inputs
are schemaless dicts.

Spark inputs carry a STATIC schema, so the same normalization compiles to
plan-time Column expressions: one recursion over the schema tree at plan
build, zero per-row Python. Nested structs/arrays/maps are rebuilt with
transform/transform_values; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from connectors_spark.functions.scalars import iso_utc


_TS_TYPES = (T.TimestampType, T.TimestampNTZType)


def _sanitized_type(dtype: T.DataType) -> T.DataType:
    """The post-sanitize type of a value of `dtype`."""
    if isinstance(dtype, (*_TS_TYPES, T.DateType)):
        return T.StringType()
    if isinstance(dtype, T.DecimalType):
        return T.DoubleType()
    if isinstance(dtype, T.BinaryType):
        return T.StringType()
    if isinstance(dtype, T.ArrayType):
        return T.ArrayType(_sanitized_type(dtype.elementType), dtype.containsNull)
    if isinstance(dtype, T.MapType):
        return T.MapType(dtype.keyType, _sanitized_type(dtype.valueType),
                         dtype.valueContainsNull)
    if isinstance(dtype, T.StructType):
        return T.StructType([
            T.StructField(f.name, _sanitized_type(f.dataType), f.nullable)
            for f in dtype.fields
        ])
    return dtype


def sanitize_expr(col: Column, dtype: T.DataType) -> Column:
    """Normalize one (possibly nested) value — serialize() semantics."""
    if isinstance(dtype, _TS_TYPES):
        # NTZ timestamps are treated as UTC (session tz is pinned UTC)
        return iso_utc(col)
    if isinstance(dtype, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dtype, T.DecimalType):
        return col.cast("double")
    if isinstance(dtype, T.BinaryType):
        # bytes.decode(errors='ignore'): invalid sequences dropped. ANSI
        # decode() throws on malformed input, so: lenient binary->string
        # cast, repair invalid sequences to U+FFFD, strip the U+FFFD.
        return F.regexp_replace(
            F.call_function("make_valid_utf8", col.cast("string")),
            "�", "",
        )
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: sanitize_expr(x, dtype.elementType))
    if isinstance(dtype, T.MapType):
        return F.transform_values(
            col, lambda _, v: sanitize_expr(v, dtype.valueType)
        )
    if isinstance(dtype, T.StructType):
        return F.struct(*[
            sanitize_expr(col.getField(f.name), f.dataType).alias(f.name)
            for f in dtype.fields
        ])
    return col


def sanitize_documents(df: DataFrame, id_col: str | None = "doc_id") -> DataFrame:
    """Normalize every column of `df` (recursively through nested types)
    and coerce the id column to a string — the ingest-edge contract every
    doc satisfies before reaching the sink in the reference."""
    cols = []
    for f in df.schema.fields:
        c = sanitize_expr(F.col(f.name), f.dataType)
        if id_col is not None and f.name == id_col:
            c = c.cast("string")
        cols.append(c.alias(f.name))
    return df.select(*cols)
