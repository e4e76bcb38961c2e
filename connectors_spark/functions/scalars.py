"""Scalar function surface (SURVEY §2.8) — JVM Column expressions.

Each mirrors a reference utility; DuckDB twins live in entry_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ID_MAX_BYTES = 512
EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def hash_id(id_col: Column) -> Column:
    """Ids longer than 512 UTF-8 bytes are md5-hashed (reference:
    libs/connectors_sdk/connectors_sdk/utils.py:58-62 hash_id;
    app/connectors_service/connectors/sync_job_runner.py:40,416-446)."""
    return F.when(
        F.octet_length(id_col) > ID_MAX_BYTES, F.md5(id_col)
    ).otherwise(id_col)


def composite_row_id(*cols: Column | str) -> Column:
    """table1_table2_pk1_pk2-style composite id (reference:
    app/connectors_service/connectors/sources/shared/database/
    generic_database.py:59-74)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws("_", *[c.cast("string") for c in cs])


def iso_utc(ts: Column) -> Column:
    """ISO-8601 UTC string (reference: sdk/utils.py:30-51 iso_utc)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'+00:00'")


def html_to_text(html: Column) -> Column:
    """Tag-stripping text extraction with newline separation (reference:
    app/connectors_service/connectors/utils.py:717-725 html_to_text —
    BeautifulSoup there; here a deterministic regex pipeline: block tags
    -> newline, all tags stripped, whitespace squeezed)."""
    c = F.regexp_replace(html, r"(?i)<(br|/p|/div|/li|/h[1-6])[^>]*>", "\n")
    c = F.regexp_replace(c, r"<[^>]+>", "")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    return F.trim(c)


def is_valid_email(col: Column) -> Column:
    """(reference: app/connectors_service/connectors/utils.py:776-781)."""
    return col.rlike(EMAIL_RE)


def extension(path: Column) -> Column:
    """File-extension extraction (reference: sdk/utils.py:54-55)."""
    return F.regexp_extract(path, r"(\.[^.\\/]+)$", 1)


def b64(col: Column) -> Column:
    return F.base64(F.encode(col, "utf-8"))


def unb64(col: Column) -> Column:
    return F.decode(F.unbase64(col), "utf-8")


def truncate_id(id_col: Column) -> Column:
    """Log-friendly id shortening: ids > 20 chars become first8...last8
    (reference: app/connectors_service/connectors/utils.py:608-626, C10)."""
    return F.when(
        F.length(id_col) > 20,
        F.concat(F.substring(id_col, 1, 8), F.lit("..."),
                 F.substring(id_col, -8, 8)),
    ).otherwise(id_col)


def map_column_names(column_names: list[str], schema: str | None = None,
                     tables: list[str] | None = None) -> list[str]:
    """schema_table_column lowercase prefixing for RDBMS row->doc field
    names (reference: app/connectors_service/connectors/sources/shared/
    database/generic_database.py:49-56, C5)."""
    prefix = ""
    if schema and schema.strip():
        prefix += schema.strip() + "_"
    if tables:
        prefix += "_".join(sorted(tables)) + "_"
    return [f"{prefix}{c}".lower() for c in column_names]


def prefix_columns(df, schema: str | None = None,
                   tables: list[str] | None = None):
    """Rename every column of `df` via map_column_names (C5)."""
    new = map_column_names(df.columns, schema, tables)
    return df.toDF(*new)


def deep_merge_dicts(base_dict: dict, new_dict: dict) -> dict:
    """Recursive dict merge, new wins (reference: utils.py:657-676, C12 —
    config-side helper, mirrored for source-option merging)."""
    for key in new_dict:
        if (key in base_dict and isinstance(base_dict[key], dict)
                and isinstance(new_dict[key], dict)):
            deep_merge_dicts(base_dict[key], new_dict[key])
        else:
            base_dict[key] = new_dict[key]
    return base_dict


# ---- grok ingest processor ------------------------------------------
# Reference: the ES ingest `grok` processor and the public logstash
# pattern library (the subset below). Patterns compile to ONE plain
# regex with numbered capture groups (named-group syntax differs
# between Java regex and RE2, so the compiler avoids it) — the same
# compiled string runs in Spark (Java) and the DuckDB oracle (RE2).

GROK_PATTERNS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "TIMESTAMP_ISO8601":
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "LOGLEVEL":
        r"(?:TRACE|DEBUG|INFO|NOTICE|WARN|WARNING|ERROR|FATAL|"
        r"SEVERE|CRITICAL)",
}

_GROK_REF = None  # compiled lazily (re import below)


def grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile a grok pattern to (regex, field_names): each
    %{NAME:field} becomes a numbered capture group (fields listed in
    group order), %{NAME} without a field becomes non-capturing.
    Literal text between references is regex, exactly like real grok.
    Unknown pattern names raise KeyError (the ES processor errors the
    same way)."""
    import re as _re

    global _GROK_REF
    if _GROK_REF is None:
        _GROK_REF = _re.compile(r"%\{(\w+)(?::(\w+))?\}")
    fields: list[str] = []

    def sub(m):
        name, field = m.group(1), m.group(2)
        body = GROK_PATTERNS[name]
        if field:
            fields.append(field)
            return f"({body})"
        return f"(?:{body})"

    return _GROK_REF.sub(sub, pattern), fields


def grok_extract(df, col: str, pattern: str):
    """Apply a grok pattern to a string column: one new string column
    per named field (empty string on no-match, the regexp_extract
    convention). One compiled regex, JVM regexp_extract per field —
    codegen'd, no UDF."""
    regex, fields = grok_to_regex(pattern)
    out = df
    for i, f_name in enumerate(fields, start=1):
        out = out.withColumn(
            f_name, F.regexp_extract(F.col(col), regex, i))
    return out


def dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile a dissect pattern (the ES/Logstash `dissect` processor /
    ES|QL DISSECT command; public Elastic docs) to (regex, fields).
    `%{name}` captures lazily between the literal delimiters, `%{}` and
    `%{?name}` match without capturing, `%{name->}` absorbs trailing
    padding spaces. A field in final position captures greedily (dissect
    "rest of string" semantics)."""
    import re as _re

    parts = [p for p in _re.split(r"(%\{[^}]*\})", pattern) if p]
    frags: list[str] = ["^"]
    fields: list[str] = []
    for idx, p in enumerate(parts):
        if p.startswith("%{") and p.endswith("}"):
            body = p[2:-1]
            pad = body.endswith("->")
            if pad:
                body = body[:-2]
            last = idx == len(parts) - 1
            if not body or body.startswith("?"):
                frags.append("(?:.*)" if last else "(?:.*?)")
            else:
                fields.append(body)
                frags.append("(.*)" if last else "(.*?)")
            if pad:
                frags.append(" *")
        else:
            frags.append(_re.escape(p))
    frags.append("$")
    return "".join(frags), fields


def dissect_extract(df, col: str, pattern: str):
    """Apply a dissect pattern: one string column per captured field
    (empty on no-match, the regexp_extract convention). Same JVM
    regexp_extract shape as grok_extract — codegen'd, no UDF."""
    regex, fields = dissect_to_regex(pattern)
    out = df
    for i, f_name in enumerate(fields, start=1):
        out = out.withColumn(
            f_name, F.regexp_extract(F.col(col), regex, i))
    return out


# ---- geo_shape: point-in-polygon -------------------------------------
# Reference: the ES geo_shape query (`relation: intersects/contains` for
# point-vs-polygon). Crossing-number (ray-casting) test compiled to ONE
# branch-per-edge SQL expression from the polygon constant: per edge,
# the slope is PRECOMPUTED in Python, so the emitted fragment contains
# only comparisons, one multiply and one add per edge — identical float
# literals run under Spark SQL and DuckDB, so both engines agree
# bit-for-bit and the expression is codegen'd/pushable on the Spark side.

def point_in_polygon_sql(x_expr: str, y_expr: str,
                         polygon: list[tuple[float, float]]) -> str:
    """SQL boolean: is (x_expr, y_expr) strictly inside `polygon`
    (list of (x, y) vertices, closed implicitly)? Crossing-number over
    edges; horizontal edges (y1 == y2) are rejected at compile time
    (slope undefined — split such an edge or nudge a vertex)."""
    terms = []
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        if y2 == y1:
            raise ValueError(f"horizontal edge at vertex {i} "
                             f"({x1},{y1})->({x2},{y2})")
        slope = (x2 - x1) / (y2 - y1)
        terms.append(
            f"(CASE WHEN (({y1} > ({y_expr})) <> ({y2} > ({y_expr})))"
            f" AND (({x_expr}) < {x1} + (({y_expr}) - {y1}) * {slope})"
            f" THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"
