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
