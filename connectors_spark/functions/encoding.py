"""Mojibake repair: undo UTF-8-bytes-decoded-as-cp1252/Latin-1 damage.

The single most common encoding corruption in web-crawled training
data: a UTF-8 document is decoded as Windows-1252 (or Latin-1), so
every non-ASCII char becomes a 2–3 char artifact ('é' → 'Ã©',
'’' → 'â€™', '—' → 'â€”'). The fix (ftfy's core move) is exact: the
artifact set is the image of the UTF-8 byte sequences under the
cp1252 decode table, so a finite longest-first replacement table
inverts it with no heuristics.

Spark-side the repair compiles to a chain of literal ``replace``
expressions over a bounded, module-frozen artifact table — pure JVM
string ops inside whole-stage codegen, no UDF. The table is generated
at import from ``MOJIBAKE_CHARS`` (the high-frequency non-ASCII
chars of western-European text + typographic punctuation); extend the
list to widen coverage — generation is mechanical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# High-frequency targets: typographic punctuation (the cp1252 block),
# western-European letters, and a few symbols. Order in this list is
# irrelevant — the replacement table sorts longest-artifact-first.
MOJIBAKE_CHARS = (
    "‘’“”–—…€" "\u00a0"
    "éèêëàâäçîïôöùûüñíóúáãõæœ°«»ß"
)

# cp1252's 0x80-0x9F block (the bytes where cp1252 differs from
# Latin-1); everything else decodes as the identity (Latin-1).
_CP1252_HIGH = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
}


def mangle(ch: str) -> str:
    """What `ch` looks like after its UTF-8 bytes are decoded as
    cp1252 (Latin-1 fallback on the 5 unmapped cp1252 bytes) — the
    corruption this module inverts. Exposed for tests/fixtures."""
    return "".join(
        _CP1252_HIGH.get(b, chr(b)) for b in ch.encode("utf-8"))


def repair_table(chars: str = MOJIBAKE_CHARS) -> list[tuple[str, str]]:
    """(artifact, original) pairs, longest artifact first so 3-byte
    artifacts ('â€™') repair before their 2-byte prefixes could
    partially rewrite them."""
    pairs = {mangle(c): c for c in chars if mangle(c) != c}
    return sorted(pairs.items(), key=lambda kv: (-len(kv[0]), kv[0]))


def repair_mojibake_col(col: Column,
                        chars: str = MOJIBAKE_CHARS) -> Column:
    """Column expression repairing cp1252 mojibake via the frozen
    replacement table — literal `replace` chain, JVM-side."""
    out = col
    for bad, good in repair_table(chars):
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def repair_mojibake(df: DataFrame, text_col: str = "text",
                    out_col: str | None = None,
                    chars: str = MOJIBAKE_CHARS) -> DataFrame:
    """Repair mojibake in `text_col` (in place unless `out_col`)."""
    return df.withColumn(out_col or text_col,
                         repair_mojibake_col(F.col(text_col), chars))


def repair_sql_duckdb(expr: str, chars: str = MOJIBAKE_CHARS) -> str:
    """DuckDB fragment applying the SAME replacement table (generated
    from the same constants, per the oracle-parity convention)."""
    out = expr
    for bad, good in repair_table(chars):
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        out = f"replace({out}, '{b}', '{g}')"
    return out


def mangle_sql_duckdb(expr: str, chars: str = MOJIBAKE_CHARS) -> str:
    """DuckDB fragment CORRUPTING clean text with the same table —
    lets a gate synthesize mojibake deterministically on both engines
    (shortest-first so composing with repair_sql round-trips)."""
    out = expr
    for bad, good in sorted(repair_table(chars),
                            key=lambda kv: (len(kv[0]), kv[0])):
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        out = f"replace({out}, '{g}', '{b}')"
    return out


def mangle_col(col: Column, chars: str = MOJIBAKE_CHARS) -> Column:
    """Spark twin of mangle_sql_duckdb (same order, same table)."""
    out = col
    for bad, good in sorted(repair_table(chars),
                            key=lambda kv: (len(kv[0]), kv[0])):
        out = F.replace(out, F.lit(good), F.lit(bad))
    return out


# ---------------------------------------------------------------- NFC
# Unicode normalization: the other half of encoding hygiene (mojibake
# repair fixes byte-level damage; NFC canonicalizes equivalent
# codepoint sequences so 'é' and 'e'+COMBINING ACUTE dedup/tokenize
# identically). No JVM builtin exists, so this is a declared
# Arrow-batched pandas UDF over stdlib unicodedata — the sanctioned
# slow path, vectorized per batch, never per-row Python.

import unicodedata

import pandas as pd  # module-level: pandas_udf type-hint resolution


def nfc_normalize(df: DataFrame, text_col: str = "text",
                  out_col: str | None = None,
                  form: str = "NFC") -> DataFrame:
    """Canonical-composition normalization of a string column (NFC by
    default; NFD/NFKC/NFKD accepted). The UDF is built per call — a
    pandas_udf decorator needs an active session, so module import
    stays session-free."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None
                     else unicodedata.normalize(form, v))

    return df.withColumn(out_col or text_col, _norm(F.col(text_col)))
