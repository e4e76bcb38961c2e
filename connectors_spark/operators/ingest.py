"""ES ingest-pipeline processor chain compiled to one Catalyst projection.

Reference parity: elastic/connectors delegates per-document mutation to an
Elasticsearch ingest pipeline at bulk time (the `pipeline` param wired in
svc/es/sink.py; processor semantics are the public ES ingest processors).
This module re-expresses the commonly used *pure-function* processor
subset — set / rename / remove / lowercase / uppercase / trim / gsub /
split / join / convert / dissect / kv / csv — as a compiler from the
ES-style JSON processor list to plain Spark Column expressions.

Spark-first design: the whole pipeline folds into ONE narrow projection
(`withColumns` chain, zero UDFs, zero shuffles), so Catalyst collapses it
into the scan stage and whole-stage codegen runs every processor in the
same generated loop. At 100 TB the pipeline adds no stage boundary: it is
a free rider on whatever scan/shuffle the surrounding plan already does.

grok lives in functions/scalars.py (`grok_extract`) and composes with
this chain; `dissect_to_regex` below mirrors its compile-to-one-regex
strategy so the identical compiled pattern also runs under DuckDB's RE2
in the oracle twin.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DISSECT_REF = _re.compile(r"%\{(\w+)\}")


def dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile an ES dissect pattern ("%{a} %{b}|%{c}") to one anchored
    regex with numbered groups. Every key is non-greedy except the
    last (dissect's documented right-greedy tail); literal separators
    are regex-escaped verbatim. Same compiled string runs under Java
    regex (Spark) and RE2 (DuckDB oracle)."""
    fields: list[str] = []
    out: list[str] = ["^"]
    last = 0
    matches = list(_DISSECT_REF.finditer(pattern))
    for i, m in enumerate(matches):
        out.append(_re.escape(pattern[last:m.start()]))
        fields.append(m.group(1))
        out.append("(.*)" if i == len(matches) - 1 else "(.*?)")
        last = m.end()
    out.append(_re.escape(pattern[last:]))
    out.append("$")
    return "".join(out), fields


_CONVERT_TYPES = {
    "integer": "int", "long": "bigint", "float": "float",
    "double": "double", "string": "string", "boolean": "boolean",
}


def _apply_one(cols: dict[str, F.Column], kind: str, p: dict) -> None:
    """Apply one processor spec to the mutable name->Column mapping."""
    f = p.get("field")

    def src() -> F.Column:
        if f in cols:
            return cols[f]
        return F.col(f)

    if kind == "set":
        cols[f] = F.lit(p["value"])
    elif kind == "rename":
        cols[p["target_field"]] = src()
        cols[f] = None
    elif kind == "remove":
        cols[f] = None
    elif kind == "lowercase":
        cols[f] = F.lower(src())
    elif kind == "uppercase":
        cols[f] = F.upper(src())
    elif kind == "trim":
        cols[f] = F.trim(src())
    elif kind == "gsub":
        cols[f] = F.regexp_replace(src(), p["pattern"], p["replacement"])
    elif kind == "split":
        cols[p.get("target_field", f)] = F.split(src(), p["separator"])
    elif kind == "join":
        cols[p.get("target_field", f)] = F.array_join(src(), p["separator"])
    elif kind == "convert":
        # try_cast, not cast: under ANSI mode a plain cast of one
        # malformed value ('' from a no-match extraction) fails the
        # whole job; ES's convert processor fails only that document.
        # NULL-on-malformed is the distributed analog of that per-doc
        # failure scope.
        cols[p.get("target_field", f)] = src().try_cast(
            _CONVERT_TYPES[p["type"]])
    elif kind == "dissect":
        regex, fields = dissect_to_regex(p["pattern"])
        for i, name in enumerate(fields, start=1):
            cols[name] = F.regexp_extract(src(), regex, i)
    elif kind == "kv":
        fs, vs = p.get("field_split", " "), p.get("value_split", "=")
        for key in p["target_keys"]:
            pat = (f"(?:^|{_re.escape(fs)}){_re.escape(key)}"
                   f"{_re.escape(vs)}([^{_re.escape(fs)}]*)")
            cols[key] = F.regexp_extract(src(), pat, 1)
    elif kind == "csv":
        sep = p.get("separator", ",")
        for i, name in enumerate(p["target_fields"], start=1):
            cols[name] = F.split_part(src(), F.lit(sep), F.lit(i))
    else:
        raise ValueError(f"unknown ingest processor {kind!r}")


def apply_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    """Compile an ES-style processor list ([{"kv": {...}}, ...]) into one
    projection over `df`. Processors run in list order and later
    processors see earlier outputs (expression substitution, so the
    final plan is still a single Project node). Unknown processor
    names raise ValueError up front — the ES pipeline PUT validates
    the same way."""
    cols: dict[str, F.Column | None] = {
        name: F.col(name) for name in df.columns}
    for spec in processors:
        if len(spec) != 1:
            raise ValueError(f"each processor must be one {{kind: params}} "
                             f"dict, got {sorted(spec)}")
        (kind, params), = spec.items()
        _apply_one(cols, kind, params)
    return df.select(*[
        c.alias(name) for name, c in cols.items() if c is not None])
