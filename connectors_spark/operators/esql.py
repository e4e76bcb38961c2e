"""ES|QL subset compiler: pipe programs -> Spark DataFrame plans.

The reference syncs content into Elasticsearch, where ES|QL is the
modern query surface over those indices (`POST /_query {"query": "FROM
idx | ..."}`; the piped language is public Elastic documentation).
This module implements the language itself — tokenizer, Pratt
expression parser, and a compiler from the AST to native Spark
`Column`/`DataFrame` operations — so a reference user's ES|QL programs
run against the same tables here.

Supported commands (case-insensitive):

    FROM t1[, t2] [METADATA _index]   union of registered tables; the
                             METADATA clause adds source provenance
    ROW a = 1, b = "x"       literal one-row source
    WHERE <boolean expr>
    EVAL n1 = e1, n2 = e2    sequential (n2 may reference n1)
    STATS a = AGG(...) [WHERE cond] [, ...] BY k1 [, k2]   (BY optional;
          per-aggregate WHERE filters; BUCKET() in BY keys)
    SORT e [ASC|DESC] [NULLS FIRST|LAST], ...
    LIMIT n
    KEEP  c1, pat*           column projection, pattern order kept
    DROP  c1, pat*
    RENAME old AS new, ...
    MV_EXPAND col            multivalue -> rows (null stays one row)
    GROK  col "pattern"      reuses functions/scalars.py grok compiler
    DISSECT col "pattern"    delimiter-based extraction (dissect_extract)
    ENRICH policy ON key [WITH f1, ...]   broadcast lookup join (deduped)
    LOOKUP JOIN table ON field   broadcast left join, fan-out preserved
    INLINESTATS aggs [BY keys]   STATS appended to rows (window / bcast)
    SAMPLE p                 deterministic row-content Bernoulli sample
    CHANGE_POINT v [ON k] [AS t, p]   step-change detection (bounded)
    FORK (branch) (branch)   sub-pipelines over same input, _fork tag
    COMPLETION [col =] prompt WITH endpoint   registered inference fn
    RERANK [col =] "query" ON field WITH endpoint   registered reranker

Expression grammar (precedence low->high): OR, AND, NOT, comparison
(`== != < <= > >=`, `IN (...)`, `[NOT] LIKE` (ES|QL `*`/`?` wildcards),
`[NOT] RLIKE`, `IS [NOT] NULL`), additive, multiplicative, unary minus.
String literals are double-quoted; timespan literals (`1 day`) are
accepted where ES|QL takes them (DATE_TRUNC, BUCKET).

Scale shape: every construct compiles to native Catalyst expressions —
no UDF anywhere in the language. A `WHERE` ahead of `STATS` therefore
reaches the parquet scan as a pushed filter, `STATS` gets map-side
partial aggregation, `SORT|LIMIT` fuses to TakeOrderedAndProject, and
`ENRICH` broadcasts the (bounded, ES-materialized) policy table — the
same plans the hand-written DataFrame gates produce, because it IS the
same API underneath. Parsing is driver-side over a program string of a
few hundred bytes; nothing about program size scales with data.
"""

from __future__ import annotations

import re
from fnmatch import fnmatch

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- tokens

_TOKEN_RE = re.compile(
    r'\s*(?:'
    r'(?P<str>"(?:[^"\\]|\\.)*")'
    r'|(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)'
    r'|(?P<ident>[A-Za-z_@][A-Za-z0-9_.@]*)'
    r'|(?P<op>==|!=|<=|>=|[()<>,+\-*/%=])'
    r')'
)

_TIME_UNITS = {
    "year": "year", "years": "year", "quarter": "quarter",
    "quarters": "quarter", "month": "month", "months": "month",
    "week": "week", "weeks": "week", "day": "day", "days": "day",
    "hour": "hour", "hours": "hour", "minute": "minute",
    "minutes": "minute", "second": "second", "seconds": "second",
}

_KEYWORDS = {"and", "or", "not", "in", "like", "rlike", "is", "null",
             "true", "false", "asc", "desc", "nulls", "first", "last",
             "by", "as", "on", "with", "where"}


class EsqlError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise EsqlError(f"bad token at: {text[pos:pos + 20]!r}")
        pos = m.end()
        if m.group("str") is not None:
            body = m.group("str")[1:-1]
            toks.append(("str", re.sub(r"\\(.)", r"\1", body)))
        elif m.group("num") is not None:
            toks.append(("num", m.group("num")))
        elif m.group("ident") is not None:
            toks.append(("ident", m.group("ident")))
        else:
            toks.append(("op", m.group("op")))
    return toks


class _Cursor:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self, ahead: int = 0):
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        k, v = self.peek()
        return k == "ident" and v.lower() in words

    def eat_kw(self, word: str):
        if not self.at_kw(word):
            raise EsqlError(f"expected {word!r}, got {self.peek()!r}")
        self.next()

    def eat_op(self, op: str):
        k, v = self.next()
        if k != "op" or v != op:
            raise EsqlError(f"expected {op!r}, got {(k, v)!r}")

    def done(self) -> bool:
        return self.i >= len(self.toks)


# ------------------------------------------------------------------- AST
# Nodes are plain tuples: ("lit", v) ("col", name) ("call", fn, [args])
# ("bin", op, l, r) ("not", x) ("neg", x) ("in", x, [exprs], negated)
# ("like", x, pat, negated, regex?) ("isnull", x, negated)
# ("span", n, unit)


def _parse_expr(c: _Cursor):
    return _parse_or(c)


def _parse_or(c: _Cursor):
    left = _parse_and(c)
    while c.at_kw("or"):
        c.next()
        left = ("bin", "or", left, _parse_and(c))
    return left


def _parse_and(c: _Cursor):
    left = _parse_not(c)
    while c.at_kw("and"):
        c.next()
        left = ("bin", "and", left, _parse_not(c))
    return left


def _parse_not(c: _Cursor):
    if c.at_kw("not"):
        c.next()
        return ("not", _parse_not(c))
    return _parse_cmp(c)


def _parse_cmp(c: _Cursor):
    left = _parse_add(c)
    k, v = c.peek()
    if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
        c.next()
        return ("bin", v, left, _parse_add(c))
    negated = False
    if c.at_kw("not") and c.peek(1)[1].lower() in ("in", "like", "rlike"):
        c.next()
        negated = True
    if c.at_kw("in"):
        c.next()
        c.eat_op("(")
        items = [_parse_expr(c)]
        while c.peek() == ("op", ","):
            c.next()
            items.append(_parse_expr(c))
        c.eat_op(")")
        return ("in", left, items, negated)
    if c.at_kw("like") or c.at_kw("rlike"):
        is_regex = c.next()[1].lower() == "rlike"
        k2, pat = c.next()
        if k2 != "str":
            raise EsqlError("LIKE/RLIKE needs a string pattern")
        return ("like", left, pat, negated, is_regex)
    if c.at_kw("is"):
        c.next()
        neg = False
        if c.at_kw("not"):
            c.next()
            neg = True
        c.eat_kw("null")
        return ("isnull", left, neg)
    return left


def _parse_add(c: _Cursor):
    left = _parse_mul(c)
    while c.peek()[0] == "op" and c.peek()[1] in ("+", "-"):
        op = c.next()[1]
        left = ("bin", op, left, _parse_mul(c))
    return left


def _parse_mul(c: _Cursor):
    left = _parse_unary(c)
    while c.peek()[0] == "op" and c.peek()[1] in ("*", "/", "%"):
        op = c.next()[1]
        left = ("bin", op, left, _parse_unary(c))
    return left


def _parse_unary(c: _Cursor):
    if c.peek() == ("op", "-"):
        c.next()
        return ("neg", _parse_unary(c))
    return _parse_primary(c)


def _parse_primary(c: _Cursor):
    k, v = c.next()
    if k == "num":
        num = float(v) if ("." in v or "e" in v.lower()) else int(v)
        # timespan literal: NUMBER UNIT (e.g. `1 day`, `3 hours`)
        nk, nv = c.peek()
        if nk == "ident" and nv.lower() in _TIME_UNITS:
            c.next()
            return ("span", num, _TIME_UNITS[nv.lower()])
        return ("lit", num)
    if k == "str":
        return ("lit", v)
    if k == "op" and v == "(":
        e = _parse_expr(c)
        c.eat_op(")")
        return e
    if k == "op" and v == "*":
        # only valid as COUNT(*)'s argument; _compile rejects it elsewhere
        return ("col", "*")
    if k == "ident":
        low = v.lower()
        if low == "true":
            return ("lit", True)
        if low == "false":
            return ("lit", False)
        if low == "null":
            return ("lit", None)
        if c.peek() == ("op", "("):  # function call
            c.next()
            args = []
            if c.peek() != ("op", ")"):
                args.append(_parse_expr(c))
                while c.peek() == ("op", ","):
                    c.next()
                    args.append(_parse_expr(c))
            c.eat_op(")")
            return ("call", v.upper(), args)
        if v == "*":
            return ("col", "*")
        return ("col", v)
    raise EsqlError(f"unexpected token {(k, v)!r}")


# -------------------------------------------------------------- compiler

def _like_to_sql(pat: str) -> str:
    """ES|QL wildcard pattern (`*`/`?`) -> SQL LIKE pattern, escaping
    SQL's own metacharacters."""
    return (pat.replace("\\", "\\\\").replace("%", r"\%")
            .replace("_", r"\_").replace("*", "%").replace("?", "_"))


def _span_arg(ast, what: str) -> str:
    if ast[0] == "span":
        return ast[2]
    if ast[0] == "lit" and isinstance(ast[1], str):
        return ast[1]
    raise EsqlError(f"{what} needs a timespan (e.g. `1 day`)")


def _lit_arg(ast, what: str):
    if ast[0] == "neg" and ast[1][0] == "lit":
        return -ast[1][1]
    if ast[0] != "lit":
        raise EsqlError(f"{what} must be a literal")
    return ast[1]


_DATE_PARTS = {
    "year": F.year, "month": F.month, "day": F.dayofmonth,
    "hour": F.hour, "minute": F.minute, "second": F.second,
    "dayofweek": F.dayofweek, "dayofyear": F.dayofyear,
    "week": F.weekofyear, "quarter": F.quarter,
}

_DATE_DIFF_US = {
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
    "week": 604_800_000_000, "weeks": 604_800_000_000,
}


def _date_diff_fn(a, r):
    unit = str(_lit_arg(r[0], "DATE_DIFF unit")).lower()
    if unit in _DATE_DIFF_US:
        delta = (F.unix_micros(a[2].cast("timestamp"))
                 - F.unix_micros(a[1].cast("timestamp")))
        # double division + long cast truncates toward zero, matching
        # ES; micros fit a double exactly out to year ~2255
        return (delta.cast("double") / F.lit(float(_DATE_DIFF_US[unit]))
                ).cast("long")
    mb = F.months_between(a[2], a[1], roundOff=False)
    if unit in ("month", "months"):
        return mb.cast("long")
    if unit in ("quarter", "quarters"):
        return (mb / F.lit(3.0)).cast("long")
    if unit in ("year", "years"):
        return (mb / F.lit(12.0)).cast("long")
    raise EsqlError(f"DATE_DIFF: unknown unit {unit!r}")


def _mv_slice_fn(a, r):
    # MV_SLICE(col, start [, end]): 0-based INCLUSIVE bounds, negatives
    # count from the end — the ES|QL contract, mapped onto Spark's
    # 1-based slice(col, start, length) with clamping instead of the
    # ANSI out-of-bounds error
    start = int(_lit_arg(r[1], "MV_SLICE start"))
    end = int(_lit_arg(r[2], "MV_SLICE end")) if len(r) > 2 else start
    n = F.size(a[0])

    def norm(i: int):
        return F.lit(i + 1) if i >= 0 else n + F.lit(i + 1)

    s = F.greatest(norm(start), F.lit(1))
    length = F.greatest(norm(end) - s + F.lit(1), F.lit(0))
    return F.slice(a[0], s, length)


def _mv_nonnull(col):
    """ES|QL multivalues carry no nulls; a null-bearing array from a
    Spark-side expression is treated as if the nulls were absent, and
    an empty/all-null multivalue yields null (not 0) — matching ES|QL's
    missing-value result for MV_SUM/MV_AVG/MV_MEDIAN (ADVICE r4)."""
    return F.filter(col, lambda x: x.isNotNull())


def _mv_sum_fn(a, r):
    nn = _mv_nonnull(a[0])
    return F.when(F.size(nn) > 0, F.aggregate(
        nn, F.lit(0.0), lambda acc, x: acc + x.try_cast("double")))


def _mv_avg_fn(a, r):
    nn = _mv_nonnull(a[0])
    return F.when(F.size(nn) > 0, F.aggregate(
        nn, F.lit(0.0), lambda acc, x: acc + x.try_cast("double"))
        / F.size(nn))


def _mv_median_fn(a, r):
    srt = F.array_sort(_mv_nonnull(a[0]))
    n = F.size(srt)
    i1 = ((n - F.lit(1)) / F.lit(2)).cast("int")
    i2 = (n / F.lit(2)).cast("int")
    return F.when(n > 0, (F.get(srt, i1).try_cast("double")
                          + F.get(srt, i2).try_cast("double")) / F.lit(2.0))


# scalar registry: name -> fn(compiled_cols, raw_asts) -> Column

def _cidr_match_any(col, blocks):
    from connectors_spark.operators.query import cidr_match

    if not blocks:
        raise EsqlError("CIDR_MATCH needs at least one block")
    cond = cidr_match(col, blocks[0])
    for blk in blocks[1:]:
        cond = cond | cidr_match(col, blk)
    return cond

_SCALARS = {
    "ABS": lambda a, r: F.abs(a[0]),
    "CEIL": lambda a, r: F.ceil(a[0]),
    "FLOOR": lambda a, r: F.floor(a[0]),
    "SQRT": lambda a, r: F.sqrt(a[0]),
    "EXP": lambda a, r: F.exp(a[0]),
    "LOG10": lambda a, r: F.log10(a[0]),
    "LOG": lambda a, r: (F.log(a[0]) if len(a) == 1
                         else F.log(float(_lit_arg(r[0], "LOG base")),
                                    a[1])),
    "POW": lambda a, r: F.pow(a[0], a[1]),
    "ROUND": lambda a, r: F.round(a[0], int(_lit_arg(r[1], "ROUND digits"))
                                  if len(a) > 1 else 0),
    "CONCAT": lambda a, r: F.concat(*a),
    "LENGTH": lambda a, r: F.length(a[0]),
    "SUBSTRING": lambda a, r: (F.substring(a[0], a[1], a[2]) if len(a) == 3
                               else a[0].substr(a[1], F.length(a[0]))),
    "TO_UPPER": lambda a, r: F.upper(a[0]),
    "TO_LOWER": lambda a, r: F.lower(a[0]),
    "TRIM": lambda a, r: F.trim(a[0]),
    "LTRIM": lambda a, r: F.ltrim(a[0]),
    "RTRIM": lambda a, r: F.rtrim(a[0]),
    "REPLACE": lambda a, r: F.regexp_replace(
        a[0], _lit_arg(r[1], "REPLACE regex"), _lit_arg(r[2], "REPLACE new")),
    "SPLIT": lambda a, r: F.split(a[0], re.escape(_lit_arg(r[1], "SPLIT"))),
    "STARTS_WITH": lambda a, r: a[0].startswith(a[1]),
    "ENDS_WITH": lambda a, r: a[0].endswith(a[1]),
    # ES|QL CIDR_MATCH(ip, "block", ...): true if the ip falls in ANY
    # of the literal CIDR blocks (operators/query.py bit math)
    "CIDR_MATCH": lambda a, r: _cidr_match_any(
        a[0], [_lit_arg(x, "CIDR_MATCH block") for x in r[1:]]),
    "LOCATE": lambda a, r: F.locate(_lit_arg(r[1], "LOCATE"), a[0]),
    "COALESCE": lambda a, r: F.coalesce(*a),
    "GREATEST": lambda a, r: F.greatest(*a),
    "LEAST": lambda a, r: F.least(*a),
    "TO_STRING": lambda a, r: a[0].cast("string"),
    "TO_LONG": lambda a, r: a[0].cast("long"),
    "TO_INTEGER": lambda a, r: a[0].cast("int"),
    "TO_INT": lambda a, r: a[0].cast("int"),
    "TO_DOUBLE": lambda a, r: a[0].cast("double"),
    "TO_BOOLEAN": lambda a, r: a[0].cast("boolean"),
    "DATE_TRUNC": lambda a, r: F.date_trunc(_span_arg(r[0], "DATE_TRUNC"),
                                            a[1]),
    "DATE_EXTRACT": lambda a, r: _DATE_PARTS[
        str(_lit_arg(r[0], "DATE_EXTRACT part")).lower()](a[1]),
    "MV_COUNT": lambda a, r: F.size(a[0]),
    "MV_MAX": lambda a, r: F.array_max(a[0]),
    "MV_MIN": lambda a, r: F.array_min(a[0]),
    # empty / all-null multivalue -> null (ES|QL missing result), not 0
    "MV_SUM": _mv_sum_fn,
    "MV_AVG": _mv_avg_fn,
    "MV_CONCAT": lambda a, r: F.array_join(a[0], _lit_arg(r[1],
                                                          "MV_CONCAT sep")),
    # MV_SORT(col [, "DESC"]) — ES|QL default ASC
    "MV_SORT": lambda a, r: (
        F.reverse(F.array_sort(a[0]))
        if len(r) > 1 and str(_lit_arg(r[1], "MV_SORT order")).upper()
        == "DESC" else F.array_sort(a[0])),
    "MV_DEDUPE": lambda a, r: F.array_distinct(a[0]),
    # F.get is 0-based and null-safe (no ANSI element_at error on empty)
    "MV_FIRST": lambda a, r: F.get(a[0], 0),
    "MV_LAST": lambda a, r: F.get(a[0], F.size(a[0]) - 1),
    "MV_SLICE": _mv_slice_fn,
    "MV_MEDIAN": _mv_median_fn,
    # DATE_DIFF(unit, start, end): ES truncates toward zero ("multiples
    # of unit"); fixed units via exact microsecond arithmetic,
    # month/quarter/year via months_between
    "DATE_DIFF": _date_diff_fn,
    # DATE_FORMAT([java-pattern,] date) — same DateTimeFormatter pattern
    # family in ES|QL and Spark
    "DATE_FORMAT": lambda a, r: (
        F.date_format(a[1], _lit_arg(r[0], "DATE_FORMAT pattern"))
        if len(a) == 2
        else F.date_format(a[0], "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
}


def _nice_span(lo: float, hi: float, target: int) -> float:
    """ES|QL BUCKET(field, target, min, max) span selection: the first
    1/2/5-ladder value whose bucket count is <= target (ES picks a
    "nice" span and documents that the result may have fewer buckets
    than asked). min/max/target are literals, so this is an O(1)
    compile-time decision — exactly like the ES coordinator's rounding,
    and reproducible in the oracle from the same constants."""
    import math

    raw = (hi - lo) / max(target, 1)
    if raw <= 0:
        return 1.0
    mag = 10.0 ** math.floor(math.log10(raw))
    for mult in (1.0, 2.0, 5.0, 10.0):
        if mult * mag >= raw:
            return mult * mag
    return 10.0 * mag


def _bucket_fn(a, r):
    # BUCKET(ts, 1 day) | BUCKET(x, span) | BUCKET(x, target, min, max)
    if r[1][0] == "span":
        return F.date_trunc(r[1][2], a[0])
    if len(r) == 4:
        lo = float(_lit_arg(r[2], "BUCKET min"))
        hi = float(_lit_arg(r[3], "BUCKET max"))
        span = _nice_span(lo, hi, int(_lit_arg(r[1], "BUCKET target")))
    else:
        span = float(_lit_arg(r[1], "BUCKET span"))
    return F.floor(a[0] / F.lit(span)) * F.lit(span)


_SCALARS["BUCKET"] = _bucket_fn


def _categorize_fn(a, r):
    """ES|QL CATEGORIZE(field) grouping function (8.18+/9.x STATS BY):
    the engine's token-pattern category — lowercase analyzer tokens,
    numeric tokens dropped (they are the variable slots of log
    templates), first 4 pattern tokens joined — the same normalizer as
    the standalone categorize_text gate, as a pure Column."""
    from connectors_spark import TOKEN_SPLIT_RE

    toks = F.filter(
        F.split(F.lower(a[0]), TOKEN_SPLIT_RE),
        lambda t: (t != "") & ~t.rlike("^[0-9]+$"))
    return F.array_join(F.slice(toks, 1, 4), " ")


_SCALARS["CATEGORIZE"] = _categorize_fn


def _case_fn(a, r):
    # CASE(c1, v1, [c2, v2, ...][, default])
    out = None
    i = 0
    while i + 1 < len(a):
        out = (F.when(a[i], a[i + 1]) if out is None
               else out.when(a[i], a[i + 1]))
        i += 2
    if out is None:
        raise EsqlError("CASE needs at least (condition, value)")
    return out.otherwise(a[i]) if i < len(a) else out


_SCALARS["CASE"] = _case_fn


def _match_fn(a, r):
    # ES|QL MATCH(field, "query"): full-text match predicate — true
    # when EVERY analyzed query term occurs in the analyzed field
    # (the ES default `match` + operator AND filter-context shape).
    # Pure JVM array expressions over the engine's own analyzer chain.
    from connectors_spark import TOKEN_SPLIT_RE
    from connectors_spark.functions.analysis import tokens_col

    qtext = str(_lit_arg(r[1], "MATCH query"))
    terms = sorted({t for t in re.split(TOKEN_SPLIT_RE, qtext.lower())
                    if t})
    if not terms:
        raise EsqlError("MATCH needs a non-empty query string")
    toks = tokens_col(a[0])
    return (
        F.size(F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(t) for t in terms]))) == F.lit(len(terms))
    )


_SCALARS["MATCH"] = _match_fn

# aggregate registry: name -> fn(compiled_cols, raw_asts) -> Column
_AGGS = {
    "COUNT": lambda a, r: (F.count(F.lit(1))
                           if not r or r[0] == ("col", "*")
                           else F.count(a[0])),
    "COUNT_DISTINCT": lambda a, r: F.count_distinct(*a),
    "SUM": lambda a, r: F.sum(a[0]),
    "AVG": lambda a, r: F.avg(a[0]),
    "MIN": lambda a, r: F.min(a[0]),
    "MAX": lambda a, r: F.max(a[0]),
    "MEDIAN": lambda a, r: F.median(a[0]),
    "PERCENTILE": lambda a, r: F.percentile(
        a[0], float(_lit_arg(r[1], "PERCENTILE p")) / 100.0),
    "STD_DEV": lambda a, r: F.stddev_samp(a[0]),
    "VALUES": lambda a, r: F.array_sort(F.collect_set(a[0])),
    "TOP": lambda a, r: F.slice(
        F.sort_array(F.collect_list(a[0]),
                     asc=str(_lit_arg(r[2], "TOP order")).lower() == "asc"),
        1, int(_lit_arg(r[1], "TOP n"))),
    "WEIGHTED_AVG": lambda a, r: (F.sum(a[0] * a[1]) / F.sum(a[1])),
}


def _compile(ast, allow_agg: bool = False, agg_filter=None):
    kind = ast[0]
    if kind == "lit":
        return F.lit(ast[1])
    if kind == "col":
        if ast[1] == "*":
            raise EsqlError("`*` is only valid as COUNT(*)")
        return F.col(ast[1])
    if kind == "span":
        raise EsqlError("timespan literal outside DATE_TRUNC/BUCKET")
    if kind == "neg":
        return -_compile(ast[1], allow_agg, agg_filter)
    if kind == "not":
        return ~_compile(ast[1], allow_agg, agg_filter)
    if kind == "isnull":
        c = _compile(ast[1], allow_agg, agg_filter)
        return c.isNotNull() if ast[2] else c.isNull()
    if kind == "in":
        c = _compile(ast[1], allow_agg, agg_filter)
        vals = [_lit_arg(x, "IN list item") for x in ast[2]]
        return ~c.isin(vals) if ast[3] else c.isin(vals)
    if kind == "like":
        c = _compile(ast[1], allow_agg, agg_filter)
        got = c.rlike(ast[2]) if ast[4] else c.like(_like_to_sql(ast[2]))
        return ~got if ast[3] else got
    if kind == "bin":
        op = ast[1]
        left = _compile(ast[2], allow_agg, agg_filter)
        right = _compile(ast[3], allow_agg, agg_filter)
        return {
            "or": lambda: left | right, "and": lambda: left & right,
            "==": lambda: left == right, "!=": lambda: left != right,
            "<": lambda: left < right, "<=": lambda: left <= right,
            ">": lambda: left > right, ">=": lambda: left >= right,
            "+": lambda: left + right, "-": lambda: left - right,
            "*": lambda: left * right, "/": lambda: left / right,
            "%": lambda: left % right,
        }[op]()
    if kind == "call":
        name, args = ast[1], ast[2]
        if name in _AGGS:
            if not allow_agg:
                raise EsqlError(f"aggregate {name} outside STATS")
            if agg_filter is not None:
                # per-aggregate WHERE (ES|QL `STATS n = AGG(x) WHERE c`):
                # rows failing c contribute NULL, which every aggregate
                # here skips — COUNT(*) counts a conditional literal
                if name == "COUNT" and (not args or args == [("col", "*")]):
                    return F.count(F.when(agg_filter, F.lit(1)))
                compiled = [F.when(agg_filter, _compile(x)) for x in args]
                return _AGGS[name](compiled, args)
            compiled = [] if args == [("col", "*")] else \
                [_compile(x) for x in args]
            return _AGGS[name](compiled, args)
        if name in _SCALARS:
            # span literals have no Column form — functions that take
            # them (DATE_TRUNC) read the raw AST, so pass None through
            compiled = [None if x[0] == "span" else _compile(x, allow_agg, agg_filter)
                        for x in args]
            return _SCALARS[name](compiled, args)
        raise EsqlError(f"unknown function {name}")
    raise EsqlError(f"unknown AST node {kind}")


# ------------------------------------------------------- command parsing

def _split_pipes(program: str) -> list[str]:
    """Split on `|` outside double-quoted strings and outside parens
    (FORK branches are parenthesized sub-pipelines whose own pipes must
    stay with their branch)."""
    parts, buf, in_str, esc, depth = [], [], False, False, 0
    for ch in program:
        if esc:
            buf.append(ch)
            esc = False
            continue
        if ch == "\\" and in_str:
            buf.append(ch)
            esc = True
            continue
        if ch == '"':
            in_str = not in_str
            buf.append(ch)
            continue
        if not in_str and ch == "(":
            depth += 1
        elif not in_str and ch == ")":
            depth -= 1
        if ch == "|" and not in_str and depth == 0:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf))
    out = [p.strip() for p in parts if p.strip()]
    if not out:
        raise EsqlError("empty program")
    return out


def _parse_assignments(c: _Cursor, stop_kw: frozenset[str] = frozenset(),
                       allow_where: bool = False):
    """Comma-separated `name = expr [WHERE cond]` | bare expr list; bare
    exprs are named by their source text with whitespace squeezed (the
    ES|QL auto-naming convention). `WHERE` (per-aggregate filters, STATS
    only) is parsed when allow_where. Returns (name, expr, where|None)
    triples."""
    out: list[tuple[str, object, object]] = []
    while not c.done():
        if c.peek()[0] == "ident" and c.peek()[1].lower() in stop_kw:
            break
        start = c.i
        name = None
        # an ident directly followed by `=` is an assignment target even
        # when it collides with a clause keyword (ES|QL allows columns
        # named `first`, `on`, ...); only expression literals and unary
        # operators can never be names
        if (c.peek()[0] == "ident"
                and c.peek()[1].lower() not in ("true", "false", "null",
                                                "not")
                and c.peek(1) == ("op", "=")):
            name = c.next()[1]
            c.next()
            start = c.i
        expr = _parse_expr(c)
        if name is None:
            name = _source_name(c.toks[start:c.i])
        where = None
        if allow_where and c.at_kw("where"):
            c.next()
            where = _parse_expr(c)
        out.append((name, expr, where))
        if c.peek() == ("op", ","):
            c.next()
            continue
        break
    return out


def _source_name(toks: list[tuple[str, str]]) -> str:
    frags = []
    for k, v in toks:
        frags.append(f'"{v}"' if k == "str" else v)
    return "".join(frags)


def _split_fork_branches(body: str) -> list[str]:
    """Split a FORK body `( ... ) ( ... )` into branch programs,
    respecting nested parens and double-quoted strings."""
    branches, buf, depth, in_str, esc = [], [], 0, False, False
    for ch in body:
        if esc:
            buf.append(ch)
            esc = False
            continue
        if ch == "\\" and in_str:
            buf.append(ch)
            esc = True
            continue
        if ch == '"':
            in_str = not in_str
            buf.append(ch)
            continue
        if in_str:
            buf.append(ch)
            continue
        if ch == "(":
            depth += 1
            if depth == 1:
                buf = []
                continue
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise EsqlError("FORK: unbalanced parens")
            if depth == 0:
                branches.append("".join(buf).strip())
                buf = []
                continue
        elif depth == 0:
            if not ch.isspace():
                raise EsqlError(
                    f"FORK: unexpected text outside branch parens: {ch!r}")
            continue
        buf.append(ch)
    if depth != 0:
        raise EsqlError("FORK: unbalanced parens")
    if not all(branches):
        raise EsqlError("FORK: empty branch")
    return branches


def _cmd_split(seg: str) -> tuple[str, str]:
    m = re.match(r"\s*([A-Za-z_]+)\s*(.*)", seg, re.S)
    if not m:
        raise EsqlError(f"bad command: {seg!r}")
    return m.group(1).upper(), m.group(2)


def esql(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    program: str,
    enrich_policies: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Compile and run an ES|QL program. `tables` maps FROM names to
    DataFrames; `enrich_policies` maps ENRICH policy names to
    (policy_frame, match_column). Returns the lazy result frame —
    nothing is executed here."""
    segments = _split_pipes(program)
    tables = dict(tables)
    cmd, body = _cmd_split(segments[0])
    if cmd == "FROM":
        # `FROM t1[, t2] [METADATA _index]`: the METADATA clause adds
        # the ES _index pseudo-field — source-table provenance, which
        # is what makes a multi-index union navigable downstream
        m = re.match(r"(.*?)\s+[Mm][Ee][Tt][Aa][Dd][Aa][Tt][Aa]\s+"
                     r"(_\w+)\s*$", body, re.S)
        meta_field = None
        if m:
            body, meta_field = m.group(1), m.group(2)
            if meta_field != "_index":
                raise EsqlError(
                    f"unsupported METADATA field {meta_field!r}")
        names = [t.strip() for t in body.split(",")]
        dfs = []
        for n in names:
            if n not in tables:
                raise EsqlError(f"unknown table {n!r}")
            t = tables[n]
            if meta_field:
                t = t.withColumn(meta_field, F.lit(n))
            dfs.append(t)
        df = dfs[0]
        for other in dfs[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
    elif cmd == "ROW":
        c = _Cursor(_tokenize(body))
        cols = [_compile(e).alias(n) for n, e, _ in _parse_assignments(c)]
        df = spark.range(1).select(*cols)
    else:
        raise EsqlError(f"program must start with FROM or ROW, got {cmd}")

    for seg in segments[1:]:
        cmd, body = _cmd_split(seg)
        df = _apply_command(df, cmd, body, enrich_policies or {}, tables)
    return df


def _require_done(c: _Cursor, cmd: str) -> None:
    """Trailing tokens mean the parse stopped early — always an error,
    never silently dropped (the bug class: `value * 1.5` mis-tokenized
    would otherwise quietly become `value`)."""
    if not c.done():
        raise EsqlError(f"{cmd}: unparsed trailing input at {c.peek()!r}")


def _apply_command(df: DataFrame, cmd: str, body: str,
                   policies: dict[str, tuple[DataFrame, str]],
                   tables: dict[str, DataFrame]) -> DataFrame:
    if cmd == "WHERE":
        c = _Cursor(_tokenize(body))
        expr = _parse_expr(c)
        _require_done(c, "WHERE")
        return df.filter(_compile(expr))

    if cmd == "EVAL":
        c = _Cursor(_tokenize(body))
        assigns = _parse_assignments(c)
        if not assigns:
            raise EsqlError("EVAL needs at least one assignment")
        _require_done(c, "EVAL")
        for name, expr, _w in assigns:
            df = df.withColumn(name, _compile(expr))
        return df

    if cmd == "STATS":
        c = _Cursor(_tokenize(body))
        aggs = _parse_assignments(c, stop_kw=frozenset({"by"}),
                                  allow_where=True)
        if not aggs:
            raise EsqlError("STATS needs at least one aggregate")
        keys: list[tuple[str, object, object]] = []
        if c.at_kw("by"):
            c.next()
            keys = _parse_assignments(c)
        _require_done(c, "STATS")
        agg_cols = [
            _compile(e, allow_agg=True,
                     agg_filter=None if w is None else _compile(w)).alias(n)
            for n, e, w in aggs]
        if not keys:
            return df.agg(*agg_cols)
        key_cols = [_compile(e).alias(n) for n, e, _w in keys]
        return df.groupBy(*key_cols).agg(*agg_cols)

    if cmd == "INLINESTATS":
        # ES|QL INLINESTATS: STATS semantics but the aggregates are
        # APPENDED to every input row instead of collapsing them. With
        # BY keys this is a per-key window aggregate (one shuffle on the
        # keys, same as the STATS it shadows); with no keys the 1-row
        # global aggregate is broadcast-cross-joined — never a
        # single-partition global window.
        c = _Cursor(_tokenize(body))
        aggs = _parse_assignments(c, stop_kw=frozenset({"by"}),
                                  allow_where=True)
        if not aggs:
            raise EsqlError("INLINESTATS needs at least one aggregate")
        keys = []
        if c.at_kw("by"):
            c.next()
            keys = _parse_assignments(c)
        _require_done(c, "INLINESTATS")

        def agg_col(e, wf):
            return _compile(
                e, allow_agg=True,
                agg_filter=None if wf is None else _compile(wf))

        if not keys:
            stats = df.agg(*[agg_col(e, wf).alias(n)
                             for n, e, wf in aggs])
            keep = [col for col in df.columns
                    if col not in {n for n, _e, _w in aggs}]
            return df.select(*keep).crossJoin(F.broadcast(stats))
        for n, e, _w in keys:
            if (e != ("col", n)) or n not in df.columns:
                df = df.withColumn(n, _compile(e))
        w = Window.partitionBy(*[n for n, _e, _w in keys])
        for n, e, wf in aggs:
            df = df.withColumn(n, agg_col(e, wf).over(w))
        return df

    if cmd == "SORT":
        c = _Cursor(_tokenize(body))
        if c.done():
            raise EsqlError("SORT needs at least one sort key")
        order = []
        while not c.done():
            col = _compile(_parse_expr(c))
            asc = True
            if c.at_kw("asc", "desc"):
                asc = c.next()[1].lower() == "asc"
            nulls = None
            if c.at_kw("nulls"):
                c.next()
                nulls = c.next()[1].lower()
            if nulls == "first":
                col = col.asc_nulls_first() if asc else col.desc_nulls_first()
            elif nulls == "last":
                col = col.asc_nulls_last() if asc else col.desc_nulls_last()
            else:
                col = col.asc() if asc else col.desc()
            order.append(col)
            if c.peek() == ("op", ","):
                c.next()
                continue
            _require_done(c, "SORT")
        return df.orderBy(*order)

    if cmd == "LIMIT":
        try:
            n = int(body.strip())
        except ValueError:
            raise EsqlError(f"LIMIT needs an integer, got {body!r}")
        if n < 0:
            raise EsqlError(f"LIMIT must be >= 0, got {n}")
        return df.limit(n)

    if cmd == "KEEP":
        pats = [p.strip() for p in body.split(",")]
        cols, seen = [], set()
        for p in pats:
            for col in df.columns:
                if fnmatch(col, p) and col not in seen:
                    seen.add(col)
                    cols.append(col)
        if not cols:
            raise EsqlError(f"KEEP matched no columns: {body!r}")
        return df.select(*cols)

    if cmd == "DROP":
        pats = [p.strip() for p in body.split(",")]
        drop = [col for col in df.columns
                if any(fnmatch(col, p) for p in pats)]
        return df.drop(*drop)

    if cmd == "RENAME":
        for clause in body.split(","):
            m = re.match(r"\s*([\w.@]+)\s+[Aa][Ss]\s+([\w.@]+)\s*$", clause)
            if not m:
                raise EsqlError(f"bad RENAME clause: {clause!r}")
            df = df.withColumnRenamed(m.group(1), m.group(2))
        return df

    if cmd == "MV_EXPAND":
        col = body.strip()
        if col not in df.columns:
            raise EsqlError(f"MV_EXPAND: no column {col!r}")
        # ES|QL: null/empty multivalue keeps its row (value null)
        return df.withColumn(col, F.explode_outer(F.col(col)))

    if cmd == "GROK":
        m = re.match(r'\s*([\w.@]+)\s+"(.*)"\s*$', body, re.S)
        if not m:
            raise EsqlError(f"bad GROK clause: {body!r}")
        from connectors_spark.functions.scalars import grok_extract
        return grok_extract(df, m.group(1), m.group(2))

    if cmd == "DISSECT":
        m = re.match(r'\s*([\w.@]+)\s+"(.*)"\s*$', body, re.S)
        if not m:
            raise EsqlError(f"bad DISSECT clause: {body!r}")
        from connectors_spark.functions.scalars import dissect_extract
        return dissect_extract(df, m.group(1), m.group(2))

    if cmd == "LOOKUP":
        # ES|QL `LOOKUP JOIN lookup_index ON field` (9.x): equality
        # join against a lookup-mode index on a SAME-NAMED field.
        # Unlike ENRICH, multiple lookup matches FAN OUT into multiple
        # result rows (the documented difference). Lookup indices are
        # bounded by construction -> broadcast left join.
        m = re.match(
            r"\s*[Jj][Oo][Ii][Nn]\s+([\w.@-]+)\s+[Oo][Nn]\s+"
            r"([\w.@]+)\s*$", body)
        if not m:
            raise EsqlError(f"bad LOOKUP JOIN clause: {body!r}")
        name, key = m.group(1), m.group(2)
        if name not in tables:
            raise EsqlError(f"unknown lookup table {name!r}")
        lk = tables[name]
        if key not in lk.columns:
            raise EsqlError(f"lookup table {name!r} has no field {key!r}")
        return df.join(F.broadcast(lk), on=key, how="left")

    if cmd == "SAMPLE":
        # ES|QL SAMPLE probability. ES draws pseudorandomly per row; we
        # make the draw a DETERMINISTIC function of row content
        # (md5 of the row's JSON -> uniform in [0,1)) so re-running a
        # program is idempotent and the oracle can replay the exact
        # draw — the same reproducibility convention as the
        # stratified_sample gate. One JVM-side map pass, no shuffle.
        try:
            p = float(body.strip())
        except ValueError:
            raise EsqlError(f"SAMPLE needs a probability, got {body!r}")
        if not 0.0 < p <= 1.0:
            raise EsqlError(f"SAMPLE probability out of (0, 1]: {p}")
        j = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        u = (F.conv(F.substring(F.md5(j), 1, 8), 16, 10).cast("double")
             / F.lit(float(16 ** 8)))
        return df.filter(u < F.lit(p))

    if cmd == "CHANGE_POINT":
        # CHANGE_POINT value [ON key] [AS type_col, pvalue_col]
        m = re.match(
            r"\s*([\w.@]+)(?:\s+[Oo][Nn]\s+([\w.@]+))?"
            r"(?:\s+[Aa][Ss]\s+([\w.@]+)\s*,\s*([\w.@]+))?\s*$", body)
        if not m:
            raise EsqlError(f"bad CHANGE_POINT clause: {body!r}")
        value, key = m.group(1), m.group(2) or "@timestamp"
        tname, pname = m.group(3) or "type", m.group(4) or "pvalue"
        for col in (value, key):
            if col not in df.columns:
                raise EsqlError(f"CHANGE_POINT: no column {col!r}")
        from connectors_spark.operators.anomaly import change_point
        return change_point(df, value, key, tname, pname)

    if cmd == "COMPLETION":
        # ES|QL 9.x: `COMPLETION [col =] prompt WITH endpoint`. The
        # prompt is any string expression; the endpoint is a registered
        # inference function (operators/inference.py) — Arrow-batched
        # mapInPandas, the one legitimately-Python stage.
        c = _Cursor(_tokenize(body))
        out_name = "completion"
        if (c.peek()[0] == "ident"
                and c.peek()[1].lower() not in ("true", "false", "null",
                                                "not")
                and c.peek(1) == ("op", "=")):
            out_name = c.next()[1]
            c.next()
        prompt = _parse_expr(c)
        if not c.at_kw("with"):
            raise EsqlError("COMPLETION needs `WITH <endpoint>`")
        c.next()
        k, endpoint = c.next()
        if k != "ident":
            raise EsqlError(f"bad COMPLETION endpoint: {endpoint!r}")
        _require_done(c, "COMPLETION")
        from connectors_spark.operators.inference import complete
        try:
            return complete(
                df.withColumn("_prompt", _compile(prompt)),
                "_prompt", endpoint, out_name,
            ).drop("_prompt")
        except ValueError as e:
            raise EsqlError(str(e))

    if cmd == "RERANK":
        # ES|QL 9.x: `RERANK [col =] "query" ON field WITH endpoint`.
        # Emits scores (ordering composes with SORT/LIMIT, as in ES|QL).
        c = _Cursor(_tokenize(body))
        out_name = "_score"
        if (c.peek()[0] == "ident"
                and c.peek()[1].lower() not in ("true", "false", "null",
                                                "not")
                and c.peek(1) == ("op", "=")):
            out_name = c.next()[1]
            c.next()
        k, qtext = c.next()
        if k != "str":
            raise EsqlError("RERANK needs a quoted query string")
        if not c.at_kw("on"):
            raise EsqlError("RERANK needs `ON <field>`")
        c.next()
        kf, field = c.next()
        if kf != "ident" or field not in df.columns:
            raise EsqlError(f"RERANK: no column {field!r}")
        if not c.at_kw("with"):
            raise EsqlError("RERANK needs `WITH <endpoint>`")
        c.next()
        ke, endpoint = c.next()
        if ke != "ident":
            raise EsqlError(f"bad RERANK endpoint: {endpoint!r}")
        _require_done(c, "RERANK")
        from connectors_spark.operators.inference import rerank
        try:
            return rerank(df, qtext, field, endpoint, out_name)
        except ValueError as e:
            raise EsqlError(str(e))

    if cmd == "FORK":
        # ES|QL FORK (branch) (branch) ...: run each parenthesized
        # sub-pipeline against the SAME input frame, tag rows with
        # _fork = "fork1".., union the branches (missing columns null).
        # The input plan is shared lazily; Spark's AQE reuses the
        # common scan across branches.
        branches = _split_fork_branches(body)
        if not 2 <= len(branches) <= 8:   # ES's documented branch cap
            raise EsqlError("FORK takes 2..8 parenthesized branches")
        outs = []
        for i, br in enumerate(branches, 1):
            b = df
            for seg in _split_pipes(br):
                c2, body2 = _cmd_split(seg)
                b = _apply_command(b, c2, body2, policies, tables)
            outs.append(b.withColumn("_fork", F.lit(f"fork{i}")))
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o, allowMissingColumns=True)
        return out

    if cmd == "ENRICH":
        m = re.match(
            r"\s*([\w.@-]+)\s+[Oo][Nn]\s+([\w.@]+)"
            r"(?:\s+[Ww][Ii][Tt][Hh]\s+(.*))?\s*$", body)
        if not m:
            raise EsqlError(f"bad ENRICH clause: {body!r}")
        name, key, with_cols = m.group(1), m.group(2), m.group(3)
        if name not in policies:
            raise EsqlError(f"unknown enrich policy {name!r}")
        policy, match_col = policies[name]
        if isinstance(match_col, tuple) and match_col[0] == "range":
            # ES range-type enrich policy (ip_range / numeric range
            # lookup indices): the input value falls inside a policy
            # row's [lo, hi) interval. Range enrich indices are
            # non-overlapping by construction in ES; the policy table
            # is bounded -> validate that invariant outright (driver-
            # side over the broadcast-sized frame), then a broadcast
            # range join needs no dedup pass.
            _kind, lo_col, hi_col = match_col
            fields = ([f.strip() for f in with_cols.split(",")]
                      if with_cols else
                      [c2 for c2 in policy.columns
                       if c2 not in (lo_col, hi_col)])
            spans = sorted(
                (r[0], r[1])
                for r in policy.select(lo_col, hi_col).collect())
            for (alo, ahi), (blo, _bhi) in zip(spans, spans[1:]):
                if blo < ahi:
                    raise EsqlError(
                        f"enrich policy {name!r} has overlapping ranges "
                        f"[{alo}, {ahi}) and [{blo}, ...)")
            small = policy.select(
                F.col(lo_col).alias("__esql_lo"),
                F.col(hi_col).alias("__esql_hi"), *fields)
            out = df.join(
                F.broadcast(small),
                (df[key] >= small["__esql_lo"])
                & (df[key] < small["__esql_hi"]), "left")
            return out.drop("__esql_lo", "__esql_hi")
        fields = ([f.strip() for f in with_cols.split(",")] if with_cols
                  else [c2 for c2 in policy.columns if c2 != match_col])
        # ES enrich-index execution keeps one document per match key; a
        # duplicate-keyed policy frame here keeps the lexicographically
        # SMALLEST (fields...) row — deterministic across runs and
        # partitionings, unlike dropDuplicates (ADVICE r4).
        small = (
            policy.select(F.col(match_col).alias("__esql_match"), *fields)
            .groupBy("__esql_match")
            .agg(F.min(F.struct(*[F.col(f2) for f2 in fields]))
                 .alias("__esql_row"))
            .select("__esql_match",
                    *[F.col(f"__esql_row.{f2}").alias(f2) for f2 in fields])
        )
        out = df.join(F.broadcast(small),
                      df[key] == small["__esql_match"], "left")
        return out.drop("__esql_match")

    raise EsqlError(f"unknown command {cmd}")
