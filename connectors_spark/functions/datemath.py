"""ES date-math expression parser: ``now-7d/d``, ``2024-01-01||+1M/d``.

Public Elasticsearch semantics (every range query / index-name date
math runs through this grammar): an anchor — ``now`` or an ISO
date(/time) followed by ``||`` — then a sequence of adjustments:
``+N<unit>`` / ``-N<unit>`` arithmetic and ``/<unit>`` rounding
(round DOWN to the unit; ES rounds down for ``gte``/``lt`` style use,
and week rounding lands on Monday). Units: y M w d h H m s (``M`` =
month, ``m`` = minute, ``H``==``h``).

Driver-side on purpose: date-math strings are query constants; the
resolved datetime becomes a pushable Catalyst literal. ``now`` must be
passed explicitly by callers that need determinism (gates/tests pin
it)."""

from __future__ import annotations

import re
from datetime import datetime, timedelta

_ADJ = re.compile(r"([+-]\d+[yMwdhHms])|(/[yMwdhHms])")
_ANCHOR_FORMATS = (
    "%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H:%M",
    "%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y-%m", "%Y",
)


class DateMathError(ValueError):
    pass


def _add_months(dt: datetime, n: int) -> datetime:
    """Calendar month arithmetic, day clamped to the target month's
    length (ES/Joda behavior: Jan 31 + 1M = Feb 28/29)."""
    y, m = divmod(dt.year * 12 + (dt.month - 1) + n, 12)
    m += 1
    last = [31, 29 if y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
            else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m - 1]
    return dt.replace(year=y, month=m, day=min(dt.day, last))


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "w":  # ES rounds weeks to Monday
        base = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        return base - timedelta(days=base.weekday())
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    return dt.replace(microsecond=0)  # s


def _shift(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "y":
        return _add_months(dt, 12 * n)
    if unit == "M":
        return _add_months(dt, n)
    deltas = {"w": timedelta(weeks=1), "d": timedelta(days=1),
              "h": timedelta(hours=1), "H": timedelta(hours=1),
              "m": timedelta(minutes=1), "s": timedelta(seconds=1)}
    return dt + n * deltas[unit]


def parse_date_math(expr: str, now: datetime | None = None) -> datetime:
    """Resolve an ES date-math expression to a datetime."""
    expr = (expr or "").strip()
    if not expr:
        raise DateMathError("empty date-math expression")
    if expr.startswith("now"):
        if now is None:
            now = datetime.utcnow()
        anchor, rest = now, expr[3:]
    else:
        if "||" in expr:
            raw, rest = expr.split("||", 1)
        else:
            raw, rest = expr, ""
        anchor = None
        for fmt in _ANCHOR_FORMATS:
            try:
                anchor = datetime.strptime(raw, fmt)
                break
            except ValueError:
                continue
        if anchor is None:
            raise DateMathError(f"unparseable date-math anchor {raw!r}")
    pos = 0
    for m in _ADJ.finditer(rest):
        if m.start() != pos:
            raise DateMathError(
                f"bad date-math adjustment at {rest[pos:]!r}")
        tok = m.group(0)
        if tok.startswith("/"):
            anchor = _round_down(anchor, tok[1])
        else:
            anchor = _shift(anchor, int(tok[:-1]), tok[-1])
        pos = m.end()
    if pos != len(rest):
        raise DateMathError(f"trailing junk in date-math: {rest[pos:]!r}")
    return anchor
