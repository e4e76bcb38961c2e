"""Quartz-cron next-run computation (driver-side scheduling, C8).

Mirrors the reference's scheduler math (reference:
app/connectors_service/connectors/utils.py:43-70 next_run — Quartz
6/7-field expressions: sec min hour day-of-month month day-of-week
[year]). Supports *, ?, lists, ranges and steps; resolution one second
like Quartz, evaluated by minute-scan (scheduling poll is 30 s in the
reference, app/connectors_service/connectors/config.py:104 — scan cost
is irrelevant at that cadence).
"""

from __future__ import annotations

from datetime import datetime, timedelta

_FIELDS = ["second", "minute", "hour", "dom", "month", "dow"]
_RANGES = {
    "second": (0, 59), "minute": (0, 59), "hour": (0, 23),
    "dom": (1, 31), "month": (1, 12), "dow": (1, 7),  # quartz: 1=SUN..7=SAT
}
_MONTH_NAMES = {m: i + 1 for i, m in enumerate(
    "JAN FEB MAR APR MAY JUN JUL AUG SEP OCT NOV DEC".split())}
_DOW_NAMES = {d: i + 1 for i, d in enumerate(
    "SUN MON TUE WED THU FRI SAT".split())}


class CronError(ValueError):
    pass


def _parse_field(spec: str, field: str) -> set[int] | None:
    lo, hi = _RANGES[field]
    spec = spec.upper()
    for name, val in {**_MONTH_NAMES, **_DOW_NAMES}.items():
        if field in ("month", "dow"):
            spec = spec.replace(name, str(val))
    if spec in ("*", "?"):
        return None  # any
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        had_step = "/" in part  # per-part, NOT the whole spec: '5,10/20' = {5} ∪ {10,30,50}
        if had_step:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = int(part)
            b = hi if had_step else a
        if not (lo <= a <= hi and lo <= b <= hi):
            raise CronError(f"{field} value out of range: {part}")
        out.update(range(a, b + 1, step))
    return out


def parse_quartz(expr: str) -> dict:
    parts = expr.split()
    if len(parts) == 7:
        parts = parts[:6]  # ignore year field
    if len(parts) != 6:
        raise CronError(f"expected 6/7 fields, got {len(parts)}: {expr!r}")
    return {f: _parse_field(s, f) for f, s in zip(_FIELDS, parts)}


def next_run(expr: str, after: datetime) -> datetime:
    """First fire time strictly after `after` (second resolution)."""
    spec = parse_quartz(expr)
    t = after.replace(microsecond=0) + timedelta(seconds=1)
    # seconds field usually a literal; scan seconds only within match min
    limit = after + timedelta(days=4 * 366)
    while t < limit:
        if spec["month"] is not None and t.month not in spec["month"]:
            t = (t.replace(day=1, hour=0, minute=0, second=0)
                 + timedelta(days=32)).replace(day=1)
            continue
        quartz_dow = (t.weekday() + 2) % 7 or 7  # Mon=0 -> quartz 2; Sun -> 1
        if (spec["dom"] is not None and t.day not in spec["dom"]) or (
            spec["dow"] is not None and quartz_dow not in spec["dow"]
        ):
            t = t.replace(hour=0, minute=0, second=0) + timedelta(days=1)
            continue
        if spec["hour"] is not None and t.hour not in spec["hour"]:
            t = t.replace(minute=0, second=0) + timedelta(hours=1)
            continue
        if spec["minute"] is not None and t.minute not in spec["minute"]:
            t = t.replace(second=0) + timedelta(minutes=1)
            continue
        if spec["second"] is not None and t.second not in spec["second"]:
            t = t + timedelta(seconds=1)
            continue
        return t
    raise CronError(f"no fire time within 4 years for {expr!r}")
