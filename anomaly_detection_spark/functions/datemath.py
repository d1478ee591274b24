"""OpenSearch date-math expressions (``now-1d/d``,
``2025-06-01||+1M/M`` …) → epoch millis.

Published grammar (DateMathParser): an anchor — ``now`` or an ISO
date/datetime followed by ``||`` — then any number of
``±N<unit>`` adjustments and at most one trailing ``/<unit>``
rounding (round DOWN to the unit start; range-query upper bounds
round up in OpenSearch, which callers express by rounding down and
using half-open ``lt`` — the engine's range semantics are already
half-open).  Units: y M w d h H m s.

``now`` is pinned per request in the reference; here callers pass
``now_ms`` (tests inject it; the planner captures one wall-clock
value per ``compile_filter`` call so every clause in one query sees
the same ``now``).  All arithmetic is calendar-correct (months/years
via ``datetime``), UTC — the session timezone is pinned UTC."""

from __future__ import annotations

import re
import time
from datetime import datetime, timedelta, timezone

_ADJ = re.compile(r"([+-])(\d+)([yMwdhHms])")
_ROUND = re.compile(r"/([yMwdhHms])$")

_ISO_FORMATS = ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S",
                "%Y-%m-%dT%H:%M", "%Y-%m-%d %H:%M:%S",
                "%Y-%m-%d", "%Y-%m", "%Y")


def is_date_math(v) -> bool:
    return isinstance(v, str) and (v == "now" or v.startswith("now+")
                                   or v.startswith("now-")
                                   or v.startswith("now/")
                                   or "||" in v)


def _parse_anchor(s: str) -> datetime:
    for fmt in _ISO_FORMATS:
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    raise ValueError(f"unparseable date-math anchor {s!r}")


def _add_months(dt: datetime, n: int) -> datetime:
    y, m = divmod(dt.year * 12 + (dt.month - 1) + n, 12)
    # clamp the day like the reference (Jan 31 + 1M = Feb 28/29)
    import calendar

    d = min(dt.day, calendar.monthrange(y, m + 1)[1])
    return dt.replace(year=y, month=m + 1, day=d)


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "w":
        start = dt - timedelta(days=dt.weekday())  # ISO Monday
        return start.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    return dt.replace(microsecond=0)  # s


def datemath_ms(expr: str, now_ms: int | None = None) -> int:
    """Evaluate one date-math expression to epoch millis (UTC)."""
    if expr.startswith("now"):
        base_ms = int(time.time() * 1000) if now_ms is None else now_ms
        dt = datetime.fromtimestamp(base_ms / 1000.0, tz=timezone.utc)
        rest = expr[3:]
    else:
        anchor, sep, rest = expr.partition("||")
        if not sep:
            raise ValueError(
                f"date-math needs 'now' or '<date>||': {expr!r}")
        dt = _parse_anchor(anchor)
    rnd = None
    m = _ROUND.search(rest)
    if m:
        rnd = m.group(1)
        rest = rest[:m.start()]
    pos = 0
    for m in _ADJ.finditer(rest):
        if m.start() != pos:
            break
        sign = 1 if m.group(1) == "+" else -1
        n = sign * int(m.group(2))
        u = m.group(3)
        if u == "y":
            dt = _add_months(dt, 12 * n)
        elif u == "M":
            dt = _add_months(dt, n)
        else:
            dt = dt + timedelta(**{
                {"w": "weeks", "d": "days", "h": "hours", "H": "hours",
                 "m": "minutes", "s": "seconds"}[u]: n})
        pos = m.end()
    if pos != len(rest):
        raise ValueError(
            f"unparseable date-math adjustments {rest[pos:]!r} in "
            f"{expr!r}")
    if rnd:
        dt = _round_down(dt, rnd)
    return int(dt.timestamp() * 1000)


# one `now` per request (the reference pins `now` for the whole
# request context): compile_filter pins on entry, nested clauses read
import contextlib
import contextvars

_PINNED_NOW: contextvars.ContextVar[int | None] = \
    contextvars.ContextVar("datemath_now_ms", default=None)


@contextlib.contextmanager
def pin_now(now_ms: int | None = None):
    """Pin `now` for every date-math evaluation in scope (idempotent:
    an outer pin wins, so nested compile_filter calls share one)."""
    if _PINNED_NOW.get() is not None:
        yield _PINNED_NOW.get()
        return
    v = int(time.time() * 1000) if now_ms is None else int(now_ms)
    tok = _PINNED_NOW.set(v)
    try:
        yield v
    finally:
        _PINNED_NOW.reset(tok)


def pinned_now_ms() -> int | None:
    return _PINNED_NOW.get()
