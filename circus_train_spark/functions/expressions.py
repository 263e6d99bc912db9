"""Dynamic filter expressions — the SpEL constant-folding layer.

Circus Train lets partition filters embed dynamically-evaluated date
fragments: ``local_date >= '#{#nowUtc().minusDays(3).toString("yyyy-MM-dd")}'``
(``core/SpelParsedPartitionPredicate.java:38-52``; helper functions
``core/conf/ExpressionParserFunctions.java``; syntax ``README.md:248-266``).
The expression is folded to a literal ONCE, before planning — Catalyst then
sees a constant predicate (its own ConstantFolding takes it from there).

This module re-expresses that layer in Python: every ``#{...}`` block inside
a filter string is evaluated against a small namespace mirroring the
reference's root-context helpers —

- ``nowUtc() / nowEuropeLondon() / nowAmericaLosAngeles() / nowInZone(z)``
  → a Joda-``DateTime``-like object supporting ``plus/minus
  Days|Hours|Minutes|Weeks|Months|Years``, ``withTimeAtStartOfDay()`` and
  ``toString(joda_pattern)``;
- ``zeroPadLeft(value, width)``.

Trust model: identical to the reference — filter expressions come from the
operator's own job spec (the reference evaluates arbitrary SpEL/Java from
the same place); evaluation runs with no builtins and only these helpers in
scope.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

try:
    from zoneinfo import ZoneInfo
except ImportError:  # pragma: no cover
    ZoneInfo = None  # type: ignore[assignment]

_BLOCK = re.compile(r"#\{(.*?)\}", re.DOTALL)
# Joda pattern → strftime (longest tokens first)
_JODA = [
    ("yyyy", "%Y"),
    ("yy", "%y"),
    ("MM", "%m"),
    ("dd", "%d"),
    ("HH", "%H"),
    ("mm", "%M"),
    ("ss", "%S"),
]


def _strftime_pattern(joda: str) -> str:
    out = joda
    for a, b in _JODA:
        out = out.replace(a, b)
    return out


class DateTimeExpr:
    """Joda-``DateTime``-ish immutable wrapper used inside ``#{...}``."""

    def __init__(self, dt: datetime):
        self._dt = dt

    # -- arithmetic (each returns a new object, like Joda) ----------------
    def plusDays(self, n: int) -> "DateTimeExpr":
        return DateTimeExpr(self._dt + timedelta(days=n))

    def minusDays(self, n: int) -> "DateTimeExpr":
        return self.plusDays(-n)

    def plusHours(self, n: int) -> "DateTimeExpr":
        return DateTimeExpr(self._dt + timedelta(hours=n))

    def minusHours(self, n: int) -> "DateTimeExpr":
        return self.plusHours(-n)

    def plusMinutes(self, n: int) -> "DateTimeExpr":
        return DateTimeExpr(self._dt + timedelta(minutes=n))

    def minusMinutes(self, n: int) -> "DateTimeExpr":
        return self.plusMinutes(-n)

    def plusWeeks(self, n: int) -> "DateTimeExpr":
        return DateTimeExpr(self._dt + timedelta(weeks=n))

    def minusWeeks(self, n: int) -> "DateTimeExpr":
        return self.plusWeeks(-n)

    def plusMonths(self, n: int) -> "DateTimeExpr":
        y, m = divmod(self._dt.year * 12 + (self._dt.month - 1) + n, 12)
        # clamp the day like Joda does (Jan 31 plusMonths(1) -> Feb 28/29)
        day = min(self._dt.day, _days_in_month(y, m + 1))
        return DateTimeExpr(self._dt.replace(year=y, month=m + 1, day=day))

    def minusMonths(self, n: int) -> "DateTimeExpr":
        return self.plusMonths(-n)

    def plusYears(self, n: int) -> "DateTimeExpr":
        return self.plusMonths(12 * n)

    def minusYears(self, n: int) -> "DateTimeExpr":
        return self.plusYears(-n)

    def withTimeAtStartOfDay(self) -> "DateTimeExpr":
        return DateTimeExpr(
            self._dt.replace(hour=0, minute=0, second=0, microsecond=0)
        )

    # -- accessors --------------------------------------------------------
    def getYear(self) -> int:
        return self._dt.year

    def getMonthOfYear(self) -> int:
        return self._dt.month

    def getDayOfMonth(self) -> int:
        return self._dt.day

    def getHourOfDay(self) -> int:
        return self._dt.hour

    # -- rendering --------------------------------------------------------
    def toString(self, pattern: str | None = None) -> str:
        if pattern is None:
            return self._dt.isoformat()
        return self._dt.strftime(_strftime_pattern(pattern))

    def __str__(self) -> str:  # bare #{#nowUtc()} renders ISO, like Joda
        return self.toString()


def _days_in_month(year: int, month: int) -> int:
    nxt = datetime(year + (month == 12), month % 12 + 1, 1)
    return (nxt - timedelta(days=1)).day


def zeroPadLeft(value, width: int) -> str:
    """``ExpressionParserFunctions.zeroPadLeft`` — int or string input."""
    return str(value).rjust(width, "0")


def _make_namespace(now: datetime | None):
    base = now or datetime.now(timezone.utc)

    def nowInZone(zone: str) -> DateTimeExpr:
        if now is not None:  # pinned clock (tests): zone shift not applied
            return DateTimeExpr(base)
        if ZoneInfo is None:  # pragma: no cover
            raise RuntimeError("zoneinfo unavailable; use nowUtc()")
        return DateTimeExpr(datetime.now(ZoneInfo(zone)))

    ns = {
        "nowUtc": lambda: DateTimeExpr(base),
        "nowEuropeLondon": lambda: nowInZone("Europe/London"),
        "nowAmericaLosAngeles": lambda: nowInZone("America/Los_Angeles"),
        "nowInZone": nowInZone,
        "zeroPadLeft": zeroPadLeft,
    }
    return ns


def resolve_expressions(text: str, now: datetime | None = None) -> str:
    """Fold every ``#{...}`` block in ``text`` to its literal value.

    ``now`` pins the clock for deterministic tests. SpEL's root-context
    references (``#nowUtc()``) drop their ``#`` prefix before evaluation.
    """
    if "#{" not in text:
        return text
    ns = _make_namespace(now)

    def _eval(match: re.Match) -> str:
        expr = match.group(1).strip()
        expr = re.sub(r"#(?=[A-Za-z_])", "", expr)  # '#nowUtc()' -> 'nowUtc()'
        value = eval(expr, {"__builtins__": {}}, ns)  # noqa: S307 — job-spec trust model, empty builtins
        return str(value)

    return _BLOCK.sub(_eval, text)
