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

import ast
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


class ExpressionError(ValueError):
    """A ``#{...}`` block used syntax outside the whitelisted subset."""


def _safe_eval(expr: str, ns: dict):
    """AST-whitelisted evaluator: calls, attribute chains, names from the
    helper namespace, and (possibly negated) literal constants — nothing
    else. Not ``eval``: there is no route to builtins, comprehensions,
    subscripts, lambdas, or dunder traversal (``().__class__``-style chains
    die on both the Tuple node and the underscore-attribute check)."""
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as e:
        raise ExpressionError(f"bad filter expression {expr!r}: {e}") from e

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (str, int, float, bool)) or node.value is None:
                return node.value
            raise ExpressionError(f"literal {node.value!r} not allowed")
        if isinstance(node, ast.Name):
            if node.id.startswith("_") or node.id not in ns:
                raise ExpressionError(f"unknown name {node.id!r}")
            return ns[node.id]
        if isinstance(node, ast.Attribute):
            if node.attr.startswith("_"):
                raise ExpressionError(f"attribute {node.attr!r} not allowed")
            return getattr(ev(node.value), node.attr)
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            v = ev(node.operand)
            if not isinstance(v, (int, float)):
                raise ExpressionError("unary minus only on numbers")
            return -v
        if isinstance(node, ast.Call):
            func = ev(node.func)
            args = [ev(a) for a in node.args]
            kwargs = {}
            for k in node.keywords:
                if k.arg is None or k.arg.startswith("_"):
                    raise ExpressionError("**kwargs / private keywords not allowed")
                kwargs[k.arg] = ev(k.value)
            return func(*args, **kwargs)
        raise ExpressionError(
            f"syntax {type(node).__name__} not allowed in filter expressions"
        )

    return ev(tree)


def resolve_expressions(text: str, now: datetime | None = None) -> str:
    """Fold every ``#{...}`` block in ``text`` to its literal value.

    ``now`` pins the clock for deterministic tests. SpEL's root-context
    references (``#nowUtc()``) drop their ``#`` prefix before evaluation.
    Evaluation is an AST-whitelisted walk (see ``_safe_eval``), so a filter
    string can only call the documented helper namespace.
    """
    if "#{" not in text:
        return text
    ns = _make_namespace(now)

    def _eval(match: re.Match) -> str:
        expr = match.group(1).strip()
        expr = re.sub(r"#(?=[A-Za-z_])", "", expr)  # '#nowUtc()' -> 'nowUtc()'
        return str(_safe_eval(expr, ns))

    return _BLOCK.sub(_eval, text)
