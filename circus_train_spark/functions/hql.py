"""HQL/SQL view-text table-name rewriting.

The reference replicates Hive VIEWs by rewriting the stored HQL so every
source ``db.table`` reference points at its replica counterpart
(``circus-train-hive-view/.../HqlTranslator.java:79-106``), substituting
four textual forms per mapping — unescaped qualified name, unescaped
``table.`` reference (which also rewrites column qualifiers), and the two
backtick-escaped variants (``TableTranslation.java:22-42``) — each
case-insensitively, in that order. ``translate_hql`` is the parity
function: the reference's own translator test vectors pass verbatim
(``HqlTranslatorTest.java:92-130``, mirrored in ``tests/test_views.py``).

It is pure driver-side string work over metadata (never row data), so
there is nothing to distribute; execution of a translated view is plain
``spark.sql`` over temp-view bindings (``operators/views.py``).
"""

from __future__ import annotations

import re

__all__ = ["translate_hql"]


def _sub(hql: str, literal: str, replacement: str) -> str:
    # Java: replaceAll("(?i)" + form.replace(".", "\\."), replacement).
    # re.escape subsumes the reference's dot-escaping; a callable
    # replacement keeps backslashes/group refs in names inert.
    return re.sub(re.escape(literal), lambda _m: replacement, hql, flags=re.IGNORECASE)


def translate_hql(
    hql: str,
    mappings: dict[str, str],
    *,
    require_qualified: bool = True,
) -> str:
    """Rewrite every mapped table reference in ``hql``.

    ``mappings`` maps ``"src_db.src_table" -> "dst_db.dst_table"``. Both
    sides must be two-part qualified names (the reference raises on
    anything else, ``HqlTranslator.java:47-55``); pass
    ``require_qualified=False`` to allow a single-part destination — used
    internally to bind qualified names onto Spark temp views, which are
    single-part by definition.
    """
    for src, dst in mappings.items():
        s = src.split(".")
        d = dst.split(".")
        if len(s) != 2 or not all(s):
            raise ValueError(f"original table name must be qualified: {src!r}")
        if require_qualified and len(d) != 2:
            raise ValueError(f"translated table name must be qualified: {dst!r}")
        if len(d) not in (1, 2) or not all(d):
            raise ValueError(f"bad translated table name: {dst!r}")
        sdb, stbl = s
        dtbl = d[-1]
        dst_qualified = dst
        dst_escaped = ".".join(f"`{part}`" for part in d)
        # the reference's four substitutions, same order
        hql = _sub(hql, f"{sdb}.{stbl}", dst_qualified)
        hql = _sub(hql, f"{stbl}.", f"{dtbl}.")
        hql = _sub(hql, f"`{sdb}`.`{stbl}`", dst_escaped)
        hql = _sub(hql, f"`{stbl}`.", f"`{dtbl}`.")
    return hql
