"""Python-whitespace-exact string helpers.

The reference trims and blank-detects with *Python* semantics —
``str.strip()`` (app/utils.py:18-22) and ``re \\s`` (app/app.py:36) — which
cover the full unicode whitespace set (tab, newline, NBSP, ideographic
space, …). Spark's ``trim`` strips ONLY ascii space 0x20 and Java's ``\\s``
is ascii-only by default, so a tab-padded or NBSP-padded field would hash
or validate differently from the reference. These helpers pin the exact
Python set (every codepoint where ``str.isspace()`` is true).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# chr(c).isspace() for all unicode — Java regex syntax (for Spark rlike /
# regexp_replace) and RE2 syntax (for DuckDB oracle SQL twins)
_PY_WS_JAVA = (
    "\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000"
)
PY_WS_CLASS_JAVA = f"[{_PY_WS_JAVA}]"
PY_BLANK_RE_JAVA = f"^{PY_WS_CLASS_JAVA}*$"

_PY_WS_RE2 = (
    "\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}\\x{2000}-\\x{200A}"
    "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}"
)
PY_WS_CLASS_RE2 = f"[{_PY_WS_RE2}]"
PY_BLANK_RE_RE2 = f"^{PY_WS_CLASS_RE2}*$"


def py_strip(col: Column | str) -> Column:
    """``str.strip()``-exact trim (unicode whitespace, both ends)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        c, f"^{PY_WS_CLASS_JAVA}+|{PY_WS_CLASS_JAVA}+$", ""
    )
