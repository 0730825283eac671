"""Flink-SQL → Spark-SQL expression-level dialect adaptation.

Flink SQL is lenient in string↔time conversions: its
``UNIX_TIMESTAMP(string)`` parses ``yyyy-MM-dd HH:mm:ss`` and ignores
trailing unparsed text (which is why the reference demo's
``unix_timestamp(cast(row_time as string))`` works on a TIMESTAMP(3)
value, ``test.sql:55,60``). Spark 4 under ANSI mode throws
``CANNOT_PARSE_TIMESTAMP`` on the fractional suffix instead.

``adapt_sql`` closes the gaps we know about at the string level:

- single-argument ``unix_timestamp(X)`` → ``unix_timestamp(
  try_to_timestamp(X))``: ``try_to_timestamp`` parses fractional
  seconds natively and passes real timestamps through, so the rewrite
  is value-preserving for both string and timestamp inputs while
  restoring Flink's tolerance;
- ``timestamp(3)`` / ``timestamp(n)`` type references in CAST targets →
  ``timestamp`` (Spark has a single µs-precision timestamp type);
- ``proctime()`` → ``current_timestamp()``.

Statements pass through this before reaching ``spark.sql``.
"""

from __future__ import annotations

import re

_UNIX_TS_RE = re.compile(r"\bunix_timestamp\s*\(", re.IGNORECASE)
_CAST_TS3_RE = re.compile(r"\bas\s+timestamp\s*\(\s*\d\s*\)", re.IGNORECASE)
_PROCTIME_RE = re.compile(r"\bproctime\s*\(\s*\)", re.IGNORECASE)


def _find_args_span(sql: str, open_paren: int) -> tuple[int, list[int]]:
    """From the index of ``(``, return (index of matching ``)``,
    positions of top-level commas). Quote- and paren-aware."""
    depth = 1
    in_quote = False
    commas: list[int] = []
    i = open_paren + 1
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return i, commas
            elif ch == "," and depth == 1:
                commas.append(i)
        i += 1
    return -1, commas


def _rewrite_unix_timestamp(sql: str) -> str:
    out: list[str] = []
    pos = 0
    while True:
        m = _UNIX_TS_RE.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            break
        close, commas = _find_args_span(sql, m.end() - 1)
        if close < 0:
            out.append(sql[pos:])
            break
        arg = sql[m.end() : close]
        out.append(sql[pos : m.start()])
        if commas or not arg.strip():
            # 0-arg (now) or 2-arg (explicit format): Flink/Spark agree
            out.append(sql[m.start() : close + 1])
        else:
            inner = _rewrite_unix_timestamp(arg)
            out.append(f"unix_timestamp(try_to_timestamp({inner}))")
        pos = close + 1
    return "".join(out)


def adapt_sql(sql: str) -> str:
    """Apply every known Flink→Spark expression rewrite."""
    sql = _rewrite_unix_timestamp(sql)
    sql = _CAST_TS3_RE.sub("as timestamp", sql)
    sql = _PROCTIME_RE.sub("current_timestamp()", sql)
    return sql
