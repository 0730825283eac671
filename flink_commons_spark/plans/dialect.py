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
- ``proctime()`` → ``current_timestamp()``;
- Flink legacy **group windows** → Spark time windows:
  ``TUMBLE(ts, INTERVAL '1' MINUTE)`` → ``window(ts, '1 minutes')``,
  ``HOP(ts, slide, size)`` → ``window(ts, size, slide)`` (note the
  argument swap: Spark is (col, windowDuration, slideDuration)),
  ``SESSION(ts, gap)`` → ``session_window(ts, gap)``, and the
  ``*_START`` / ``*_END`` accessors → ``window.start`` /
  ``window.end`` (``session_window.start/end`` for SESSION);
- **temporal table joins**: ``JOIN dim FOR SYSTEM_TIME AS OF
  l.proctime`` → plain join. Flink's processing-time temporal join
  reads the dim's CURRENT version per record; in Spark the dim scan at
  query (micro-batch) time IS the current snapshot, so stripping the
  clause preserves the semantics at batch granularity (per-microbatch
  instead of per-record — the standard Spark equivalence). Event-time
  versioned joins are the as-of operator
  (``flink_commons_spark.operators.asof``).

Statements pass through this before reaching ``spark.sql``.
"""

from __future__ import annotations

import logging
import re

log = logging.getLogger(__name__)

_UNIX_TS_RE = re.compile(r"\bunix_timestamp\s*\(", re.IGNORECASE)
_CAST_TS3_RE = re.compile(r"\bas\s+timestamp\s*\(\s*\d\s*\)", re.IGNORECASE)
_PROCTIME_RE = re.compile(r"\bproctime\s*\(\s*\)", re.IGNORECASE)
_INTERVAL_RE = re.compile(
    r"^\s*INTERVAL\s+'(?P<n>\d+)'\s+(?P<unit>SECOND|MINUTE|HOUR|DAY)S?\s*$",
    re.IGNORECASE,
)
_GROUP_WINDOW_RE = re.compile(
    r"\b(?P<fn>TUMBLE|HOP|SESSION)(?P<suffix>_START|_END)?\s*\(", re.IGNORECASE
)
_SYSTEM_TIME_RE = re.compile(
    r"\bFOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?:`?\w+`?\.)?`?\w+`?(?:\s*\(\s*\))?",
    re.IGNORECASE,
)
# Flink dynamic-table-options hint (`table.dynamic-table-options.enabled`,
# the reference's test.sql:10): per-query option overrides. Spark binds
# connector options at DDL registration and its parser rejects the hint
# outright — strip it (with a warning) so the query still runs with the
# DDL-time options.
_OPTIONS_HINT_RE = re.compile(
    r"/\*\+\s*OPTIONS\s*\(\s*'[^']*'\s*=\s*'[^']*'"
    r"(?:\s*,\s*'[^']*'\s*=\s*'[^']*')*\s*\)\s*\*/",
    re.IGNORECASE,
)


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


def _interval_to_duration(expr: str) -> str | None:
    """``INTERVAL '5' MINUTE`` → ``'5 minutes'`` (None if not a simple
    single-unit interval literal)."""
    m = _INTERVAL_RE.match(expr)
    if not m:
        return None
    return f"'{m.group('n')} {m.group('unit').lower()}s'"


def _rewrite_group_windows(sql: str) -> str:
    """Flink TUMBLE/HOP/SESSION group windows → Spark window functions."""
    out: list[str] = []
    pos = 0
    while True:
        m = _GROUP_WINDOW_RE.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            break
        close, commas = _find_args_span(sql, m.end() - 1)
        if close < 0:
            out.append(sql[pos:])
            break
        args_text = sql[m.end() : close]
        bounds = [m.end()] + [c + 1 for c in commas] + [close + 1]
        args = [sql[bounds[i] : bounds[i + 1] - 1].strip() for i in range(len(bounds) - 1)]
        fn = m.group("fn").upper()
        suffix = (m.group("suffix") or "").upper()
        out.append(sql[pos : m.start()])
        replacement = None
        if fn in ("TUMBLE", "SESSION") and len(args) == 2:
            dur = _interval_to_duration(args[1])
            if dur:
                target = "window" if fn == "TUMBLE" else "session_window"
                if suffix:
                    replacement = f"{target}.{'start' if suffix == '_START' else 'end'}"
                else:
                    replacement = f"{target}({_rewrite_group_windows(args[0])}, {dur})"
        elif fn == "HOP" and len(args) == 3:
            slide = _interval_to_duration(args[1])
            size = _interval_to_duration(args[2])
            if slide and size:
                if suffix:
                    replacement = f"window.{'start' if suffix == '_START' else 'end'}"
                else:
                    # Flink: HOP(ts, slide, size); Spark: window(ts, size, slide)
                    replacement = f"window({_rewrite_group_windows(args[0])}, {size}, {slide})"
        if replacement is None:
            out.append(sql[m.start() : close + 1])  # leave unknown shapes as-is
        else:
            out.append(replacement)
        pos = close + 1
    return "".join(out)


def adapt_sql(sql: str) -> str:
    """Apply every known Flink→Spark expression rewrite."""
    sql = _rewrite_unix_timestamp(sql)
    sql = _CAST_TS3_RE.sub("as timestamp", sql)
    sql = _PROCTIME_RE.sub("current_timestamp()", sql)
    sql = _rewrite_group_windows(sql)
    sql = _SYSTEM_TIME_RE.sub("", sql)
    if _OPTIONS_HINT_RE.search(sql):
        log.warning(
            "Flink /*+ OPTIONS(...) */ hint dropped — Spark binds "
            "connector options at DDL time; declare them in CREATE TABLE"
        )
        sql = _OPTIONS_HINT_RE.sub("", sql)
    return sql
