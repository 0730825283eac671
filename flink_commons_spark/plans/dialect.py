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
- Flink built-ins Spark lacks by name: ``SPLIT_INDEX`` (0-based) →
  ``try_element_at(split(...), i+1)``, ``JSON_VALUE`` →
  ``get_json_object`` (same ``$.path`` syntax), ``TO_TIMESTAMP_LTZ(x,
  0|3)`` → ``timestamp_seconds``/``timestamp_millis``,
  ``RAND_INTEGER([seed,] n)`` → ``cast(floor(rand(...) * n) as int)``,
  ``STR_TO_MAP`` (Flink's literal delimiters + ``'='`` kv default vs
  Spark's regex delimiters + ``':'``), ``CONVERT_TZ`` (string→string)
  → ``convert_timezone`` wrapped in parse/format, numeric ``TRUNCATE``
  (toward zero — sign-aware floor), ``IS_DIGIT``/``IS_ALPHA``/
  ``IS_DECIMAL`` → rlike/try_cast predicates, ``JSON_EXISTS``/
  ``JSON_QUERY`` → ``get_json_object`` forms, and the time-unit
  rounding syntax ``FLOOR(ts TO UNIT)`` / ``CEIL(ts TO UNIT)`` →
  ``date_trunc`` (+ one-unit bump for CEIL; WEEK/QUARTER bump via
  days/add_months since Spark lacks those interval qualifiers);
- Flink **windowing TVFs** (the ≥1.13 syntax, `TVFs`): ``FROM
  TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), size))`` /
  ``HOP(…, slide, size)`` / ``CUMULATE(…, step, size)`` → a derived
  subquery that appends ``window_start`` / ``window_end`` /
  ``window_time`` columns exactly as the TVF does. TUMBLE/HOP use
  Spark's ``window()`` (sliding windows expand in a Project);
  CUMULATE — which Spark lacks — expands each row to its growing
  window ends via ``explode(sequence(...))``, bounded by
  ``size/step`` rows per input row. Named arguments
  (``DATA => …``) are accepted. SESSION TVFs are left untouched
  (Spark's ``session_window`` only merges inside an aggregation, so a
  free-standing rewrite can't preserve semantics — use the legacy
  ``SESSION(ts, gap)`` group window instead). The rewrite targets
  batch runtime-mode scripts and complete-mode streaming: append-mode
  streaming aggregation over the flattened ``window_start`` column
  loses Spark's watermark-on-window tracking;
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
_WINDOW_TVF_RE = re.compile(
    r"\bTABLE\s*\(\s*(?P<fn>TUMBLE|HOP|CUMULATE|SESSION)\s*\(", re.IGNORECASE
)
_NAMED_ARG_RE = re.compile(r"^\s*\w+\s*=>\s*", re.IGNORECASE)
_TVF_SOURCE_RE = re.compile(r"^TABLE\s+(?P<name>(?:`[^`]+`|[\w.])+)$", re.IGNORECASE)
_DESCRIPTOR_RE = re.compile(
    r"^DESCRIPTOR\s*\(\s*(?P<col>`?\w+`?)\s*\)$", re.IGNORECASE
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


def _window_tvf_replacement(fn: str, args: list[str]) -> str | None:
    """Spark subquery equivalent of one windowing-TVF call (None if the
    shape isn't one we can rewrite faithfully)."""
    if fn == "SESSION" or len(args) < 3:
        return None
    sm = _TVF_SOURCE_RE.match(args[0])
    if sm:
        src = sm.group("name")
    elif args[0].startswith("("):
        src = args[0]
    else:
        return None
    dm = _DESCRIPTOR_RE.match(args[1])
    if not dm:
        return None
    col = dm.group("col")
    durations = [_interval_to_duration(a) for a in args[2:]]
    if any(d is None for d in durations):
        return None
    if fn == "TUMBLE" and len(durations) == 1:
        win = f"window({col}, {durations[0]})"
    elif fn == "HOP" and len(durations) == 2:
        # Flink: (…, slide, size); Spark window(): (col, size, slide)
        win = f"window({col}, {durations[1]}, {durations[0]})"
    elif fn == "CUMULATE" and len(durations) == 2:
        # No Spark analog: align on the max-size window, then expand each
        # row to every step-aligned window end past its timestamp. Row
        # fan-out is bounded by size/step (the TVF's own output factor).
        step, size = args[2].strip(), args[3].strip()
        return (
            f"(SELECT * EXCEPT (__fcs_w, __fcs_we), "
            f"__fcs_w.start AS window_start, __fcs_we AS window_end, "
            f"__fcs_we - INTERVAL '1' MILLISECOND AS window_time "
            f"FROM (SELECT *, window({col}, {durations[1]}) AS __fcs_w FROM {src}) "
            f"LATERAL VIEW explode(sequence(__fcs_w.start + {step}, "
            f"__fcs_w.start + {size}, {step})) AS __fcs_we "
            f"WHERE {col} < __fcs_we)"
        )
    else:
        return None
    return (
        f"(SELECT * EXCEPT (__fcs_w), __fcs_w.start AS window_start, "
        f"__fcs_w.end AS window_end, "
        f"__fcs_w.end - INTERVAL '1' MILLISECOND AS window_time "
        f"FROM (SELECT *, {win} AS __fcs_w FROM {src}))"
    )


_SCALAR_FN_RE = re.compile(
    r"\b(?P<fn>SPLIT_INDEX|JSON_VALUE|TO_TIMESTAMP_LTZ|RAND_INTEGER"
    r"|STR_TO_MAP|CONVERT_TZ|TRUNCATE|IS_DIGIT|IS_ALPHA|IS_DECIMAL"
    r"|JSON_EXISTS|JSON_QUERY|FLOOR|CEIL|CEILING"
    r"|WEEK|SHA224|SHA256|SHA384|SHA512)\s*\(",
    re.IGNORECASE,
)

#: FLOOR/CEIL(ts TO UNIT) — Flink's time-unit rounding syntax
#: (FLOOR <timepoint> TO <timeintervalunit>); Spark's FLOOR/CEIL are
#: numeric-only, its parser rejects the TO form outright.
_TO_UNIT_RE = re.compile(
    r"^(?P<expr>.+?)\s+TO\s+(?P<unit>YEAR|QUARTER|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _escape_literal_delim(arg: str) -> str:
    """Regex-escape the contents of a quoted literal delimiter (Flink
    treats split delimiters as literals, Spark as regexes); non-literal
    expressions pass through unchanged."""
    m = re.fullmatch(r"'([^'\\]*)'", arg.strip())
    if m:
        return "'" + re.escape(m.group(1)).replace("\\", "\\\\") + "'"
    return arg


def _scalar_fn_replacement(fn: str, args: list[str]) -> str | None:
    """Spark expression for one Flink built-in Spark lacks by that name
    (None if the arity isn't one we can rewrite faithfully)."""
    if fn == "SPLIT_INDEX" and len(args) == 3:
        # Flink is 0-based and NULL on out-of-range; try_element_at is
        # 1-based and NULL on out-of-range. Spark's split() delimiter is
        # a REGEX where Flink's is a literal, so '.', '|', '+', '*', '$'
        # would silently mis-split — regex-escape the contents of a
        # quoted literal delimiter (the doubled backslash survives
        # Spark's SQL-string unescaping). Non-literal delimiter
        # expressions pass through unchanged: no value to inspect at
        # rewrite time, documented as regex-semantics.
        delim = args[1].strip()
        m = re.fullmatch(r"'([^'\\]*)'", delim)
        if m:
            delim = "'" + re.escape(m.group(1)).replace("\\", "\\\\") + "'"
        return f"try_element_at(split({args[0]}, {delim}), ({args[2]}) + 1)"
    if fn == "JSON_VALUE" and len(args) == 2:
        # same $.path syntax; both return NULL on missing paths
        return f"get_json_object({args[0]}, {args[1]})"
    if fn == "TO_TIMESTAMP_LTZ" and len(args) == 2:
        precision = args[1].strip()
        if precision == "0":
            return f"timestamp_seconds({args[0]})"
        if precision == "3":
            return f"timestamp_millis({args[0]})"
        return None
    if fn == "RAND_INTEGER" and len(args) in (1, 2):
        seed = f"rand({args[0]})" if len(args) == 2 else "rand()"
        bound = args[-1]
        return f"cast(floor({seed} * ({bound})) as int)"
    if fn == "STR_TO_MAP" and len(args) in (1, 3):
        # Flink: literal delimiters, defaults (',', '='); Spark:
        # REGEX delimiters, defaults (',', ':') — both the default kv
        # separator and the literal-vs-regex semantics differ.
        if len(args) == 1:
            return f"str_to_map({args[0]}, ',', '=')"
        return (
            f"str_to_map({args[0]}, {_escape_literal_delim(args[1])}, "
            f"{_escape_literal_delim(args[2])})"
        )
    if fn == "CONVERT_TZ" and len(args) == 3:
        # Flink: (datetime STRING, from_tz, to_tz) -> STRING in
        # 'yyyy-MM-dd HH:mm:ss'. Spark's convert_timezone takes
        # (sourceTz, targetTz, timestamp_ntz) — wrap both directions.
        return (
            f"date_format(convert_timezone({args[1]}, {args[2]}, "
            f"to_timestamp({args[0]})), 'yyyy-MM-dd HH:mm:ss')"
        )
    if fn == "TRUNCATE" and len(args) in (1, 2):
        # Flink: truncate toward zero to d decimal places (d may be
        # negative); Spark has no numeric TRUNCATE — floor() rounds
        # toward -inf, so build a sign-aware form.
        x, d = args[0], (args[1] if len(args) == 2 else "0")
        return (
            f"(sign({x}) * floor(abs({x}) * pow(10, ({d}))) / pow(10, ({d})))"
        )
    if fn == "IS_DIGIT" and len(args) == 1:
        return f"(coalesce({args[0]}, '') rlike '^[0-9]+$')"
    if fn == "IS_ALPHA" and len(args) == 1:
        return f"(coalesce({args[0]}, '') rlike '^[a-zA-Z]+$')"
    if fn == "IS_DECIMAL" and len(args) == 1:
        return f"(try_cast({args[0]} as decimal(38,18)) is not null)"
    if fn == "JSON_EXISTS" and len(args) == 2:
        # lax-mode existence check; get_json_object is NULL on a
        # missing path, which is exactly the boolean Flink returns
        return f"(get_json_object({args[0]}, {args[1]}) is not null)"
    if fn == "JSON_QUERY" and len(args) == 2:
        # both return the matched JSON fragment as text, NULL if absent
        return f"get_json_object({args[0]}, {args[1]})"
    if fn == "WEEK" and len(args) == 1:
        # Flink WEEK(date) = ISO week of year; Spark spells it weekofyear
        return f"weekofyear({args[0]})"
    if fn in ("SHA224", "SHA256", "SHA384", "SHA512") and len(args) == 1:
        return f"sha2({args[0]}, {fn[3:]})"
    if fn in ("FLOOR", "CEIL", "CEILING") and len(args) == 1:
        m = _TO_UNIT_RE.match(args[0])
        if not m:
            return None  # plain numeric FLOOR/CEIL — Spark-native
        expr, unit = m.group("expr").strip(), m.group("unit").upper()
        trunc = f"date_trunc('{unit}', {expr})"
        if fn == "FLOOR":
            return trunc
        # CEIL: already-aligned timepoints stay; else round up one
        # unit. WEEK/QUARTER aren't valid Spark interval qualifiers —
        # add 7 days / 3 months instead.
        bump = {
            "WEEK": f"{trunc} + INTERVAL '7' DAY",
            "QUARTER": f"add_months({trunc}, 3)",
        }.get(unit, f"{trunc} + INTERVAL '1' {unit}")
        return f"(case when {expr} = {trunc} then {trunc} else {bump} end)"
    return None


def _rewrite_scalar_funcs(sql: str) -> str:
    """Flink built-ins Spark lacks by name → Spark equivalents."""
    out: list[str] = []
    pos = 0
    while True:
        m = _SCALAR_FN_RE.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            break
        close, commas = _find_args_span(sql, m.end() - 1)
        if close < 0:
            out.append(sql[pos:])
            break
        bounds = [m.end()] + [c + 1 for c in commas] + [close + 1]
        args = [
            _rewrite_scalar_funcs(sql[bounds[i] : bounds[i + 1] - 1].strip())
            for i in range(len(bounds) - 1)
        ]
        replacement = _scalar_fn_replacement(m.group("fn").upper(), args)
        out.append(sql[pos : m.start()])
        if replacement is None:
            # unhandled shape (e.g. plain numeric FLOOR): keep the call
            # but from the REWRITTEN args, so Flink built-ins nested
            # inside it still get translated
            fn_text = sql[m.start() : m.end() - 1].rstrip().rstrip("(").rstrip()
            out.append(f"{fn_text}({', '.join(args)})")
        else:
            out.append(replacement)
        pos = close + 1
    return "".join(out)


def _rewrite_window_tvfs(sql: str) -> str:
    """Flink windowing TVFs → derived subqueries (see module doc)."""
    out: list[str] = []
    pos = 0
    while True:
        m = _WINDOW_TVF_RE.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            break
        inner_open = m.end() - 1
        inner_close, commas = _find_args_span(sql, inner_open)
        if inner_close < 0:
            out.append(sql[pos:])
            break
        # the outer TABLE( … ) must close right after the inner call
        j = inner_close + 1
        while j < len(sql) and sql[j].isspace():
            j += 1
        if j >= len(sql) or sql[j] != ")":
            out.append(sql[pos : m.end()])
            pos = m.end()
            continue
        bounds = [inner_open + 1] + [c + 1 for c in commas] + [inner_close + 1]
        args = [
            _NAMED_ARG_RE.sub("", sql[bounds[i] : bounds[i + 1] - 1].strip())
            for i in range(len(bounds) - 1)
        ]
        fn = m.group("fn").upper()
        replacement = _window_tvf_replacement(fn, args)
        out.append(sql[pos : m.start()])
        if replacement is None:
            log.warning("unsupported windowing TVF left as-is: %s(...)", fn)
            out.append(sql[m.start() : j + 1])
        else:
            out.append(replacement)
        pos = j + 1
    return "".join(out)


def adapt_sql(sql: str) -> str:
    """Apply every known Flink→Spark expression rewrite."""
    sql = _rewrite_unix_timestamp(sql)
    sql = _rewrite_scalar_funcs(sql)
    sql = _CAST_TS3_RE.sub("as timestamp", sql)
    sql = _PROCTIME_RE.sub("current_timestamp()", sql)
    sql = _rewrite_window_tvfs(sql)
    sql = _rewrite_group_windows(sql)
    sql = _SYSTEM_TIME_RE.sub("", sql)
    if _OPTIONS_HINT_RE.search(sql):
        log.warning(
            "Flink /*+ OPTIONS(...) */ hint dropped — Spark binds "
            "connector options at DDL time; declare them in CREATE TABLE"
        )
        sql = _OPTIONS_HINT_RE.sub("", sql)
    return sql
