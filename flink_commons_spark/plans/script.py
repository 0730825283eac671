"""SQL-script front-end: read, strip comments, split, substitute.

Re-expresses the reference's script loader
(``SQLSubmitAction.java:101-194``):

- file reading with URI-scheme dispatch (local / ``file://`` /
  ``hdfs://``; error on unknown scheme or missing file —
  ``SQLSubmitAction.java:163-194``, ``Constannts.java:12-13``);
- per-line ``--`` comment stripping (``SQLSubmitAction.java:107-115``);
- statement splitting: accumulate lines until one ends with ``;``, cut
  the buffered statement at the *first* ``;``
  (``SQLSubmitAction.java:121-124``);
- ``${var}`` substitution with a hard error on missing/empty bindings
  (``SQLSubmitAction.java:144-161``).

The reference front-end is intentionally naive: it strips ``--`` even
inside string literals and drops text after the first ``;`` of a
multi-line buffer. ``strict_compat=True`` replicates those quirks
bit-for-bit; the default mode is quote-aware and keeps full statements.
"""

from __future__ import annotations

import os
import re
from urllib.parse import urlparse

from flink_commons_spark.plans.statements import StatementType, classify

COMMENT_MARK = "--"
STATEMENT_DELIMITER = ";"
_VAR_PATTERN = re.compile(r"\$\{(.+?)}")


class ScriptError(RuntimeError):
    """Raised for unreadable scripts or unresolved template variables."""


def read_script(path: str) -> str:
    """Read a SQL script from a local path, ``file://`` or ``hdfs://`` URI.

    Scheme dispatch mirrors ``SQLSubmitAction.openFileReader``
    (``SQLSubmitAction.java:163-194``): bare paths and ``file`` scheme
    read locally, ``hdfs`` goes through the Hadoop filesystem, anything
    else is an error, as is a missing file.
    """
    parsed = urlparse(path)
    scheme = parsed.scheme.lower()
    if scheme in ("", "file"):
        local = parsed.path if scheme == "file" else path
        if not os.path.isfile(local):
            raise ScriptError(f"SQL script file '{path}' does not exist!")
        with open(local, "r", encoding="utf-8") as fh:
            return fh.read()
    if scheme == "hdfs":
        return _read_hdfs(path)
    raise ScriptError(
        f"Unsupported file system scheme '{scheme}' for SQL script '{path}'; "
        "expected a local path, 'file://' or 'hdfs://'."
    )


def _read_hdfs(path: str) -> str:
    """Read via pyarrow's HadoopFileSystem; gated — HDFS libs may be absent."""
    try:
        from pyarrow import fs as pafs

        parsed = urlparse(path)
        hdfs = pafs.HadoopFileSystem(parsed.hostname or "default", parsed.port or 0)
        with hdfs.open_input_stream(parsed.path) as stream:
            return stream.read().decode("utf-8")
    except ImportError as exc:  # pragma: no cover - environment dependent
        raise ScriptError(f"HDFS support unavailable for '{path}': {exc}") from exc


def strip_comments(line: str, strict_compat: bool = False) -> str:
    """Strip a ``--`` line comment.

    strict_compat replicates ``SQLSubmitAction.java:107-115``: truncate
    at the first ``--`` even when it appears inside a string literal.
    Default mode only strips ``--`` outside single-quoted strings and
    backtick identifiers.
    """
    if strict_compat:
        idx = line.find(COMMENT_MARK)
        return line if idx < 0 else line[:idx]
    in_single = False
    in_backtick = False
    i = 0
    n = len(line)
    while i < n:
        ch = line[i]
        if ch == "'" and not in_backtick:
            in_single = not in_single
        elif ch == "`" and not in_single:
            in_backtick = not in_backtick
        elif ch == "-" and not in_single and not in_backtick:
            if line.startswith(COMMENT_MARK, i):
                return line[:i]
        i += 1
    return line


def split_statements(text: str, strict_compat: bool = False) -> list[str]:
    """Split script text into ``;``-terminated statements.

    strict_compat replicates ``SQLSubmitAction.loadStatements``
    (``SQLSubmitAction.java:101-134``): lines accumulate until one ends
    with ``;`` and the statement is cut at the *first* ``;`` in the
    buffer (text after it is silently dropped). Default mode splits on
    every ``;`` outside string literals, so multiple statements per line
    and ``;`` inside literals both behave as a user would expect.

    Comment stripping happens per-line before accumulation in both
    modes, matching the reference's order of operations.
    """
    statements: list[str] = []
    if strict_compat:
        buffer: list[str] = []
        for raw_line in text.splitlines():
            line = strip_comments(raw_line, strict_compat=True).strip()
            if not line:
                continue
            buffer.append(line)
            if line.endswith(STATEMENT_DELIMITER):
                whole = " ".join(buffer)
                statements.append(whole[: whole.index(STATEMENT_DELIMITER)].strip())
                buffer = []
        return [s for s in statements if s]

    stripped_lines = [strip_comments(line) for line in text.splitlines()]
    body = "\n".join(stripped_lines)
    current: list[str] = []
    in_single = False
    in_backtick = False
    for ch in body:
        if ch == "'" and not in_backtick:
            in_single = not in_single
        elif ch == "`" and not in_single:
            in_backtick = not in_backtick
        if ch == STATEMENT_DELIMITER and not in_single and not in_backtick:
            stmt = "".join(current).strip()
            if stmt:
                statements.append(stmt)
            current = []
        else:
            current.append(ch)
    tail = "".join(current).strip()
    if tail:
        statements.append(tail)
    return _merge_statement_sets(statements)


_STMT_SET_HEAD_RE = re.compile(r"^EXECUTE\s+STATEMENT\s+SET\s+BEGIN\b", re.IGNORECASE | re.DOTALL)


def _merge_statement_sets(statements: list[str]) -> list[str]:
    """Re-join Flink ``EXECUTE STATEMENT SET BEGIN … END`` blocks.

    The ``;``-splitter fragments the block at each inner INSERT; this
    pass stitches fragments back together (extension — the reference's
    own splitter cannot carry statement sets at all)."""
    out: list[str] = []
    i = 0
    while i < len(statements):
        stmt = statements[i]
        if _STMT_SET_HEAD_RE.match(stmt):
            block = [stmt]
            # The terminator is a STANDALONE `END` fragment (from `END;`
            # — inner statements are `;`-terminated in Flink's syntax, so
            # END always lands in its own fragment). An inner statement
            # that merely *ends* with the token END (e.g. `... CASE WHEN
            # ... END`) must not close the block.
            while block[-1].strip().upper() != "END":
                if i + 1 >= len(statements):
                    raise ScriptError(
                        "EXECUTE STATEMENT SET block is missing its "
                        "closing END (terminate the block with a "
                        "standalone 'END;')."
                    )
                i += 1
                block.append(statements[i])
            out.append(";\n".join(block))
        else:
            out.append(stmt)
        i += 1
    return out


def substitute_variables(statement: str, variables: dict[str, str] | None) -> str:
    """Replace ``${name}`` placeholders from the ``--var`` bindings.

    Mirrors ``SQLSubmitAction.replaceVariable``
    (``SQLSubmitAction.java:144-161``): any placeholder with no binding,
    or whose bound value is empty, raises.
    """
    bindings = variables or {}

    def _resolve(match: re.Match[str]) -> str:
        key = match.group(1)
        value = bindings.get(key, "")
        if not value:
            raise ScriptError(
                f"Variable '${{{key}}}' is referenced by the SQL script "
                "but no non-empty value was supplied (use --var "
                f"{key}=<value>)."
            )
        return value

    return _VAR_PATTERN.sub(_resolve, statement)


def load_statements(
    path: str,
    variables: dict[str, str] | None = None,
    strict_compat: bool = False,
) -> list[tuple[StatementType, str]]:
    """Full front-end pipeline: read → strip → split → substitute → classify.

    Returns the ordered ``(StatementType, text)`` pairs — the same shape
    as the reference's ``List<Tuple2<StatementType, String>>``
    (``SQLSubmitAction.java:101-134``).
    """
    text = read_script(path)
    return load_statements_from_text(text, variables, strict_compat)


def load_statements_from_text(
    text: str,
    variables: dict[str, str] | None = None,
    strict_compat: bool = False,
) -> list[tuple[StatementType, str]]:
    """Like :func:`load_statements` but from an in-memory script string."""
    out: list[tuple[StatementType, str]] = []
    for stmt in split_statements(text, strict_compat=strict_compat):
        resolved = substitute_variables(stmt, variables)
        out.append((classify(resolved), resolved))
    return out
