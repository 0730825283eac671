"""Flink-dialect ``CREATE TABLE`` interception.

Spark's parser rejects three Flink DDL constructs the reference relies
on (its demo script ``test.sql:14-44``):

- connector binding: ``WITH ('connector' = 'datagen', ...)``
- computed columns: ``row_time AS cast(current_timestamp as timestamp(3))``
  (``test.sql:18``)
- watermark declarations: ``WATERMARK FOR row_time AS row_time -
  INTERVAL '5' SECOND`` (``test.sql:19``)

This module parses such statements into a :class:`TableSpec` that the
dispatcher registers in its source/sink registry; the actual DataFrame
construction happens in ``flink_commons_spark.sources``. CREATE TABLE
statements *without* a ``WITH ('connector'=...)`` clause are not
touched — they pass through to ``spark.sql`` verbatim.

The grammar is intentionally small (regex/paren-scan level). Anything
outside it fails loudly rather than mis-parsing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?P<ifnot>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>(?:`[^`]+`|[\w.]+)(?:\s*\.\s*(?:`[^`]+`|\w+))*)\s*"
    r"(?P<paren>\(|(?=WITH\s*\()|(?=\s*$))",
    re.IGNORECASE | re.DOTALL,
)
_WITH_RE = re.compile(r"\)\s*WITH\s*\(", re.IGNORECASE)
_WATERMARK_RE = re.compile(
    r"^WATERMARK\s+FOR\s+(?P<col>`?\w+`?)\s+AS\s+(?P<expr>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_COMPUTED_RE = re.compile(
    r"^(?P<col>`?\w+`?)\s+AS\s+(?P<expr>.+)$", re.IGNORECASE | re.DOTALL
)
_COLUMN_RE = re.compile(
    r"^(?P<col>`?\w+`?)\s+(?P<type>.+?)(?:\s+NOT\s+NULL)?(?:\s+COMMENT\s+'[^']*')?$",
    re.IGNORECASE | re.DOTALL,
)
_INTERVAL_RE = re.compile(
    r"INTERVAL\s+'(?P<n>\d+)'\s+(?P<unit>SECOND|MINUTE|HOUR|DAY)S?",
    re.IGNORECASE,
)

# Flink SQL type → Spark SQL type (DDL string form).
_TYPE_MAP = [
    (re.compile(r"^STRING$", re.I), "string"),
    (re.compile(r"^VARCHAR(\(\d+\))?$", re.I), "string"),
    (re.compile(r"^CHAR(\(\d+\))?$", re.I), "string"),
    (re.compile(r"^BOOLEAN$", re.I), "boolean"),
    (re.compile(r"^(TINYINT)$", re.I), "tinyint"),
    (re.compile(r"^(SMALLINT)$", re.I), "smallint"),
    (re.compile(r"^(INT|INTEGER)$", re.I), "int"),
    (re.compile(r"^BIGINT$", re.I), "bigint"),
    (re.compile(r"^FLOAT$", re.I), "float"),
    (re.compile(r"^DOUBLE( PRECISION)?$", re.I), "double"),
    (re.compile(r"^DECIMAL\((\d+)\s*,\s*(\d+)\)$", re.I), None),  # keep as-is
    (re.compile(r"^DATE$", re.I), "date"),
    (re.compile(r"^TIMESTAMP(\(\d\))?( WITHOUT TIME ZONE)?$", re.I), "timestamp"),
    (re.compile(r"^TIMESTAMP(\(\d\))?\s+WITH\s+LOCAL\s+TIME\s+ZONE$", re.I), "timestamp"),
    (re.compile(r"^BYTES$", re.I), "binary"),
    (re.compile(r"^BINARY(\(\d+\))?$", re.I), "binary"),
    (re.compile(r"^VARBINARY(\(\d+\))?$", re.I), "binary"),
]


class DDLParseError(ValueError):
    """Raised when a connector CREATE TABLE doesn't fit the small grammar."""


@dataclass
class TableSpec:
    """Parsed connector table: everything the source/sink registry needs."""

    name: str                                   # unqualified view name
    full_identifiers: list[str] = field(default_factory=list)
    columns: list[tuple[str, str]] = field(default_factory=list)  # (name, spark type)
    computed: list[tuple[str, str]] = field(default_factory=list)  # (name, SQL expr)
    watermark: tuple[str, str] | None = None    # (column, delay e.g. "5 seconds")
    partitioned_by: list[str] = field(default_factory=list)  # PARTITIONED BY cols
    primary_key: list[str] = field(default_factory=list)  # PRIMARY KEY cols
    #: METADATA columns: (name, spark type, metadata key, virtual).
    #: Key defaults to the column name (Flink: `c TYPE METADATA` ==
    #: `METADATA FROM 'c'`); VIRTUAL columns are read-only (excluded
    #: from the sink schema).
    metadata_cols: list[tuple[str, str, str, bool]] = field(default_factory=list)
    connector: str = ""
    options: dict[str, str] = field(default_factory=dict)
    if_not_exists: bool = False
    #: original CREATE TABLE text (post-LIKE expansion) — answers
    #: SHOW CREATE TABLE for connector tables, which live in the
    #: runner's registry rather than Spark's catalog
    source_sql: str = ""

    @property
    def schema_ddl(self) -> str:
        """Spark DDL string for the declared (non-computed) columns."""
        return ", ".join(f"{c} {t}" for c, t in self.columns)


def is_connector_ddl(statement: str) -> bool:
    """True when the CREATE TABLE carries a Flink ``WITH ('connector'=...)``."""
    return bool(
        _CREATE_RE.match(statement)
        and re.search(r"WITH\s*\(\s*'connector'", statement, re.IGNORECASE)
    )


def _strip_quotes(ident: str) -> str:
    return ident.strip().strip("`")


def _split_top_level(body: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parens, ``<>`` type brackets and
    single-quoted strings.

    Angle brackets are depth-tracked (floored at zero) so composite
    types like ``MAP<STRING, BIGINT>`` survive; a lone ``<`` comparison
    inside a computed-column expression would also suppress splitting
    until a ``>``, which is acceptable for the small DDL grammar —
    top-level commas inside comparisons don't occur in column bodies.
    """
    parts: list[str] = []
    depth = 0
    angle = 0
    in_quote = False
    current: list[str] = []
    for ch in body:
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "<":
                angle += 1
            elif ch == ">":
                angle = max(0, angle - 1)
        if ch == sep and depth == 0 and angle == 0 and not in_quote:
            parts.append("".join(current))
            current = []
        else:
            current.append(ch)
    parts.append("".join(current))
    return [p.strip() for p in parts if p.strip()]


def _interval_to_duration(expr: str) -> str:
    """``row_time - INTERVAL '5' SECOND`` → ``"5 seconds"`` for withWatermark."""
    match = _INTERVAL_RE.search(expr)
    if not match:
        if "-" not in expr:  # WATERMARK FOR ts AS ts (no delay)
            return "0 seconds"
        raise DDLParseError(f"Unsupported watermark expression: {expr!r}")
    return f"{match.group('n')} {match.group('unit').lower()}s"


def _map_type(flink_type: str) -> str:
    ft = " ".join(flink_type.split())
    for pattern, spark_type in _TYPE_MAP:
        if pattern.match(ft):
            return spark_type if spark_type is not None else ft.lower()
    # Composite types: translate element types recursively.
    array_m = re.match(r"^ARRAY\s*<(.+)>$", ft, re.IGNORECASE | re.DOTALL)
    if array_m:
        return f"array<{_map_type(array_m.group(1))}>"
    map_m = re.match(r"^MAP\s*<(.+)>$", ft, re.IGNORECASE | re.DOTALL)
    if map_m:
        kv = _split_top_level(map_m.group(1))
        if len(kv) == 2:
            return f"map<{_map_type(kv[0])},{_map_type(kv[1])}>"
    row_m = re.match(r"^ROW\s*<(.+)>$", ft, re.IGNORECASE | re.DOTALL)
    if row_m:
        fields = _split_top_level(row_m.group(1))
        mapped = []
        for f_def in fields:
            fname, _, ftype = f_def.partition(" ")
            mapped.append(f"{_strip_quotes(fname)}:{_map_type(ftype)}")
        return f"struct<{','.join(mapped)}>"
    raise DDLParseError(f"Unsupported Flink type: {flink_type!r}")


def _normalize_expr(expr: str) -> str:
    """Flink expr → Spark SQL expr (the dialect gaps we know about)."""
    out = re.sub(r"timestamp\s*\(\s*3\s*\)", "timestamp", expr, flags=re.IGNORECASE)
    out = re.sub(r"proctime\s*\(\s*\)", "current_timestamp()", out, flags=re.IGNORECASE)
    return out.strip()


def parse_create_table(statement: str) -> TableSpec:
    """Parse a Flink-style connector CREATE TABLE into a :class:`TableSpec`.

    Grammar covered (everything ``test.sql:14-44`` uses plus the common
    extensions): declared columns, computed ``AS`` columns, a single
    ``WATERMARK FOR col AS col - INTERVAL 'n' UNIT`` clause, and the
    ``WITH ('k'='v', ...)`` options map.
    """
    head = _CREATE_RE.match(statement)
    if not head:
        raise DDLParseError(f"Not a CREATE TABLE statement: {statement[:80]!r}")

    name_raw = head.group("name")
    parts = [_strip_quotes(p) for p in _split_top_level(name_raw, sep=".")]
    view_name = parts[-1]
    full_idents = _identifier_variants(parts)

    # Find the column body: between the opening paren after the name and
    # the paren that closes it (depth tracking, quote-aware). A schema-less
    # `CREATE TABLE t WITH (...)` (extension: schema inferred by the
    # connector, e.g. from parquet) has no column body at all.
    if head.group("paren") == "(":
        body_start = head.end()  # index just past the '('
        depth = 1
        in_quote = False
        i = body_start
        while i < len(statement) and depth > 0:
            ch = statement[i]
            if ch == "'":
                in_quote = not in_quote
            elif not in_quote:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
            i += 1
        if depth != 0:
            raise DDLParseError(f"Unbalanced parens in CREATE TABLE: {statement[:120]!r}")
        body = statement[body_start : i - 1]
        rest = statement[i:]
    else:
        body = ""
        rest = statement[head.end():]

    spec = TableSpec(
        name=view_name,
        full_identifiers=full_idents,
        if_not_exists=head.group("ifnot") is not None,
    )

    for item in _split_top_level(body):
        item = " ".join(item.split())
        wm = _WATERMARK_RE.match(item)
        if wm:
            col = _strip_quotes(wm.group("col"))
            spec.watermark = (col, _interval_to_duration(wm.group("expr")))
            continue
        comp = _COMPUTED_RE.match(item)
        # 'x AS expr' — but a plain column "price DOUBLE" also matches the
        # computed regex head; require that the token after the name is AS.
        if comp and re.match(r"^`?\w+`?\s+AS\s", item, re.IGNORECASE):
            spec.computed.append(
                (_strip_quotes(comp.group("col")), _normalize_expr(comp.group("expr")))
            )
            continue
        md_m = re.match(
            r"^(?P<col>`?\w+`?)\s+(?P<type>.+?)\s+METADATA"
            r"(?:\s+FROM\s+'(?P<key>[^']+)')?(?P<virtual>\s+VIRTUAL)?$",
            item,
            re.IGNORECASE,
        )
        if md_m:
            col = _strip_quotes(md_m.group("col"))
            spec.metadata_cols.append(
                (
                    col,
                    _map_type(md_m.group("type")),
                    md_m.group("key") or col,
                    md_m.group("virtual") is not None,
                )
            )
            continue
        pk_m = re.match(
            r"^(?:CONSTRAINT\s+`?\w+`?\s+)?PRIMARY\s+KEY\s*\((?P<cols>[^)]*)\)",
            item,
            re.IGNORECASE,
        )
        if pk_m:
            # NOT ENFORCED is metadata in Flink, but the column list is
            # load-bearing: upsert-kafka keys its records on it
            spec.primary_key = [
                _strip_quotes(c) for c in pk_m.group("cols").split(",") if c.strip()
            ]
            continue
        if item.upper().startswith(("UNIQUE", "CONSTRAINT")):
            continue  # other constraints are metadata-only in Flink; ignore
        col_m = _COLUMN_RE.match(item)
        if not col_m:
            raise DDLParseError(f"Unparseable column definition: {item!r}")
        spec.columns.append(
            (_strip_quotes(col_m.group("col")), _map_type(col_m.group("type")))
        )

    # Flink's filesystem partitioning clause sits between the column body
    # and WITH: ``CREATE TABLE t (...) PARTITIONED BY (dt, hr) WITH (...)``.
    # At lakehouse scale this drives directory layout and therefore
    # partition pruning — dropping it silently would be a correctness bug.
    part_m = re.search(
        r"PARTITIONED\s+BY\s*\((?P<cols>[^)]*)\)", rest, re.IGNORECASE
    )
    if part_m:
        spec.partitioned_by = [
            _strip_quotes(c) for c in part_m.group("cols").split(",") if c.strip()
        ]
        declared = {c for c, _ in spec.columns} | {c for c, _ in spec.computed}
        if spec.columns:
            unknown = [c for c in spec.partitioned_by if c not in declared]
            if unknown:
                raise DDLParseError(
                    f"PARTITIONED BY references undeclared column(s) {unknown} "
                    f"in table {view_name!r}"
                )
        rest = rest[: part_m.start()] + rest[part_m.end():]

    with_m = re.search(r"WITH\s*\(", rest, re.IGNORECASE)
    if with_m:
        opts_body = rest[with_m.end() : rest.rfind(")")]
        for pair in _split_top_level(opts_body):
            kv = re.match(r"^'(?P<k>[^']+)'\s*=\s*'(?P<v>[^']*)'$", pair.strip())
            if not kv:
                raise DDLParseError(f"Unparseable WITH option: {pair!r}")
            spec.options[kv.group("k")] = kv.group("v")
        spec.connector = spec.options.get("connector", "")
    return spec


def _identifier_variants(parts: list[str]) -> list[str]:
    """All textual spellings of the table identifier that later statements
    may use, longest first, so the dispatcher can rewrite references."""
    variants: list[str] = []
    for n in range(len(parts), 0, -1):
        tail = parts[-n:]
        variants.append(".".join(f"`{p}`" for p in tail))
        variants.append(".".join(tail))
    # longest-first so `a`.`b`.`c` is replaced before `c`
    variants.sort(key=len, reverse=True)
    return variants
