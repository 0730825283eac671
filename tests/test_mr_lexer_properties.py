"""Property-based tests (hypothesis) for the MATCH_RECOGNIZE front
door's shared structural lexer (``_skip_span`` and the scanners built
on it) — the round-9 verdict's "property-test the splitter on
adversarial literals" item, mirroring ``test_script_properties.py``.

Strategy: GENERATE statements by composing spans whose structural
paren positions are known by construction — payload spans (string
literals with backslash/doubled-quote escapes, backtick identifiers,
line and nested block comments, each free to contain parens and
quotes) interleaved with real parens — then assert the scanners pair
exactly the parens the generator injected.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_commons_spark.plans.match_recognize import (
    _find_close,
    _match_open_paren,
    _skip_span,
    _split_top,
)

# hazardous payload: parens, quotes-to-escape, comment markers
_PAYLOAD = st.text(alphabet="ab() x,*-/", min_size=0, max_size=8)


@st.composite
def payload_span(draw):
    """One span the lexer must treat as payload, hazards included."""
    kind = draw(st.sampled_from(["sq", "dq", "bt", "line", "block",
                                 "nested"]))
    body = draw(_PAYLOAD)
    if kind == "sq":
        inner = body.replace("'", "\\'") + draw(
            st.sampled_from(["", "\\'", "''", "\\n"])
        )
        return f"'{inner}'"
    if kind == "dq":
        return '"' + body.replace('"', '\\"') + '"'
    if kind == "bt":
        return "`" + body.replace("`", "``") + "`"
    if kind == "line":
        return "--" + body.replace("\n", "") + "\n"
    # block bodies must not form '/*' or '*/' even at the glue points
    # with the delimiters, so drop both marker characters from the
    # body (parens/quotes/commas — the actual hazards — remain)
    if kind == "block":
        clean = body.replace("*", "").replace("/", "")
        return "/*" + clean + "*/"
    clean = body.replace("*", "").replace("/", "")
    # the '(' between the inner and outer closers is the sensitivity
    # probe: a non-nesting lexer ends the comment at the first '*/'
    # and leaks that paren as structure
    return "/* a /*" + clean + "*/ ( */"


@st.composite
def statement_with_parens(draw):
    """Interleave payload spans, filler, and REAL parens; return the
    text plus the ground-truth (open, close) index pairs."""
    parts: list[str] = []
    stack: list[int] = []
    pairs: list[tuple[int, int]] = []
    pos = 0

    def emit(s: str):
        nonlocal pos
        parts.append(s)
        pos += len(s)

    for action in draw(st.lists(
        st.sampled_from(["payload", "open", "close", "word"]),
        min_size=2, max_size=14,
    )):
        if action == "payload":
            emit(draw(payload_span()))
        elif action == "open":
            stack.append(pos)
            emit("(")
        elif action == "close" and stack:
            pairs.append((stack.pop(), pos))
            emit(")")
        else:
            emit(draw(st.sampled_from([" x ", " y,z ", " 7 "])))
    while stack:  # balance the statement
        pairs.append((stack.pop(), pos))
        emit(")")
    return "".join(parts), pairs


@given(statement_with_parens())
@settings(max_examples=200, deadline=None)
def test_paren_pairing_matches_ground_truth(case):
    text, pairs = case
    for o, c in pairs:
        assert text[o] == "(" and text[c] == ")"
        assert _match_open_paren(text, c) == o
        assert _find_close(text, o) == c


@given(statement_with_parens())
@settings(max_examples=100, deadline=None)
def test_skip_span_never_stalls_or_overruns(case):
    text, _ = case
    i = 0
    while i < len(text):
        j = _skip_span(text, i)
        assert i <= j <= len(text)
        i = j + 1 if j == i else j


@given(st.lists(payload_span(), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_split_top_ignores_commas_inside_payload(spans):
    """Commas inside payload spans never split; top-level commas
    always do — count parts against the commas the generator placed
    at top level."""
    pieces = []
    for k, s in enumerate(spans):
        pieces.append(f"a{k} {s} b{k}")
    text = ",".join(pieces)
    parts = _split_top(text)
    assert len(parts) == len(spans)
    for k, p in enumerate(parts):
        assert p.startswith(f"a{k}")
