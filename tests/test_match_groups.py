"""Quantified sequence groups in MATCH_RECOGNIZE patterns — one level
of SQL:2016 nesting, ``PATTERN (V (B C)+ Z)``, as a flagged extension
(Flink 1.16 rejects all pattern grouping; ``--strict-compat`` keeps
that parity rejection).

The group compiles to a sub-NFA inside the shared backtracker
(``operators/cep.py:_match_at_ex``): repetition count is greedy-first
with full backtracking through child takes then rep count, each
repetition must consume at least one row, and per-child positions are
reported through the ``gout`` side channel so measures see each child
as its own variable. The reference routes any Flink MATCH_RECOGNIZE
through its generic executor (``SQLSubmitAction.java:74-76``); Flink
1.16 rejects nested grouping, so this surface is extension-only."""

from __future__ import annotations

import pytest

from flink_commons_spark.plans.match_recognize import (
    execute_match_recognize,
    parse_match_recognize,
)

COLS = {"user_id": "bigint", "ts_us": "bigint", "event_type": "string",
        "price": "double"}


def _view(spark, rows, name):
    spark.createDataFrame(
        rows, "user_id bigint, ts_us bigint, event_type string, price double"
    ).createOrReplaceTempView(name)


# ------------------------------------------------------------- parser


def test_parse_group_structure():
    sql = """SELECT * FROM t MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts_us
      MEASURES COUNT(b.*) AS n ONE ROW PER MATCH
      PATTERN (a (b c+){2,3} d?)
      DEFINE a AS a.price > 0, b AS b.price > 1, c AS c.price > 2,
             d AS d.price > 3)"""
    spec = parse_match_recognize(sql, COLS)
    assert [s.name for s in spec.steps] == ["A", "(B C)", "D"]
    g = spec.steps[1]
    assert (g.lo, g.hi) == (2, 3)
    assert [(c.name, c.lo, c.hi) for c in g.group] == [
        ("B", 1, 1), ("C", 1, None),
    ]


def test_group_rejections():
    base = """SELECT * FROM t MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts_us
      MEASURES COUNT(b.*) AS n ONE ROW PER MATCH
      PATTERN ({pat})
      DEFINE {defs})"""
    # strict-compat parity: Flink rejects all grouping
    with pytest.raises(ValueError, match="alternation/grouping"):
        parse_match_recognize(
            base.format(pat="a (b c)+", defs="a AS a.price > 0"),
            COLS, strict_compat=True,
        )
    # match-state-dependent DEFINE + group
    with pytest.raises(ValueError, match="sequence groups cannot"):
        parse_match_recognize(
            base.format(pat="a (b c)+",
                        defs="b AS b.price > AVG(a.price)"), COLS)
    # NEXT inside a group child
    with pytest.raises(ValueError, match="NEXT.*sequence-group"):
        parse_match_recognize(
            base.format(pat="a (b c)+",
                        defs="b AS NEXT(b.price) > b.price"), COLS)
    # SKIP TO a group child
    with pytest.raises(ValueError, match="sequence-group member"):
        parse_match_recognize("""SELECT * FROM t MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(b.*) AS n ONE ROW PER MATCH
          AFTER MATCH SKIP TO LAST b
          PATTERN (a (b c)+)
          DEFINE a AS a.price > 0)""", COLS)
    # deeper nesting and alternation inside a group stay rejected
    # (two-level nesting dies at the clause scanner, mixed
    # alternation at the pattern scanner — both loud errors)
    with pytest.raises(
        ValueError,
        match="unsupported PATTERN token|cannot parse MATCH_RECOGNIZE",
    ):
        parse_match_recognize(
            base.format(pat="((a b) c)+", defs="a AS a.price > 0"), COLS)
    with pytest.raises(
        ValueError,
        match="unsupported PATTERN token|cannot parse MATCH_RECOGNIZE",
    ):
        parse_match_recognize(
            base.format(pat="(a|b c)+", defs="a AS a.price > 0"), COLS)
    # repeated variable inside and outside a group
    with pytest.raises(ValueError, match="repeated pattern variables"):
        parse_match_recognize(
            base.format(pat="a (a b)+", defs="a AS a.price > 0"), COLS)


# ------------------------------------------------- batch hand-computed


def test_group_greedy_reps_batch(spark):
    """``v (c p)+``: greedy takes every complete (click purchase) pair;
    an incomplete trailing pair is not consumed; a view with no
    complete pair does not match."""
    _view(spark, [
        (1, 1, "view", 0.0), (1, 2, "click", 2.0), (1, 3, "purchase", 3.0),
        (1, 4, "click", 4.0), (1, 5, "purchase", 5.0), (1, 6, "click", 9.0),
        (2, 1, "view", 0.0), (2, 2, "click", 6.0), (2, 3, "purchase", 7.0),
        (3, 1, "view", 0.0), (3, 2, "click", 1.0), (3, 3, "x", 1.0),
    ], "mg_ev1")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_c, n_p, sum_p, end_us FROM mg_ev1 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(c.*) AS n_c, COUNT(p.*) AS n_p,
                   SUM(p.price) AS sum_p, LAST(p.ts_us) AS end_us
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN (v (c p)+)
          DEFINE v AS v.event_type = 'view', c AS c.event_type = 'click',
                 p AS p.event_type = 'purchase'
        )""")
    assert sorted(map(tuple, out.collect())) == [
        (1, 2, 2, 8.0, 5), (2, 1, 1, 7.0, 3),
    ]


def test_group_rep_count_backtracking(spark):
    """``(a b){1,2} z``: two reps preferred, but with only one complete
    (a b) before z the rep count backtracks to 1."""
    _view(spark, [
        (1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "a", 0.0),
        (1, 4, "b", 0.0), (1, 5, "z", 0.0),
        (2, 1, "a", 0.0), (2, 2, "b", 0.0), (2, 3, "z", 0.0),
    ], "mg_ev2")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_a, z_us FROM mg_ev2 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(a.*) AS n_a, FIRST(z.ts_us) AS z_us
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN ((a b){1,2} z)
          DEFINE a AS a.event_type = 'a', b AS b.event_type = 'b',
                 z AS z.event_type = 'z'
        )""")
    assert sorted(map(tuple, out.collect())) == [(1, 2, 5), (2, 1, 3)]


def test_group_greedy_vs_reluctant(spark):
    """``z`` overlaps ``a``: the greedy group prefers more reps (z
    lands on the LAST admissible row), the reluctant ``+?`` group
    prefers fewest (z lands on the first row that can end the
    match)."""
    rows = [
        (1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "a", 0.0),
        (1, 4, "b", 0.0), (1, 5, "a", 0.0),
    ]
    _view(spark, rows, "mg_ev3")
    greedy = execute_match_recognize(spark, """
        SELECT user_id, n_a, z_us FROM mg_ev3 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(a.*) AS n_a, FIRST(z.ts_us) AS z_us
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN ((a b)+ z)
          DEFINE a AS a.event_type = 'a', b AS b.event_type = 'b',
                 z AS z.event_type = 'a'
        )""")
    assert sorted(map(tuple, greedy.collect())) == [(1, 2, 5)]
    lazy = execute_match_recognize(spark, """
        SELECT user_id, n_a, z_us FROM mg_ev3 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(a.*) AS n_a, FIRST(z.ts_us) AS z_us
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN ((a b)+? z)
          DEFINE a AS a.event_type = 'a', b AS b.event_type = 'b',
                 z AS z.event_type = 'a'
        )""")
    assert sorted(map(tuple, lazy.collect())) == [(1, 1, 3)]


def test_group_inner_take_backtracking(spark):
    """Child quantifier backtracks inside a repetition: ``b``'s
    predicate also holds on the ``z`` row, so the last rep's greedy
    ``b+`` must give one row back for ``z`` to complete."""
    _view(spark, [
        (1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "z", 0.0),
    ], "mg_ev4")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_b, z_us FROM mg_ev4 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(b.*) AS n_b, FIRST(z.ts_us) AS z_us
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN ((a b+)+ z)
          DEFINE a AS a.event_type = 'a',
                 b AS b.event_type = 'b' OR b.event_type = 'z',
                 z AS z.event_type = 'z'
        )""")
    assert sorted(map(tuple, out.collect())) == [(1, 1, 3)]


def test_group_optional_child_and_bounds(spark):
    """``(a b?){2}``: optional child per repetition; exactly-2 bound
    fails when only one repetition is possible."""
    _view(spark, [
        (1, 1, "a", 0.0), (1, 2, "a", 0.0), (1, 3, "b", 0.0),
        (2, 1, "a", 0.0), (2, 2, "x", 0.0),
    ], "mg_ev5")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_a, n_b FROM mg_ev5 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(a.*) AS n_a, COUNT(b.*) AS n_b
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN ((a b?){2})
          DEFINE a AS a.event_type = 'a', b AS b.event_type = 'b'
        )""")
    # u1: rep1 = a@1 (no b — next row is 'a'), rep2 = a@2 b@3; u2: one rep only
    assert sorted(map(tuple, out.collect())) == [(1, 2, 1)]


def test_group_zero_width_rep_guard(spark):
    """A repetition whose children all take zero rows cannot make
    progress — the matcher terminates (no infinite loop) and the
    pattern simply fails where no child row exists."""
    _view(spark, [
        (1, 1, "x", 0.0), (1, 2, "z", 0.0),
    ], "mg_ev6")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_z FROM mg_ev6 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(z.*) AS n_z
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN ((a? b?)+ z)
          DEFINE a AS a.event_type = 'a', b AS b.event_type = 'b',
                 z AS z.event_type = 'z'
        )""")
    # the group needs >= 1 one-row repetition and no a/b row exists
    assert out.collect() == []


def test_group_all_rows_classifier(spark):
    """ALL ROWS PER MATCH over a group: each row classifies as the
    CHILD that consumed it, and running counts see child variables."""
    _view(spark, [
        (1, 1, "view", 0.0), (1, 2, "click", 1.0), (1, 3, "purchase", 2.0),
        (1, 4, "click", 3.0), (1, 5, "purchase", 4.0),
    ], "mg_ev7")
    out = execute_match_recognize(spark, """
        SELECT ts_us, cls, run_c, fin_p FROM mg_ev7 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES CLASSIFIER() AS cls, COUNT(c.*) AS run_c,
                   FINAL COUNT(p.*) AS fin_p
          ALL ROWS PER MATCH
          PATTERN (v (c p)+)
          DEFINE v AS v.event_type = 'view', c AS c.event_type = 'click',
                 p AS p.event_type = 'purchase'
        )""")
    assert sorted(map(tuple, out.collect())) == [
        (1, "V", 0, 2), (2, "C", 1, 2), (3, "P", 1, 2),
        (4, "C", 2, 2), (5, "P", 2, 2),
    ]


def test_group_within_window(spark):
    """WITHIN bounds the whole match including every repetition."""
    _view(spark, [
        (1, 0, "view", 0.0),
        (1, 1_000_000, "click", 1.0), (1, 2_000_000, "purchase", 2.0),
        (1, 30_000_000, "click", 3.0), (1, 31_000_000, "purchase", 4.0),
    ], "mg_ev8")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_p FROM mg_ev8 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(p.*) AS n_p
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN (v (c p)+) WITHIN INTERVAL '10' SECOND
          DEFINE v AS v.event_type = 'view', c AS c.event_type = 'click',
                 p AS p.event_type = 'purchase'
        )""")
    # the second pair is outside view@0's 10s window -> one pair only
    assert sorted(map(tuple, out.collect())) == [(1, 1)]


# --------------------------------------------------------- streaming


def test_group_streaming_matches_batch(spark, tmp_path):
    """The streaming twin (watermark-gated buffered NFA) converges to
    the batch result over a phased file stream — matches decided as
    their rows close, per-child segments registered from the gout
    side channel."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    rows_files = [
        [(1, 1, "view", 0), (1, 2, "click", 2), (1, 3, "purchase", 3)],
        [(1, 4, "click", 4), (1, 5, "purchase", 5), (2, 1, "view", 0)],
        [(1, 6, "x", 0), (2, 2, "click", 6), (2, 3, "purchase", 7)],
        [(9999, 10_000_000, "x", 0)],
    ]
    src = tmp_path / "mg_src"
    src.mkdir()
    base = _time.time()
    seen: set = set()
    for i, rows in enumerate(rows_files):
        spark.createDataFrame(
            rows,
            "user_id bigint, sec bigint, event_type string, cents bigint",
        ).repartition(1).write.mode("append").parquet(str(src))
        for f in os.listdir(str(src)):
            if f.endswith(".parquet") and f not in seen:
                seen.add(f)
                os.utime(os.path.join(str(src), f), (base + i, base + i))
    (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .select(
            "user_id",
            F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
            (F.col("sec") * 1_000_000).alias("ts_us"),
            "event_type",
            "cents",
        )
        .createOrReplaceTempView("mg_stream")
    )
    out = execute_match_recognize(spark, """
        SELECT user_id, n_p, sum_c FROM mg_stream MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES COUNT(p.*) AS n_p, SUM(c.cents) AS sum_c
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN (v (c p)+)
          DEFINE v AS v.event_type = 'view', c AS c.event_type = 'click',
                 p AS p.event_type = 'purchase'
        )""")
    q = (
        out.writeStream.format("memory")
        .queryName("mg_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "mg_ckpt"))
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(
        (r.user_id, r.n_p, r.sum_c)
        for r in spark.table("mg_stream_out").collect()
    )
    # u1: two pairs (clicks 2+4 cents), closed by the x row; u2: one
    # pair, closed by the sentinel's watermark (final group step is
    # conservatively growable, so u2 emits only once rows AFTER its
    # purchase close — the sentinel provides none for u2's key, but
    # u2's purchase is not the key's last closed row? it IS -> u2
    # defers forever and does NOT emit
    assert got == [(1, 2, 6)]


# ----------------------------------------------------------- PERMUTE


def test_permute_both_orders_batch(spark):
    """``v PERMUTE(c, e) p``: click and error in EITHER order between
    the view and the purchase; a missing member fails the block."""
    _view(spark, [
        (1, 1, "view", 0.0), (1, 2, "click", 1.0), (1, 3, "error", 2.0),
        (1, 4, "purchase", 3.0),
        (2, 1, "view", 0.0), (2, 2, "error", 5.0), (2, 3, "click", 6.0),
        (2, 4, "purchase", 7.0),
        (3, 1, "view", 0.0), (3, 2, "click", 1.0), (3, 3, "purchase", 2.0),
    ], "mp_ev1")
    out = execute_match_recognize(spark, """
        SELECT user_id, c_us, e_us, p_us FROM mp_ev1 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES LAST(c.ts_us) AS c_us, LAST(e.ts_us) AS e_us,
                   LAST(p.ts_us) AS p_us
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN (v PERMUTE(c, e) p)
          DEFINE v AS v.event_type = 'view', c AS c.event_type = 'click',
                 e AS e.event_type = 'error', p AS p.event_type = 'purchase'
        )""")
    assert sorted(map(tuple, out.collect())) == [
        (1, 2, 3, 4), (2, 3, 2, 4),
    ]


def test_permute_preference_order(spark):
    """Overlapping member predicates: orderings are tried in the
    LISTED lexicographic order (SQL:2016's expansion order), so the
    first listed member claims the first row."""
    _view(spark, [
        (1, 1, "x", 0.0), (1, 2, "x", 0.0),
    ], "mp_ev2")
    out = execute_match_recognize(spark, """
        SELECT ts_us, cls FROM mp_ev2 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES CLASSIFIER() AS cls
          ALL ROWS PER MATCH
          PATTERN (PERMUTE(a, b))
          DEFINE a AS a.event_type = 'x', b AS b.event_type = 'x'
        )""")
    assert sorted(map(tuple, out.collect())) == [(1, "A"), (2, "B")]


def test_permute_quantified_member(spark):
    """A quantified member (``c+``) keeps its greedy run inside
    whichever ordering admits a match."""
    _view(spark, [
        (1, 1, "error", 0.0), (1, 2, "click", 1.0), (1, 3, "click", 2.0),
        (1, 4, "purchase", 0.0),
    ], "mp_ev3")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_c, e_us FROM mp_ev3 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(c.*) AS n_c, LAST(e.ts_us) AS e_us
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN (PERMUTE(c+, e) p)
          DEFINE c AS c.event_type = 'click', e AS e.event_type = 'error',
                 p AS p.event_type = 'purchase'
        )""")
    assert sorted(map(tuple, out.collect())) == [(1, 2, 1)]


def test_permute_rejections(spark):
    base = """SELECT * FROM t MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts_us
      MEASURES COUNT(b.*) AS n ONE ROW PER MATCH
      PATTERN ({pat})
      DEFINE {defs})"""
    # round 12: quantified PERMUTE is now a supported extension — the
    # quantifier parses onto the block's repetition bounds
    spec = parse_match_recognize(
        base.format(pat="a PERMUTE(b, c)+", defs="a AS a.price > 0"), COLS)
    pstep = spec.steps[1]
    assert pstep.perm and (pstep.lo, pstep.hi) == (1, None)
    # factorial-cost guard: >6 PERMUTE members refuse at parse time
    with pytest.raises(ValueError, match="factorial"):
        parse_match_recognize(
            base.format(pat="PERMUTE(b, c, d, e, f, g, h)",
                        defs="b AS b.price > 0"), COLS)
    with pytest.raises(ValueError, match="alternation/grouping"):
        parse_match_recognize(
            base.format(pat="a PERMUTE(b, c)", defs="a AS a.price > 0"),
            COLS, strict_compat=True)
    with pytest.raises(ValueError, match="sequence groups cannot"):
        parse_match_recognize(
            base.format(pat="a PERMUTE(b, c)",
                        defs="b AS b.price > AVG(a.price)"), COLS)
    with pytest.raises(ValueError, match="repeated pattern variables"):
        parse_match_recognize(
            base.format(pat="b PERMUTE(b, c)", defs="b AS b.price > 0"),
            COLS)

# ------------------------------------------- quantified PERMUTE (r12)


def test_permute_quantified_greedy_preference(spark):
    """``v PERMUTE(c, e){1,2} p``: greedy prefers TWO {click,error}
    pairs — each repetition picking its order independently — and
    falls back to one pair when the longer form cannot complete."""
    _view(spark, [
        # user 1: two pairs in different orders -> one 2-rep match
        (1, 1, "view", 0.0), (1, 2, "click", 1.0), (1, 3, "error", 2.0),
        (1, 4, "error", 3.0), (1, 5, "click", 4.0), (1, 6, "purchase", 5.0),
        # user 2: one pair then purchase -> 1-rep match
        (2, 1, "view", 0.0), (2, 2, "error", 1.0), (2, 3, "click", 2.0),
        (2, 4, "purchase", 3.0),
        # user 3: two pairs but NO purchase after either form -> no match
        (3, 1, "view", 0.0), (3, 2, "click", 1.0), (3, 3, "error", 2.0),
        (3, 4, "click", 3.0), (3, 5, "error", 4.0), (3, 6, "view", 5.0),
    ], "mpq_ev1")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_c, last_c_us, p_us FROM mpq_ev1 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(c.*) AS n_c, LAST(c.ts_us) AS last_c_us,
                   LAST(p.ts_us) AS p_us
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN (v PERMUTE(c, e){1,2} p)
          DEFINE v AS v.event_type = 'view', c AS c.event_type = 'click',
                 e AS e.event_type = 'error', p AS p.event_type = 'purchase'
        )""")
    assert sorted(map(tuple, out.collect())) == [
        (1, 2, 5, 6),  # greedy: both pairs, last click at ts 5
        (2, 1, 3, 4),
    ]


def test_permute_quantified_rep_backtracking(spark):
    """Greedy tries two repetitions first; when the suffix fails it
    backtracks to one repetition AND the purchase consumes the row the
    second repetition would have started at."""
    _view(spark, [
        # pair, then {click, purchase}: rep2 = PERMUTE needs c AND e,
        # only c present -> backtrack to 1 rep, p at ts 4? no: row 4 is
        # click, not purchase -> p must match at rn+3 = ts 4 -> fails;
        # NFA advances: no match for this view
        (1, 1, "view", 0.0), (1, 2, "click", 1.0), (1, 3, "error", 2.0),
        (1, 4, "click", 3.0), (1, 5, "purchase", 4.0),
    ], "mpq_ev2")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_c FROM mpq_ev2 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(c.*) AS n_c
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN (v PERMUTE(c, e){1,2} p)
          DEFINE v AS v.event_type = 'view', c AS c.event_type = 'click',
                 e AS e.event_type = 'error', p AS p.event_type = 'purchase'
        )""")
    # contiguity: the stray click between pair1 and the purchase breaks
    # both the 2-rep and the 1-rep form
    assert out.collect() == []


def test_single_member_group_and_permute(spark):
    """Degenerate single-member forms ``(A+)`` and ``PERMUTE(A)`` are
    accepted as the plain variable (round-12 ADVICE fix: they used to
    surface the generic "unsupported PATTERN token '('" error)."""
    _view(spark, [
        (1, 1, "click", 0.0), (1, 2, "click", 1.0), (1, 3, "view", 2.0),
    ], "msg_ev1")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_c FROM msg_ev1 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(c.*) AS n_c ONE ROW PER MATCH
          PATTERN ((c+))
          DEFINE c AS c.event_type = 'click'
        )""")
    assert sorted(map(tuple, out.collect())) == [(1, 2)]
    out2 = execute_match_recognize(spark, """
        SELECT user_id, n_c FROM msg_ev1 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(c.*) AS n_c ONE ROW PER MATCH
          PATTERN (PERMUTE(c))
          DEFINE c AS c.event_type = 'click'
        )""")
    # PERMUTE member default quantifier is exactly-one -> two matches
    assert sorted(map(tuple, out2.collect())) == [(1, 1), (1, 1)]


def test_single_member_group_collapses_to_plain_variable(spark):
    """The degenerate forms collapse at PARSE time to the plain
    variable (not a 1-child sub-NFA), so match-state-dependent
    DEFINEs — rejected for real groups — still work on them."""
    spec = parse_match_recognize(
        """SELECT * FROM t MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(b.*) AS n ONE ROW PER MATCH
          PATTERN (a (b+))
          DEFINE a AS a.price > 0, b AS b.price > LAST(a.price))""",
        COLS)
    bstep = spec.steps[1]
    assert bstep.group is None and (bstep.lo, bstep.hi) == (1, None)
    assert bstep.dyn is not None  # dyn DEFINE survived the collapse
    _view(spark, [
        (1, 1, "view", 1.0), (1, 2, "click", 2.0), (1, 3, "click", 3.0),
        (1, 4, "click", 0.5),
    ], "msg_ev2")
    out = execute_match_recognize(spark, """
        SELECT user_id, n_b FROM msg_ev2 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts_us
          MEASURES COUNT(b.*) AS n_b ONE ROW PER MATCH
          PATTERN (a (b+))
          DEFINE a AS a.event_type = 'view', b AS b.price > LAST(a.price)
        )""")
    # b extends while price > the view's 1.0: rows at ts 2,3 only
    assert sorted(map(tuple, out.collect())) == [(1, 2)]
