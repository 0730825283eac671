"""State-SIZE soak for the streaming CEP matcher — the mirror of the
OVER-pair soak: a slow watermark with many keys and permanently
undecided pattern tails must leave per-key NFA buffers bounded by the
WITHIN horizon, and keys whose windows have wholly closed must leave
the state store entirely. Measured through the progress listener's
``stateOperators.numRowsTotal`` (one state row per buffered key).

Scenario: two ACTIVITY WAVES of 25 keys each, hours apart in event
time. Every key runs one complete funnel (view click click purchase);
odd keys also leave a DANGLING ``view click`` tail with no purchase —
the permanently-undecided prefix that, without WITHIN, the matcher must
keep forever (batch consistency: a purchase could still arrive), and
that WITH WITHIN must be expired the moment the watermark passes the
tail's pattern window. A far-future sentinel closes the stream.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import tempfile
import time

from pyspark.sql import functions as F

WAVE_KEYS = 25
A_BASE = 100          # wave A funnel start seconds
B_BASE = 10_000       # wave B funnel start seconds
SENTINEL_SEC = 10_000_000
WITHIN_US = 60 * 1_000_000   # 1-minute pattern window
DELAY = "2 minutes"          # covers the shuffled in-wave disorder (~48 s)


def _wave(rng, key_base, t_base, id_base):
    rows = []
    eid = id_base
    for k in range(WAVE_KEYS):
        t0 = t_base + k  # stagger keys by a second
        for off, et in ((0, "view"), (3, "click"), (6, "click"),
                        (9, "purchase")):
            rows.append((eid, t0 + off, key_base + k, et))
            eid += 1
        if k % 2 == 1:  # dangling, never-completed funnel prefix
            rows.append((eid, t0 + 20, key_base + k, "view"))
            eid += 1
            rows.append((eid, t0 + 23, key_base + k, "click"))
            eid += 1
    rng.shuffle(rows)
    return rows


def _split(rng, rows, k):
    return [rows[i::k] for i in range(k)]


def _replay(spark, tmp_path, within_us, key_buckets=None):
    from flink_commons_spark.streaming.cep_stream import (
        stream_match_conversions,
    )

    rng = random.Random(11)
    files = (
        _split(rng, _wave(rng, 0, A_BASE, 0), 3)
        + _split(rng, _wave(rng, 1000, B_BASE, 100_000), 3)
        + [[(999_999, SENTINEL_SEC, 9999, "view")]]
    )
    schema = "event_id long, sec long, user_id long, event_type string"
    path = str(tmp_path / "cep_soak_events")
    base = time.time()
    seen = set()
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "append"
        ).parquet(path)
        for name in os.listdir(path):
            if name.endswith(".parquet") and name not in seen:
                seen.add(name)
                os.utime(os.path.join(path, name), (base + i, base + i))

    sdf = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .select(
            "event_id", "user_id", "event_type",
            F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
        )
        .withWatermark("ts", DELAY)
        .withColumn("ts_us", F.unix_micros("ts"))
    )
    emitted = []

    def sink(bdf, _epoch):
        emitted.extend(bdf.collect())

    q = (
        stream_match_conversions(
            sdf, within_us=within_us, key_buckets=key_buckets
        )
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="fcs-cepsoak-"))
        .start()
    )
    assert q.awaitTermination(180), "CEP soak replay timed out"
    return emitted, list(q.recentProgress)


def _state_rows(progress):
    ops = progress["stateOperators"]
    return ops[0]["numRowsTotal"] if ops else 0


def _wm_sec(progress):
    wm = (progress.get("eventTime") or {}).get("watermark")
    if not wm:
        return 0.0
    return dt.datetime.fromisoformat(wm.replace("Z", "+00:00")).timestamp()


def test_cep_within_state_tracks_horizon_not_lifetime_keys(spark, tmp_path):
    """With WITHIN, per-key buffers expire at window close: once the
    watermark passes wave A's last pattern window, its 25 keys must be
    OUT of the state store while wave B is live; at stream end only
    the sentinel's still-open row may remain. Lifetime keys = 51."""
    emitted, progresses = _replay(spark, tmp_path, WITHIN_US)
    # every key's funnel completes within the window -> 50 matches
    assert len(emitted) == 2 * WAVE_KEYS
    horizon = A_BASE + WAVE_KEYS + 23 + WITHIN_US / 1e6 + 1
    past_a = [
        p for p in progresses
        if _wm_sec(p) > horizon and p["stateOperators"]
    ]
    assert past_a, "no progress entry past wave A's horizon"
    for p in past_a:
        assert _state_rows(p) <= WAVE_KEYS + 1, (
            f"state {_state_rows(p)} rows at wm={_wm_sec(p)}s — wave A "
            "CEP buffers not reclaimed"
        )
    assert _state_rows(progresses[-1]) <= 1, (
        f"terminal state {_state_rows(progresses[-1])} rows — dangling "
        "tails survived their closed WITHIN windows"
    )
    peak = max(_state_rows(p) for p in progresses)
    print(f"cep within soak: peak state rows={peak}, "
          f"final={_state_rows(progresses[-1])}, lifetime keys=51")


def test_cep_unbounded_retains_undecided_tails(spark, tmp_path):
    """Without WITHIN the dangling ``view click`` tails are forever
    undecided — a future purchase could still complete them — so their
    keys legitimately stay in state. This pins the contrast the WITHIN
    soak relies on: 24 dangling keys + the sentinel remain terminal.
    ``key_buckets=0`` forces the per-key state layout so the exact
    state-row == key count identity is pinned (the default bucketed
    layout holds several keys per state row — its retention invariant
    is pinned by the bucketed twin below)."""
    emitted, progresses = _replay(spark, tmp_path, None, key_buckets=0)
    assert len(emitted) == 2 * WAVE_KEYS
    dangling = 2 * (WAVE_KEYS // 2)  # odd keys per wave
    assert _state_rows(progresses[-1]) == dangling + 1


def test_cep_unbounded_retains_undecided_tails_bucketed(spark, tmp_path):
    """The bucketed-state twin of the exact-retention test: the SAME
    matches must emit, and the dangling tails must still be retained —
    terminal state rows are occupied BUCKETS, so between 1 and
    dangling+1 rows remain (every retained key lives in some bucket;
    nothing retained would read 0). Forcing more buckets than keys
    recovers the per-key identity exactly."""
    emitted, progresses = _replay(spark, tmp_path, None, key_buckets=5000)
    assert len(emitted) == 2 * WAVE_KEYS
    dangling = 2 * (WAVE_KEYS // 2)
    # 5000 buckets >> 51 lifetime keys: collisions are possible but the
    # retained-key count can only be preserved or concentrated, never
    # grown — and with this spread the count matches per-key exactly
    # unless two retained keys collide, so allow a small collision slack
    rows = _state_rows(progresses[-1])
    assert dangling + 1 - 3 <= rows <= dangling + 1


def test_cep_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Kill the streaming CEP matcher after a partial drain, resume
    from the same checkpoint: the match set must equal a single
    uninterrupted run — no lost matches (buffered undecided prefixes
    and their re-armed timers survive in state) and no duplicates
    (consumed prefixes were dropped before the matches were
    committed). Guards the round-6 timer re-arm logic across
    restarts."""
    import time

    from pyspark.sql import functions as F

    from flink_commons_spark.streaming.cep_stream import (
        stream_match_conversions,
    )

    src = tmp_path / "cep_src"
    src.mkdir()
    rng = random.Random(23)
    files = (
        _split(rng, _wave(rng, 0, A_BASE, 0), 3)
        + _split(rng, _wave(rng, 1000, B_BASE, 100_000), 3)
        + [[(999_999, SENTINEL_SEC, 9999, "view")]]
    )
    schema = "event_id long, sec long, user_id long, event_type string"
    base = time.time()
    seen = set()
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "append"
        ).parquet(str(src))
        for name in os.listdir(str(src)):
            if name.endswith(".parquet") and name not in seen:
                seen.add(name)
                os.utime(os.path.join(str(src), name), (base + i, base + i))

    def build(sdf):
        return stream_match_conversions(
            sdf.select(
                "event_id", "user_id", "event_type",
                F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
            )
            .withWatermark("ts", DELAY)
            .withColumn("ts_us", F.unix_micros("ts")),
            within_us=WITHIN_US,
        )

    def start(ckpt, epochs, trigger_kwargs):
        sdf = (
            spark.readStream.schema(spark.read.parquet(str(src)).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return (
            build(sdf)
            .writeStream.outputMode("append")
            # keyed by Spark's committed epoch id — a batch replayed
            # after the kill OVERWRITES its pre-kill attempt, so sink
            # replay dedups while genuine engine double-emission (two
            # epochs emitting the same match) still survives to fail
            # the multiset compare below
            .foreachBatch(
                lambda b, e: epochs.__setitem__(int(e), b.collect())
            )
            .trigger(**trigger_kwargs)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # run 1: kill once >= 3 batches committed, mid-stream
    got_epochs: dict = {}
    ckpt = str(tmp_path / "cep_ckpt")
    q = start(ckpt, got_epochs, {"processingTime": "0 seconds"})
    deadline = time.time() + 120
    while time.time() < deadline:
        if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3:
            break
        time.sleep(0.2)
    assert q.isActive, "query drained before the kill point"
    q.stop()
    # run 2: resume from the same checkpoint with availableNow —
    # same epochs dict, so the replayed uncommitted epoch lands on its
    # original id
    q2 = start(ckpt, got_epochs, {"availableNow": True})
    assert q2.awaitTermination(180)
    # reference: one clean uninterrupted run
    ref_epochs: dict = {}
    q3 = start(
        tempfile.mkdtemp(prefix="fcs-cepref-"), ref_epochs,
        {"availableNow": True},
    )
    assert q3.awaitTermination(180)
    got = [r for _, rows in sorted(got_epochs.items()) for r in rows]
    ref = [r for _, rows in sorted(ref_epochs.items()) for r in rows]
    key = lambda r: (r.user_id, r.start_us, r.end_us, r.n_clicks)  # noqa: E731
    # MULTISET equality: epoch-keyed collection above already folded
    # legitimate foreachBatch replay, so any residual duplicate is the
    # engine emitting one match twice — which must fail
    from collections import Counter

    assert Counter(map(key, got)) == Counter(map(key, ref))
    assert len(ref) == 2 * WAVE_KEYS


def _vwave(rng, key_base, t_base, id_base):
    """Per key: a complete price V (10 8 7 9 12) plus, for odd keys, a
    dangling down-run tail (5 4) that stays undecided forever."""
    rows = []
    eid = id_base
    for k in range(WAVE_KEYS):
        t0 = t_base + k
        for off, price in ((0, 10.0), (3, 8.0), (6, 7.0), (9, 9.0),
                           (12, 12.0)):
            rows.append((eid, t0 + off, key_base + k, price))
            eid += 1
        if k % 2 == 1:
            rows.append((eid, t0 + 20, key_base + k, 5.0))
            eid += 1
            rows.append((eid, t0 + 23, key_base + k, 4.0))
            eid += 1
    rng.shuffle(rows)
    return rows


def test_stream_match_pattern_checkpoint_resume(spark, tmp_path):
    """Kill-and-resume for the GENERIC streaming matcher
    (``stream_match_pattern`` — dynamic buffer schema, PREV-navigating
    DEFINE callables, context rows): the resumed run's match set must
    equal one uninterrupted run. Odd keys emit their V (rows continue
    after it); even keys' V ends on the key's last closed row, so the
    greedy trailing ``up+`` stays correctly deferred and emits
    nothing — the count pins that rule across restarts too."""
    import pandas as pd
    from pyspark.sql import functions as F

    from flink_commons_spark.operators.cep import Step
    from flink_commons_spark.streaming.cep_stream import (
        stream_match_pattern,
    )

    src = tmp_path / "smp_src"
    src.mkdir()
    rng = random.Random(31)
    files = (
        _split(rng, _vwave(rng, 0, A_BASE, 0), 3)
        + _split(rng, _vwave(rng, 1000, B_BASE, 100_000), 3)
        + [[(999_999, SENTINEL_SEC, 9999, 1.0)]]
    )
    schema = "event_id long, sec long, user_id long, price double"
    base = time.time()
    seen = set()
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "append"
        ).parquet(str(src))
        for name in os.listdir(str(src)):
            if name.endswith(".parquet") and name not in seen:
                seen.add(name)
                os.utime(os.path.join(str(src), name), (base + i, base + i))

    steps = [
        Step("strt", lambda p: pd.Series(True, index=p.index)),
        Step("down", lambda p: p["price"] < p["price"].shift(1), plus=True),
        Step("up", lambda p: p["price"] > p["price"].shift(1), plus=True),
    ]

    def measures(key, segs):
        return {
            "user_id": int(key[0]),
            "start_us": int(segs["strt"]["ts_us"].iloc[0]),
            "end_us": int(segs["up"]["ts_us"].iloc[-1]),
            "n_down": int(len(segs["down"])),
            "n_up": int(len(segs["up"])),
        }

    def build(sdf):
        prepared = (
            sdf.select(
                "event_id", "user_id", "price",
                F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
            )
            .withWatermark("ts", DELAY)
            .withColumn("ts_us", F.unix_micros("ts"))
        )
        return stream_match_pattern(
            prepared,
            ["user_id"],
            ["ts_us", "event_id"],
            steps,
            measures,
            "user_id bigint, start_us bigint, end_us bigint, "
            "n_down bigint, n_up bigint",
            buffer_cols=[("ts_us", "bigint"), ("event_id", "bigint"),
                         ("price", "double")],
        )

    def start(ckpt, sink):
        sdf = (
            spark.readStream.schema(spark.read.parquet(str(src)).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return (
            build(sdf)
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, _e: sink.extend(b.collect()))
            .option("checkpointLocation", ckpt)
            .start()
        )

    got = []
    ckpt = str(tmp_path / "smp_ckpt")
    q = start(ckpt, got)
    deadline = time.time() + 120
    while time.time() < deadline:
        if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3:
            break
        time.sleep(0.2)
    assert q.isActive, "query drained before the kill point"
    q.stop()

    sdf = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q2 = (
        build(sdf)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: got.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    assert q2.awaitTermination(180)

    ref = []
    q3 = (
        build(
            spark.readStream.schema(spark.read.parquet(str(src)).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: ref.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="fcs-smpref-"))
        .start()
    )
    assert q3.awaitTermination(180)
    key = lambda r: (r.user_id, r.start_us, r.end_us,  # noqa: E731
                     r.n_down, r.n_up)
    # SET equality, not multiset: foreachBatch is AT-LEAST-ONCE across
    # a restart — a batch that ran but had not committed before the
    # kill replays on resume, so `got` may legitimately hold duplicates
    # of individually-unique rows (exactly-once is the idempotent
    # sink's job, and every emitted row here is key-unique)
    assert set(map(key, got)) == set(map(key, ref))
    # odd keys (tail rows follow the V) emit; even keys stay deferred
    assert len(ref) == 2 * (WAVE_KEYS // 2)
    assert all(r.n_down == 2 and r.n_up == 2 for r in ref)


def test_enc_buf_rejects_null_in_integer_buffer():
    """Packed int64 state cannot represent NULL: a nullable integer
    buffer column (arriving from Arrow as float64-with-NaN) must raise
    loudly instead of silently packing NaN as INT64_MIN."""
    import numpy as np
    import pandas as pd
    import pytest

    from flink_commons_spark.streaming.cep_stream import _dec_buf, _enc_buf

    ok = pd.Series([1, 2, 3], name="ts")
    assert np.frombuffer(_enc_buf(ok, "bigint"), dtype=np.int64).tolist() \
        == [1, 2, 3]
    with pytest.raises(ValueError, match="NULL in integer buffered"):
        _enc_buf(pd.Series([1.0, np.nan], name="cents"), "bigint")
    # float buffers round-trip NaN faithfully
    f = _dec_buf(_enc_buf(pd.Series([1.0, np.nan], name="v"), "double"),
                 "double")
    assert f[0] == 1.0 and np.isnan(f[1])
    # strings round-trip as lists, missing preserved as NA/None
    s = _dec_buf(_enc_buf(pd.Series(["a", None], name="et"), "string"),
                 "string")
    assert s[0] == "a" and pd.isna(s[1])


def test_stream_budget_exceeded_terminates_query(spark, tmp_path):
    """A :class:`MatchStepBudgetExceeded` raised mid-stream TERMINATES
    the streaming query with the named diagnostic (r12 verdict #6):
    the executor task fails, the microbatch job fails, and the query
    dies carrying the budget error — it does NOT retry the same
    microbatch forever. The failure mode of an adversarial pattern in
    a long-running pipeline is therefore a diagnosed dead query, never
    a silently pinned executor."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from flink_commons_spark.operators.cep import Step
    from flink_commons_spark.streaming.cep_stream import (
        stream_match_pattern,
    )

    src = tmp_path / "budget_src"
    src.mkdir()
    rows = [(i, 10 + i, 1, 1.0) for i in range(48)]
    rows.append((999, SENTINEL_SEC, 9999, 1.0))  # closes key 1's rows
    schema = "event_id long, sec long, user_id long, price double"
    spark.createDataFrame(rows, schema).repartition(1).write.mode(
        "append"
    ).parquet(str(src))

    def _true(p):
        return pd.Series(True, index=p.index)

    children = [Step("A", _true, plus=True), Step("B", _true, plus=True)]
    steps = [
        Step("(A B)", _true, quant=(1, None), group=children),
        Step("C", lambda p: pd.Series(False, index=p.index)),
    ]

    def measures(key, segs):  # unreachable — the budget fires first
        return {"user_id": int(key[0])}

    sdf = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    prepared = (
        sdf.select(
            "event_id", "user_id",
            F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
        )
        .withWatermark("ts", DELAY)
        .withColumn("ts_us", F.unix_micros("ts"))
    )
    out = stream_match_pattern(
        prepared, ["user_id"], ["ts_us", "event_id"], steps, measures,
        "user_id bigint",
        buffer_cols=[("ts_us", "bigint"), ("event_id", "bigint")],
        max_steps=5_000, pattern_desc="((A+ B+)+ C)",
    )
    got = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "budget_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception) as ei:
        q.awaitTermination(180)
    msg = str(ei.value) + "\n" + str(q.exception() or "")
    assert "max-steps" in msg and "(A+ B+)+ C" in msg
    assert not q.isActive  # terminated, not stuck retrying
    assert got == []       # nothing was emitted before the failure
