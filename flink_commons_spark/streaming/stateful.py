"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for stream semantics Spark's built-in operators can't
express (Flink's ``KeyedProcessFunction`` analog). State lives in the
state store (checkpointed, partitioned by key, spill-backed); the
Python side sees Arrow batches per key group — no per-row Python
round-trips.

``running_user_stats`` is the demonstrator: a per-key running
aggregate (event count, value sum, last event time) emitted once per
micro-batch per active key — the shape of a feature-store updater or
an online counter, neither of which maps onto windowed aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of :func:`running_user_stats`
OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_epoch bigint"
#: state tuple layout: (n_events, total_value, last_epoch)
STATE_SCHEMA = "n bigint, total double, last_epoch bigint"


def _update_user_stats(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, total, last_epoch) = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_epoch = max(last_epoch, int(pdf["epoch"].max()))
    state.update((n, total, last_epoch))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_epoch": [last_epoch],
        }
    )


#: output schema of :func:`continuous_topn`
TOPN_OUTPUT_SCHEMA = "grp string, rnk int, item bigint, n bigint"
#: state layout: the per-item tallies for one group key
TOPN_STATE_SCHEMA = "items array<bigint>, counts array<bigint>"


def continuous_topn(sdf: DataFrame, grp_col: str, item_col: str, n: int) -> DataFrame:
    """Flink SQL's continuous Top-N (``ROW_NUMBER() OVER (PARTITION BY
    grp ORDER BY cnt DESC) WHERE rn <= N``) — Spark has no streaming
    rank, so the rank is maintained in keyed state.

    Emits, per micro-batch and per active group, the current top-``n``
    items by exact integer event count (ties broken by item id — fully
    deterministic, no float ever ranks). Pair with a keyed upsert sink
    on ``(grp, rnk)`` so later batches overwrite earlier ranks — the
    update-mode retraction analog.

    Scale posture: state per group is its per-item tally — the same
    O(distinct items) a Flink top-N-over-aggregate keeps in its
    upstream agg operator — partitioned across the cluster by group
    key, spill-backed in the state store; only ``n`` rows per group
    cross to the sink each batch. Item-skewed groups shard by the
    grouping key, not the item.
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        items, counts = state.get if state.exists else ([], [])
        tally = dict(zip(items, counts))
        for pdf in batches:
            for item, c in pdf[item_col].value_counts().items():
                item = int(item)
                tally[item] = tally.get(item, 0) + int(c)
        state.update((list(tally.keys()), list(tally.values())))
        top = sorted(tally.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        yield pd.DataFrame(
            {
                "grp": [str(key[0])] * len(top),
                "rnk": pd.array(range(1, len(top) + 1), dtype="int32"),
                "item": [i for i, _ in top],
                "n": [c for _, c in top],
            }
        )

    return (
        sdf.select(F.col(grp_col).alias("grp"), F.col(item_col).alias(item_col))
        .groupBy("grp")
        .applyInPandasWithState(
            update,
            outputStructType=TOPN_OUTPUT_SCHEMA,
            stateStructType=TOPN_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats(sdf: DataFrame) -> DataFrame:
    """Streaming per-user running stats over (user_id, value, epoch).

    Input must have columns ``user_id`` (bigint), ``value`` (double),
    ``epoch`` (bigint seconds). Emits the updated running aggregate for
    every key that saw data in the micro-batch (update semantics).
    State is one 24-byte tuple per key — O(distinct keys), partitioned
    across the cluster by the grouping key.
    """
    return (
        sdf.select("user_id", "value", "epoch")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: output schema of :func:`running_over_rows`
OVER_OUTPUT_SCHEMA = (
    "event_id bigint, user_id bigint, running_n bigint, running_cents bigint"
)
#: state layout: totals carried across micro-batches
OVER_STATE_SCHEMA = "n bigint, cents bigint"


def running_over_rows(sdf: DataFrame) -> DataFrame:
    """Streaming OVER aggregation — Flink SQL's event-time ``ROWS
    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`` window on a stream,
    which Spark's built-in streaming has no operator for (batch OVER is
    unsupported on streams). Each input row is emitted exactly once
    with its per-key running count and running exact-cents sum; rows
    are ordered (ord_us, event_id) inside each micro-batch — the same
    sort Flink's over-window operator performs when the watermark
    fires — and the carried state is two bigints per key.

    Input columns: ``event_id``, ``user_id``, ``ord_us`` (event-time
    micros, the ORDER BY key), ``cents`` (bigint). Per-row emission
    makes this append-mode: pair with any append sink.

    Scale posture: state is O(distinct keys) × 16 bytes, partitioned by
    key; per batch the work is one in-memory sort of that key's batch
    slice (bounded by batch size, not history) — identical cost shape
    to Flink's RowTimeRangeUnboundedPrecedingFunction.
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["ord_us", "event_id"], kind="mergesort")
        run_cents = pdf["cents"].astype("int64").cumsum() + cents
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"].astype("int64"),
                "user_id": pd.array([key[0]] * len(pdf), dtype="int64"),
                "running_n": pd.array(
                    range(n + 1, n + len(pdf) + 1), dtype="int64"
                ),
                "running_cents": run_cents.astype("int64"),
            }
        )
        state.update((n + len(pdf), int(run_cents.iloc[-1]) if len(pdf) else cents))
        yield out

    return (
        sdf.select("event_id", "user_id", "ord_us", "cents")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OVER_OUTPUT_SCHEMA,
            stateStructType=OVER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
