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
from pyspark.sql import DataFrame
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
