"""Late-data side outputs — Flink's ``sideOutputLateData`` analog.

Flink windowed aggregations route rows older than the watermark to a
side output (``OutputTag``) instead of silently dropping them. Spark's
windowed aggregates drop late rows with no hook, so the side output is
built one operator EARLIER: a stateful pass that reads the batch's
watermark (``state.getCurrentWatermarkMs()`` — the same value the
downstream aggregate would filter on) and tags every row on-time/late.
Downstream, ``late = 1`` rows are the side output (retry queue, audit
sink, metrics) and ``late = 0`` rows feed the aggregate — exactly the
Flink topology, with the tag column standing in for the OutputTag.

Determinism: lateness depends on micro-batch boundaries. In
production that is inherent (lateness IS a property of arrival order);
for the oracle-checked contract query the batch boundaries are pinned
by writing the source as K files processed one per micro-batch
(``maxFilesPerTrigger = 1``, file order pinned via mtime), so the
watermark progression — and therefore every row's tag — is a pure
function of the data, restated exactly in SQL.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: output schema of :func:`tag_late_rows` with the default columns
TAGGED_SCHEMA = "user_id bigint, ts_us bigint, late int"


def tag_late_rows(
    sdf: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Tag each row late/on-time against the batch's watermark.

    The input must carry ``ts_col`` (event time, epoch micros, bigint)
    and have a watermark defined upstream. A row is late when its
    ms-floored event time is below the current watermark — the
    identical comparison Spark's stateful operators use to drop rows,
    one operator early. State is unused (the stateful form is what
    exposes the watermark to Python); NoTimeout, nothing stored.

    The output schema is derived from ``key_col``/``ts_col``/
    ``passthrough`` and the input's own types, so non-default columns
    work (round-2 advice: the columns were hardcoded to the contract
    query's ``user_id``/``ts_us`` despite the generic signature).

    Scale note: ``applyInPandasWithState`` hands Python ONE pandas
    frame PER KEY per batch, so keying on a high-cardinality column
    pays per-key Arrow overhead for no benefit — the watermark is
    global to the batch, not per key. For pure tagging, key on a
    bounded bucket (e.g. ``pmod(hash(id), 64)``) and list the real
    id in ``passthrough``.
    """
    passthrough = [c for c in (passthrough or []) if c != key_col]
    dtypes = dict(sdf.dtypes)
    for col in (key_col, ts_col, *passthrough):
        if col not in dtypes:
            raise ValueError(f"tag_late_rows: input lacks column {col!r}")
    if dtypes[ts_col] != "bigint":
        raise ValueError(
            f"tag_late_rows: {ts_col!r} must be epoch-micros bigint, got {dtypes[ts_col]}"
        )
    out_cols = [key_col, *passthrough]
    schema = (
        ", ".join(f"{c} {dtypes[c]}" for c in out_cols)
        + f", {ts_col} bigint, late int"
    )

    def fn(
        key: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        wm_ms = state.getCurrentWatermarkMs()
        for pdf in batches:
            out = pdf[[*out_cols, ts_col]].copy()
            out["late"] = ((pdf[ts_col] // 1000) < wm_ms).astype("int32")
            yield out

    return sdf.groupBy(key_col).applyInPandasWithState(
        fn,
        schema,
        "unused int",
        "append",
        GroupStateTimeout.NoTimeout,
    )
