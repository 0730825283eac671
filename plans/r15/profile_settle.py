"""Dev tool (r15, bucketed): offline cProfile of the streaming MR settle path.

Captures the REAL per-key fn closure built by stream_match_pattern
(by intercepting applyInPandasWithState) while the catalog query runs
once, then drives fn over the same per-key frames with a fake
GroupState — batch-0 buffering pass and batch-1 timer settle pass —
single-threaded, so the Python-side per-key cost is separable from
the Arrow/state-transport cost Spark adds around it.

Usage: python plans/r15/profile_settle.py stream_match_vshape_sql
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SCRATCH_DIR", "/dev/shm")

import pandas as pd

from pyspark.sql import SparkSession

import flink_commons_spark.streaming.cep_stream as cs
from flink_commons_spark import catalog

qname = sys.argv[1] if len(sys.argv) > 1 else "stream_match_vshape_sql"
sf_dir = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .appName("profile-settle")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

captured = {}
orig_smp = cs.stream_match_pattern
orig_smc = cs.stream_match_conversions


def _wrap(orig):
    def wrapper(sdf, *a, **k):
        real = {}

        class FGrouped:
            def applyInPandasWithState(self, fn, *fa, **fk):
                captured["fn"] = fn
                return real["g"].applyInPandasWithState(fn, *fa, **fk)

        class FSDF:
            def __init__(self, df):
                self._df = df

            def groupBy(self, *cols):
                captured["key_cols"] = [str(c) for c in cols]
                real["g"] = self._df.groupBy(*cols)
                return FGrouped()

            def __getattr__(self, name):
                attr = getattr(self._df, name)
                if callable(attr):
                    def passthrough(*pa, **pk):
                        out = attr(*pa, **pk)
                        from pyspark.sql import DataFrame as _DF

                        return FSDF(out) if isinstance(out, _DF) else out

                    return passthrough
                return attr

        return orig(FSDF(sdf), *a, **k)

    return wrapper


cs.stream_match_pattern = _wrap(orig_smp)
cs.stream_match_conversions = _wrap(orig_smc)

import flink_commons_spark.streaming.stateful as sst

sst.running_over_rows = _wrap(sst.running_over_rows)
sst.running_over_range = _wrap(sst.running_over_range)

# run the real catalog query once: captures fn and shows the sink rows
res = catalog.QUERIES[qname](spark, sf_dir)
n_out = res.count()
fn = captured["fn"]
key_cols = captured.get("key_cols", ["user_id"])
print(f"{qname}: captured fn, key_cols={key_cols}, sink rows={n_out}")

# rebuild the per-key input frames the keyed shuffle would deliver.
# The fn reads only the buffered columns; give it everything the
# source view carries. We re-derive the source frame from the temp
# view the query registered (mr_stream_events_src for SQL queries) or
# from events.parquet with the funnel harness's column names.
import numpy as np
from pyspark.sql import functions as F

ev = spark.read.parquet(f"{sf_dir}/events.parquet")
ev = catalog._norm_ts(ev)
src = ev.select(
    "user_id",
    "event_id",
    "event_type",
    F.expr("unix_micros(ts)").alias("ts_us"),
    F.expr("unix_micros(ts)").alias("__mr_enc_ts"),
    F.expr("unix_micros(ts)").alias("__mr_ous"),
    F.expr("unix_micros(ts)").alias("ord_us"),
    F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    F.col("value").cast("double").alias("val"),
)
# r15: the harnesses group on pmod(xxhash64(key), buckets) by default —
# group the offline frames the same way (bucket count = 4 x the
# 16-partition stream conf = 64)
src = src.withColumn(
    "__mr_bucket", F.pmod(F.xxhash64("user_id"), F.lit(64))
)
pdf = src.toPandas()
max_ts_us = int(pdf["ts_us"].max())
wm_settle = max_ts_us // 1000  # final watermark ms (same grid as Spark)


class FakeState:
    __slots__ = ("wm", "_val", "exists", "hasTimedOut", "timer")

    def __init__(self, wm, val=None, timed_out=False):
        self.wm = wm
        self._val = val
        self.exists = val is not None
        self.hasTimedOut = timed_out
        self.timer = None

    def getCurrentWatermarkMs(self):
        return self.wm

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v
        self.exists = True

    def remove(self):
        self._val = None
        self.exists = False

    def setTimeoutTimestamp(self, ms):
        self.timer = ms


grp_col = (
    "__mr_bucket" if captured.get("key_cols") == ["__mr_bucket"]
    else "user_id"
)
groups = list(pdf.groupby(grp_col, sort=False))
print(f"groups({grp_col}): {len(groups)}  rows: {len(pdf)}")


def run_all():
    n_matches = 0
    states = {}
    # batch 0: everything arrives, watermark 0
    for kv, sub in groups:
        st = FakeState(0)
        for _ in fn((kv,), iter([sub]), st):
            pass
        if st.exists:
            states[kv] = st._val
    # batch 1: timers fire at the final watermark
    for kv, val in states.items():
        st = FakeState(wm_settle, val=val, timed_out=True)
        for out in fn((kv,), iter([]), st):
            n_matches += len(out)
    return n_matches


t0 = time.perf_counter()
n = run_all()
dt = time.perf_counter() - t0
print(f"offline 2-pass settle: {n} match rows, wall {dt:.3f}s")

pr = cProfile.Profile()
pr.enable()
run_all()
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
ps.print_stats(30)
print(s.getvalue()[:7000])
