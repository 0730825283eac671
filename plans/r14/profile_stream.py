"""Dev tool (r14): per-micro-batch breakdown of streaming queries.

Monkeypatches catalog._await_stream to capture query.recentProgress
(durationMs: addBatch/getBatch/walCommit/..., stateOperators commit
times) for each named catalog query, then prints a per-batch table.

Usage: python plans/r14/profile_stream.py stream_match_recognize stream_sessions
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
if "SPARK_GRAFT_SCRATCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
    os.environ["SPARK_GRAFT_SCRATCH_DIR"] = "/dev/shm"

from pyspark.sql import SparkSession

from flink_commons_spark import catalog

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("profile-stream")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# warmups copied from bench.py (session + Arrow worker pool)
catalog.QUERIES["q_minute_agg"](spark, sf_dir).count()
spark.catalog.clearCache()
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def _warm(x):
    import numpy as np

    return x * np.float64(0.0)


spark.range(0, 256, 1, int(cpus)).select(_warm("id")).count()
spark.catalog.clearCache()

orig_await = catalog._await_stream
captured = []


def spy(query, *a, **k):
    r = orig_await(query, *a, **k)
    try:
        captured.append([json.loads(p.json) for p in query.recentProgress])
    except Exception as exc:
        print("progress capture failed:", exc, file=sys.stderr)
    return r


catalog._await_stream = spy

for name in sys.argv[1:]:
    fn = catalog.QUERIES[name]
    # 1 warm + 2 timed like the bench
    fn(spark, sf_dir).count()
    spark.catalog.clearCache()
    try:
        from flink_commons_spark import catalog as _c
        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    except Exception:
        pass
    times = []
    for _ in range(2):
        captured.clear()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        try:
            jvm = spark._jvm
            jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        except Exception:
            pass
    print(f"\n=== {name}: wall {[round(t,2) for t in times]} ===")
    for qi, plist in enumerate(captured):
        for p in plist:
            dm = p.get("durationMs", {})
            so = p.get("stateOperators", [])
            so_txt = "; ".join(
                f"rows={s.get('numRowsTotal')} commit={s.get('commitTimeMs')}ms "
                f"procTime={s.get('allUpdatesTimeMs')}+{s.get('allRemovalsTimeMs')}ms"
                for s in so
            )
            print(
                f"  q{qi} batch {p['batchId']}: rows={p.get('numInputRows')} "
                f"trigger={dm.get('triggerExecution')}ms addBatch={dm.get('addBatch')}ms "
                f"getBatch={dm.get('getBatch')}ms latestOffset={dm.get('latestOffset')}ms "
                f"queryPlanning={dm.get('queryPlanning')}ms walCommit={dm.get('walCommit')}ms "
                f"commitOffsets={dm.get('commitOffsets')}ms | {so_txt}"
            )
