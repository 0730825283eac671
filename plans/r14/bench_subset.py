"""Dev tool (r14): time a named subset of catalog queries with the
bench.py protocol (1 warm + min-of-2) without running all 218.

Usage: python plans/r14/bench_subset.py q_match_vshape q_match_skip_to_first ...
       python plans/r14/bench_subset.py @match    (the whole q_match family)
       python plans/r14/bench_subset.py @stream_match
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
if "SPARK_GRAFT_SCRATCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
    os.environ["SPARK_GRAFT_SCRATCH_DIR"] = "/dev/shm"

from pyspark.sql import SparkSession

from flink_commons_spark import catalog

names = []
for a in sys.argv[1:]:
    if a == "@match":
        names.extend(n for n in catalog.QUERIES if n.startswith("q_match"))
    elif a == "@stream_match":
        names.extend(n for n in catalog.QUERIES if n.startswith("stream_match"))
    elif a.startswith("@"):
        names.extend(n for n in catalog.QUERIES if n.startswith(a[1:]))
    else:
        names.append(a)

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("bench-subset")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

catalog.QUERIES["q_minute_agg"](spark, sf_dir).count()
spark.catalog.clearCache()

def _unload(spark):
    try:
        spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    except Exception:
        pass

timings = {}
total = 0.0
for name in names:
    fn = catalog.QUERIES[name]
    try:
        fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(round(time.perf_counter() - t0, 3))
    except Exception as exc:
        print(f"{name} FAILED: {exc}")
        timings[name] = -1.0
        continue
    finally:
        spark.catalog.clearCache()
        _unload(spark)
    dt = min(runs)
    timings[name] = dt
    total += dt
    print(f"{name}: {dt:.2f}s {runs} rows={n}", flush=True)

print(json.dumps({"total": round(total, 2), "queries": timings}))
