"""Dev tool (r14): capture .explain('formatted') for named batch
catalog queries into plans/r14/<query>_<tag>.txt.

Usage: python plans/r15/capture_plans.py <repo_root> <tag> q1 q2 ...
  repo_root: /root/repo (after) or /tmp/r14_before (before)
  tag:       'before' | 'after'

Streaming catalog queries execute eagerly and return a sink-read
frame; for those this captures the sink-read plan plus a note — the
per-micro-batch evidence lives in the profile_stream outputs.
"""
import io
import contextlib
import os
import sys

repo = sys.argv[1]
tag = sys.argv[2]
names = sys.argv[3:]
sys.path.insert(0, repo)
os.environ.setdefault("SPARK_GRAFT_SCRATCH_DIR", "/dev/shm")

from pyspark.sql import SparkSession

from flink_commons_spark import catalog

sf_dir = "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .appName("capture-plans")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

out_dir = "/root/repo/plans/r15"
for name in names:
    df = catalog.QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(
            f"# {name} — .explain('formatted'), tree={repo} tag={tag}, "
            f"sf0.1, AQE on\n"
        )
        f.write(buf.getvalue())
    print("wrote", path)
