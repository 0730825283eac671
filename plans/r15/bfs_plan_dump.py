"""Dump the DISTRIBUTED bfs_distances plan (local_threshold=0) on the
graph_bfs_hops frames — before/after the per-hop frontier checkpoint."""
import contextlib, io, os, sys
repo, tag = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
os.environ.setdefault("SPARK_GRAFT_SCRATCH_DIR", "/dev/shm")
os.chdir(repo)
from pyspark.sql import SparkSession, functions as F
from flink_commons_spark import catalog
from flink_commons_spark.operators.graph import bfs_distances
sf_dir = "/root/testdata/sf0.1"
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
_t = catalog._t
li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
edges = (li.join(o, li.l_orderkey == o.o_orderkey)
    .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    .select(c.c_nationkey.alias("src"), s.s_nationkey.alias("dst"))
    .where(F.col("src") != F.col("dst")).distinct()
    .localCheckpoint(eager=False))
nodes = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("node"))
source = (edges.groupBy("src").agg(F.count("*").alias("deg"))
    .orderBy(F.desc("deg"), "src").limit(1).select("src"))
res = bfs_distances(nodes, edges, source, local_threshold=0)
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    res.explain("formatted")
out = f"/root/repo/plans/r15/bfs_distributed_{tag}.txt"
with open(out, "w") as f:
    f.write(f"# bfs_distances(local_threshold=0) over graph_bfs_hops frames"
            f" — tree={repo} tag={tag}, sf0.1\n")
    f.write(buf.getvalue())
rows = {r.node: r.hops for r in res.collect()}
print("wrote", out, "result_card=", len(rows), "sample=", sorted(rows.items())[:4])
