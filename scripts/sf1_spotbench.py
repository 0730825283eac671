"""Spot-bench the heaviest contract queries at sf1 (10x sf0.1).

Validates the two scale claims PERFORMANCE.md makes from plan
inspection: wall-time grows ~linearly with input (no super-linear
blow-up hiding in a candidate-pair explosion or a window), and no
plan flips to nested-loop/cartesian or driver-side execution at the
bigger size. Run ``scripts/gen_sf1.py`` first.

Usage::

    python scripts/sf1_spotbench.py [sf1_dir]

Prints one markdown table row per query (sf0.1 s, sf1 s, ratio) and a
JSON line; asserts no nested-loop/cartesian appears in any sf1 batch
plan outside the documented bounded-broadcast allowlist.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the bench tail at sf0.1 (round-2 profile) + representative TPC-H /
# text / similarity heavies
HEAVY = [
    "q1_pricing_summary",
    "q9_product_profit",
    "q18_large_orders",
    "q_sessionize",
    "dedup_minhash",
    "dedup_nearest",
    "dedup_apply",
    "dedup_clusters",
    "dedup_embedding",
    "text_tfidf",
    "ann_lsh",
    "stream_exact_uv",
    "stream_interval_join",
    "stream_late_side_output",
    # round-3 additions / optimizations
    "dedup_ngram",
    "q_match_recognize",
    "ann_pq",
    "emb_pq_stats",
    "dedup_substring",
    "dsir_select",
    # round-3 late additions
    "dedup_minhash_recall",
    "dedup_semantic",
    "q_cooccurrence",
    "graph_pagerank",
    "graph_triangles",
    "text_bpe_merges",
    "q_scd2_intervals",
    "q_snapshot_diff",
    "q_survivorship",
    "stream_over_rows",
    "stream_partitioned_sink",
    # round-4 additions
    "pq_trained_recall",
    "pq_rerank_recall",
    "ivf_trained_recall",
    "graph_cc_chain",
    # round-7 additions (MATCH_RECOGNIZE SQL front door, batch + stream)
    "q_match_vshape",
    "q_match_measures",
    "stream_match_vshape",
    "stream_match_recognize_sql",
]

# same shapes the plan-quality test allows: bounded 1-row-scalar or
# probe-set broadcasts legitimately plan as BroadcastNestedLoopJoin
NLJ_ALLOWED = {"ann_pq", "dedup_nearest", "dedup_apply", "knn_brute", "ann_lsh",
               "ann_recall", "ivf_recall", "q18_large_orders",
               "pq_trained_recall", "pq_rerank_recall", "ivf_trained_recall"}


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".localdata" / "sf1"
    )
    sf01_dir = "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    from flink_commons_spark import catalog

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("sf1-spotbench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        # q_recursive_cte is row-bounded but crosses the 1M default guard ~sf0.5
        .config("spark.sql.cteRecursionRowLimit", "500000000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog.QUERIES["q_minute_agg"](spark, sf01_dir).count()  # session warmup

    def timed(name: str, sf_dir: str) -> tuple[float, str]:
        fn = catalog.QUERIES[name]
        fn(spark, sf_dir).count()  # warm pass (codegen/JIT)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.count()
        dt = time.perf_counter() - t0
        plan = ""
        if not name.startswith("stream_"):
            plan = df._jdf.queryExecution().executedPlan().toString()
            plan = plan.split("== Initial Plan ==")[0]
        spark.catalog.clearCache()
        return dt, plan

    rows = []
    flips = []
    for name in HEAVY:
        t01, _ = timed(name, sf01_dir)
        t1, plan1 = timed(name, sf1_dir)
        ratio = t1 / t01 if t01 > 0 else float("inf")
        nlj = plan1.count("BroadcastNestedLoopJoin") + plan1.count("CartesianProduct")
        if nlj and name not in NLJ_ALLOWED:
            flips.append(name)
        rows.append((name, round(t01, 2), round(t1, 2), round(ratio, 1)))
        print(f"| {name} | {t01:.2f} | {t1:.2f} | {ratio:.1f}x |", flush=True)

    print(json.dumps({
        "metric": "sf1_spotbench",
        "sf01_total": round(sum(r[1] for r in rows), 2),
        "sf1_total": round(sum(r[2] for r in rows), 2),
        "queries": {r[0]: {"sf0.1": r[1], "sf1": r[2], "ratio": r[3]} for r in rows},
        "plan_flips": flips,
    }))
    if flips:
        sys.exit(f"plan flips to nested-loop at sf1: {flips}")


if __name__ == "__main__":
    main()
