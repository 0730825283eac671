"""Generate a local sf1 dataset (~10x sf0.1, ~6M lineitem) for scale
spot-benching.

The driver ships sf0.001/0.01/0.1 only; the scale claims in
PERFORMANCE.md (linear wall-time, no plan flips) deserve at least one
measured 10x step. Each table is replicated 10x with consistent
per-domain key offsets (orderkey/custkey/partkey/suppkey/doc_id/
vec_id/event_id/user_id shift together), so every join keeps
referential integrity and per-replica results are independent —
workloads scale linearly in the input by construction, which is
exactly the property the spot-bench verifies wall-time against.
nation/region stay single-copy (dimensions; nationkey references are
unchanged). documents text is cloned verbatim: at sf1 every doc sits
in a 10-clone duplicate group, a *harder* dedup workload than organic
data (every LSH band bucket collides), which stresses the candidate
path the way a crawl corpus would.

Output layout mimics /root/testdata exactly (single-file
``<table>.parquet``) so ``SPARK_GRAFT_SF_DIR`` can point at it.

Usage::

    python scripts/gen_sf1.py [out_dir] [replicas]

Defaults: ``.localdata/sf1`` under the repo root, 10 replicas.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"

# table -> {column: key domain}; columns in one domain shift together
KEYED = {
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
SINGLE_COPY = ["region", "nation"]


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).resolve().parent.parent / ".localdata" / "sf1"
    )
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("gen-sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one stride per key domain: max over every column in the domain
    strides: dict[str, int] = {}
    for table, cols in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        for col, domain in cols.items():
            top = df.agg(F.max(col)).first()[0] or 0
            strides[domain] = max(strides.get(domain, 0), int(top) + 1)

    def write_single_file(df, table: str) -> None:
        stage = tempfile.mkdtemp(prefix=f"gen-sf1-{table}-")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, str(out_dir / f"{table}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)

    for table in SINGLE_COPY:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        write_single_file(df, table)
        print(f"{table}: copied (dimension)")

    for table, cols in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = []
        for r in range(replicas):
            rep = df
            for col, domain in cols.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(r * strides[domain]))
            parts.append(rep)
        unioned = parts[0]
        for p in parts[1:]:
            unioned = unioned.unionByName(p)
        write_single_file(unioned, table)
        n = spark.read.parquet(str(out_dir / f"{table}.parquet")).count()
        print(f"{table}: {n} rows x{replicas}")

    print(f"sf1 written to {out_dir}")


if __name__ == "__main__":
    main()
