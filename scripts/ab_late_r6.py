"""Same-window A/B harness for the round-6 late changes (produced
BENCH/ab_r6_late_{old,new}.json).

Usage: git stash; python scripts/ab_late_r6.py old; git stash pop;
       python scripts/ab_late_r6.py new
Writes BENCH/ab_r6_late_<tag>.json with per-query rep traces AND Spark job
counts (job counts are noise-free attribution: the CC convergence
change removes whole jobs per round).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TAG = sys.argv[1]
QUERIES = [
    "dedup_cluster_canonical",
    "td_cube_orders",
    "td_rollup_lineitem",
    "repetition_docs",
    "td_weighted_lineitem",  # control: untouched by the late changes
]

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName(f"ab-{TAG}")
    .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod
from go_tdigest_spark.operators import dedup

qs = entrymod.queries()

# warmup identical to bench.py
spark.range(1_000_000).selectExpr("sum(id)").collect()
n_workers = int(CPUS)
spark.range(0, 64 * n_workers, 1, n_workers).mapInPandas(
    lambda it: it, "id long"
).count()
from go_tdigest_spark.operators import tdigest_agg

tdigest_agg(
    spark.range(0, 100_000, 1, n_workers).selectExpr(
        "CAST(id AS DOUBLE) v", "id % 3 g"
    ),
    "v",
    by=["g"],
).count()


def n_jobs():
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


out = {}
for name in QUERIES:
    alls, jobs = [], []
    for _ in range(5):
        j0 = n_jobs()
        t0 = time.time()
        qs[name](spark, SF_DIR).collect()
        alls.append(round(time.time() - t0, 3))
        jobs.append(n_jobs() - j0)
        spark.catalog.clearCache()
        dedup.release_dedup_caches()
    out[name] = {"all": alls, "min": min(alls), "jobs": jobs}
    print(f"{name:28s} min={min(alls):.3f} jobs={jobs} all={alls}", flush=True)

with open(f"/root/repo/BENCH/ab_r6_late_{TAG}.json", "w") as f:
    json.dump(out, f, indent=2)
spark.stop()
