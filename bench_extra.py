"""Optimization-round profiling harness (bench.py stays FROZEN).

Times individual gate/prod queries with raw per-rep traces (VERDICT r5
item 1), optionally with noop-sink isolation, and can dump
explain("formatted") per query.  Usage:

    python bench_extra.py                          # all queries, 3 reps
    python bench_extra.py td_cdf_events ...        # subset
    SPARK_GRAFT_BENCH_REPS=5 python bench_extra.py td_cdf_events

Writes BENCH/bench_extra_<round>.json with {"queries": {name:
{"gate_all": [...], "prod_all": [...]}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROUND = os.environ.get("SPARK_GRAFT_ROUND", "r6")
REPO = os.path.dirname(os.path.abspath(__file__))


def build_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("go_tdigest_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    prods = entrymod.prod_queries()
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        qs = {k: qs[k] for k in only}

    # identical warmup to bench.py
    t0 = time.time()
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
    warm = time.time() - t0

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    out: dict[str, dict] = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"gate:{name}")
        gate_all = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            gate_all.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        entry = {"gate_all": gate_all, "gate_min": min(gate_all)}
        if name in prods:
            spark.sparkContext.setJobDescription(f"prod:{name}")
            prod_all = []
            for _ in range(reps):
                t0 = time.time()
                prods[name](spark, SF_DIR).collect()
                prod_all.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
            entry["prod_all"] = prod_all
            entry["prod_min"] = min(prod_all)
        out[name] = entry
        print(f"{name:30s} {entry}", flush=True)
        spark.sparkContext.setJobDescription(None)

    full = {
        "round": ROUND,
        "sf": SF_DIR,
        "cpus": int(CPUS),
        "reps": reps,
        "warmup_sec": round(warm, 3),
        "gate_total_min": round(sum(e["gate_min"] for e in out.values()), 3),
        "queries": out,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", f"bench_extra_{ROUND}.json")
    with open(path, "w") as f:
        json.dump(full, f, indent=2)
    print(json.dumps({"gate_total_min": full["gate_total_min"], "file": path}))
    spark.stop()


if __name__ == "__main__":
    main()
