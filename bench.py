"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "values_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("go_tdigest_spark-bench")
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
    # force JVM + python-worker (pandas/arrow) warmup outside the timed
    # section — the first UDF query otherwise pays ~3s of worker spawn
    t_warm = time.time()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # spawn the FULL python worker pool (one per core) — a single small
    # mapInPandas only forks a few workers and the first real query then
    # pays the rest of the pool spawn inside its timing
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
    warm = time.time() - t_warm

    # min of REPS per query, each rep building the DataFrame FRESH (a
    # re-collect of the same DF reuses prior shuffle map outputs and
    # understates cost): the sandbox host throttles under sustained
    # load with 3-25x single-shot spikes, so a one-shot timing mistakes
    # throttle for regression; the min approximates unthrottled cost
    # comparably for every query (protocol per BENCH/BASELINE.md)
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    total_rows = 0
    for name, fn in qs.items():
        best = None
        for rep in range(reps):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            rows = df.collect()
            took = time.time() - t0
            if best is None or took < best:
                best = took
            if rep == 0:
                total_rows += len(rows)
            # drop intra-query persisted tables (LSH signatures, shingle
            # index, banded sims): the next rep must pay the full cost,
            # not hit the previous rep's identical-plan cache entry
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # sketch-build throughput: values digested per second across the
    # three digest-building queries (td_quantiles_lineitem,
    # td_cdf_events, td_mean_documents — the former td_stats_* exact
    # companions were absorbed into the first two in the 50-query
    # consolidation)
    from go_tdigest_spark.sources import table

    n_li = table(spark, SF_DIR, "lineitem").count()
    n_ev = table(spark, SF_DIR, "events").count()
    n_doc = table(spark, SF_DIR, "documents").count()
    # the three headline sketch queries each scan their fact table
    # THREE times since the round-4 gate arms landed: digest build +
    # exact-percentile companion + winsorize clamp (lineitem); digest +
    # exact + tdigest_rank pass (events); digest + normalize fact scan
    # + pooled min/max (documents).  Attribute every scanned value so
    # the headline values/sec stays comparable as arms are added —
    # earlier rounds used 2/2/1 multipliers, so compare THIS metric
    # only within rounds that share the multiplier (noted in BENCH).
    sketch_secs = sum(
        timings[k]
        for k in (
            "td_mean_documents",
            "td_quantiles_lineitem",
            "td_cdf_events",
        )
    )
    sketch_values = 3 * n_li + 3 * n_ev + 3 * n_doc
    result = {
        "metric": "headline query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": int(CPUS),
        "warmup_sec": round(warm, 3),
        "result_rows": total_rows,
        "sketch_values_per_sec": int(sketch_values / sketch_secs) if sketch_secs else 0,
    }
    # carry the north-rule scaling/accuracy evidence (produced by
    # scripts/bench_scaling.py on the ~2B-token fixture) alongside the
    # per-query timings so one artifact holds both
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling_results.json"
    )
    try:
        with open(scaling_path) as f:
            sc = json.load(f)
        result["scaling"] = {
            "tokens_per_sec_local1": sc.get("local1", {}).get("tokens_per_sec"),
            "tokens_per_sec_local2": sc.get("local2", {}).get("tokens_per_sec"),
            "tokens_per_sec_local4": sc.get("local4", {}).get("tokens_per_sec"),
            "tokens_per_sec_local8": sc.get("local8", {}).get("tokens_per_sec"),
            "tokens_per_sec_local32": sc.get("local32", {}).get("tokens_per_sec"),
            # primary N->4N pair: local[1] -> local[4], the bus-unsaturated
            # proxy for node-count scaling (BENCH/BASELINE.md rationale);
            # the wider ladder is reported for transparency
            "efficiency_N_to_4N": sc.get(
                "scaling_efficiency_tokens_N1_to_4N4",
                sc.get("scaling_efficiency_tokens_N2_to_4N8"),
            ),
            "efficiency_seq_N_to_4N": sc.get(
                "scaling_efficiency_sequences_N1_to_4N4"
            ),
            "efficiency_tokens_2_to_8": sc.get(
                "scaling_efficiency_tokens_N2_to_4N8"
            ),
            "efficiency_tokens_8_to_32": sc.get(
                "scaling_efficiency_tokens_N8_to_4N32"
            ),
            "gate": sc.get("gate"),
            "pass": sc.get("pass"),
            "max_rank_error_vs_exact": sc.get("accuracy", {}).get("max_rank_error"),
        }
    except (OSError, ValueError, TypeError, AttributeError, KeyError):
        # enrichment only — a missing/drifted scaling file (wrong shape,
        # null sub-objects, non-dict top level) must never discard the
        # just-measured query timings
        pass
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
