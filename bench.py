"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT JSON line as the LAST stdout line (the driver's tail
capture truncates long lines head-first, which made the r3/r4 artifacts
unparseable — so the per-query map is NOT inlined).  The full per-query
map, including the prod_sec/gate_sec split, is written to
BENCH/bench_full_<round>.json and referenced from the headline line.

Per-query timing is split where the driver query carries verification
arms (exact companions / bound certificates added for the correctness
gate): ``gate_sec`` times the full gated query exactly as the driver
runs it; ``prod_sec`` times the production-only twin from
``__spark_entry__.prod_queries()``.  Round-over-round performance is
attributable to the operators via prod_sec — gate arms added in a round
no longer read as regressions (r4 verdict item 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROUND = os.environ.get("SPARK_GRAFT_ROUND", "r5")
REPO = os.path.dirname(os.path.abspath(__file__))


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


def _time_reps(spark, fn, reps: int) -> tuple[float, int]:
    """Min-of-reps wall time for one queries()-style callable, each rep
    building the DataFrame FRESH (a re-collect of the same DF reuses
    prior shuffle map outputs and understates cost): the sandbox host
    throttles under sustained load with 3-25x single-shot spikes, so a
    one-shot timing mistakes throttle for regression; the min
    approximates unthrottled cost comparably for every query (protocol
    per BENCH/BASELINE.md)."""
    best, n_rows = None, 0
    for rep in range(reps):
        t0 = time.time()
        df = fn(spark, SF_DIR)
        rows = df.collect()
        took = time.time() - t0
        if best is None or took < best:
            best = took
        if rep == 0:
            n_rows = len(rows)
        # drop intra-query persisted tables (LSH signatures, shingle
        # index, banded sims, fused-cohort caches): the next rep must
        # pay the full cost, not hit the previous rep's cache entry
        spark.catalog.clearCache()
    return best, n_rows


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    prods = entrymod.prod_queries()
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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    per_query: dict[str, dict] = {}
    total_rows = 0
    for name, fn in qs.items():
        gate_sec, n_rows = _time_reps(spark, fn, reps)
        total_rows += n_rows
        entry = {"gate_sec": round(gate_sec, 3)}
        if name in prods:
            prod_sec, _ = _time_reps(spark, prods[name], reps)
            entry["prod_sec"] = round(prod_sec, 3)
        per_query[name] = entry

    gate_total = round(sum(e["gate_sec"] for e in per_query.values()), 3)
    # production-suite estimate: prod twin where one exists, the gated
    # query itself otherwise (those queries ARE their production read)
    prod_total = round(
        sum(e.get("prod_sec", e["gate_sec"]) for e in per_query.values()), 3
    )

    # sketch-build throughput: values digested per second across the
    # three digest-building queries, measured on their PRODUCTION reads
    # (one scan + digest build each) — absolute and comparable across
    # rounds, unlike the r3/r4 metric whose scan multiplier changed as
    # gate arms were added
    from go_tdigest_spark.sources import table

    n_li = table(spark, SF_DIR, "lineitem").count()
    n_ev = table(spark, SF_DIR, "events").count()
    n_doc = table(spark, SF_DIR, "documents").count()
    sketch_secs = sum(
        per_query[k]["prod_sec"]
        for k in ("td_quantiles_lineitem", "td_cdf_events", "td_mean_documents")
    )
    sketch_values = n_li + n_ev + n_doc
    spark.stop()

    slowest = dict(
        sorted(
            ((k, v["gate_sec"]) for k, v in per_query.items()),
            key=lambda kv: -kv[1],
        )[:5]
    )

    full = {
        "round": ROUND,
        "sf": SF_DIR,
        "cpus": int(CPUS),
        "reps": reps,
        "protocol": "min-of-reps, fresh DataFrame per rep, clearCache "
        "between reps (host-throttle damping; see BENCH/BASELINE.md)",
        "gate_total_sec": gate_total,
        "prod_total_sec": prod_total,
        "warmup_sec": round(warm, 3),
        "result_rows": total_rows,
        "queries": per_query,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    full_path = os.path.join(REPO, "BENCH", f"bench_full_{ROUND}.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=2)

    result = {
        "metric": "driver query suite wall time (50 gated queries)",
        "value": gate_total,
        "unit": "sec",
        "sf": SF_DIR,
        "cpus": int(CPUS),
        "prod_total_sec": prod_total,
        "n_queries": len(per_query),
        "warmup_sec": round(warm, 3),
        "result_rows": total_rows,
        "sketch_values_per_sec": int(sketch_values / sketch_secs)
        if sketch_secs
        else 0,
        "slowest_gate_sec": slowest,
        "queries": f"BENCH/bench_full_{ROUND}.json",
    }
    # carry the north-rule scaling/accuracy evidence (produced by
    # scripts/bench_scaling.py on the ~2B-token fixture) in compact form
    scaling_path = os.path.join(REPO, "BENCH", "scaling_results.json")
    try:
        with open(scaling_path) as f:
            sc = json.load(f)
        result["scaling"] = {
            "eff_tokens_N1_to_4N4": sc.get(
                "scaling_efficiency_tokens_N1_to_4N4"
            ),
            "eff_sequences_N1_to_4N4": sc.get(
                "scaling_efficiency_sequences_N1_to_4N4"
            ),
            "eff_lsh_shuffle_N1_to_4N4": sc.get(
                "scaling_efficiency_lsh_N1_to_4N4"
            ),
            "gate": sc.get("gate"),
            "pass": sc.get("pass"),
            "max_rank_error_vs_exact": sc.get("accuracy", {}).get(
                "max_rank_error"
            ),
            "detail": "BENCH/scaling_results.json + BENCH/BASELINE.md",
        }
    except (OSError, ValueError, TypeError, AttributeError, KeyError):
        # enrichment only — a missing/drifted scaling file (wrong shape,
        # null sub-objects, non-dict top level) must never discard the
        # just-measured query timings
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
