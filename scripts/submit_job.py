"""spark-submit entry point (north rule: "run via spark-submit
--py-files on a multi-executor cluster").

Build the dependency zip and submit:

    python scripts/make_pyfiles.py
    spark-submit --master local[8] \
        --py-files dist/go_tdigest_spark.zip \
        scripts/submit_job.py --sf-dir /root/testdata/sf0.01

On a real cluster, swap --master for the cluster manager; nothing in the
library assumes local mode (the only local-mode artifact in this repo is
the benchmark harness's core pinning).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--compression", type=float, default=100.0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("tdigest-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolved from --py-files on the executors
    from go_tdigest_spark.functions import td_count, td_quantile, td_trimmed_mean
    from go_tdigest_spark.operators import tdigest_agg
    from go_tdigest_spark.sources import table

    li = table(spark, args.sf_dir, "lineitem")
    out = (
        tdigest_agg(li, "l_extendedprice", by=["l_returnflag"],
                    compression=args.compression)
        .select(
            "l_returnflag",
            td_count("digest").alias("n"),
            td_quantile("digest", 0.5).alias("p50"),
            td_quantile("digest", 0.99).alias("p99"),
            td_trimmed_mean("digest", 0.1, 0.9).alias("tmean"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    for row in out:
        print(json.dumps(row.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
