"""Parquet source helpers for the driver-provided testdata tables.

At 100 TB the same code path applies: ``spark.read.parquet`` (or the
Iceberg catalog equivalent) gives Catalyst the scan, so predicate
pushdown / column pruning / partition pruning all happen below us — the
library never materializes rows it does not need.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict:
    """Load tables and register them as temp views (idempotent)."""
    out = {}
    for name in names:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
