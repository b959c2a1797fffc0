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


def read_table(
    spark: SparkSession, path_or_ident: str, fmt: str = "parquet"
) -> DataFrame:
    """Format-parameterized scan: the promised production source is an
    Iceberg catalog table (north rule), the test fixtures are parquet —
    both route through the same DataSource V2 reader, so every operator
    downstream keeps Catalyst pushdown/pruning/partition-pruning either
    way.

    ``fmt='iceberg'`` expects ``path_or_ident`` as a catalog identifier
    (``catalog.db.table``) and requires the iceberg-spark-runtime jar on
    the classpath; any other fmt is treated as a file-source path.
    Raises a clear error when the Iceberg runtime is absent (the sandbox
    ships no jars — the iceberg test skips itself in that case).
    """
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(path_or_ident)
        except Exception as e:  # noqa: BLE001
            if "Failed to find" in str(e) or "ClassNotFound" in str(e):
                raise RuntimeError(
                    "iceberg-spark-runtime jar not on the classpath; add "
                    "spark.jars.packages=org.apache.iceberg:"
                    "iceberg-spark-runtime-<ver> or read parquet instead"
                ) from e
            raise
    return spark.read.format(fmt).load(path_or_ident)


def table(
    spark: SparkSession, sf_dir: str, name: str, fmt: str = "parquet"
) -> DataFrame:
    if fmt == "iceberg":
        return read_table(spark, f"{sf_dir}.{name}", fmt="iceberg")
    return read_table(spark, os.path.join(sf_dir, f"{name}.{fmt}"), fmt=fmt)


def parquet_row_count(path: str) -> int:
    """Exact row count from parquet FOOTERS — O(files), no Spark action,
    no data pages read.  Handles a single file, a directory of part
    files (recursively), or a glob-free dataset root; raises
    FileNotFoundError when no parquet file is found rather than
    returning a silent 0.  This is the generalized "n_docs hint"
    (advisor r3: the single-file ``pq.read_metadata`` shortcut breaks on
    a multi-file/partitioned dataset)."""
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        return pq.read_metadata(path).num_rows
    total = 0
    found = False
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
                found = True
    if not found:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    return total


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict:
    """Load tables and register them as temp views (idempotent)."""
    out = {}
    for name in names:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
