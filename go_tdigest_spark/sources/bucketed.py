"""Bucketed tables: Spark's persistent co-location primitive.

At 100 TB the dominant cost of a repeated fact-fact join (events x
events, lineitem x orders) is re-shuffling both sides on every run.
Writing each table ONCE bucketed by the join key amortizes that shuffle
into the write: `bucketBy(n, key)` hash-partitions rows into a fixed
bucket layout recorded in the catalog, and a join of two tables
bucketed identically on the join key reads co-located buckets directly
— the executed plan contains NO Exchange on either side (asserted in
tests/test_ops.py::test_bucketed_join_has_no_exchange).

This composes with the rest of the package: digest/sketch partials
grouped by the bucket key aggregate without a shuffle too, and the
`sortBy` option pre-sorts within buckets so sort-merge joins skip their
sort at read time.

Bucket count guidance: total-size / bucket-count should land near a
task-sized unit (128-512 MB); too few buckets caps join parallelism,
too many makes small files.  Both sides MUST use the same count — Spark
only elides the exchange for equal bucket layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_table"]


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` as a bucketed catalog table and return a reader for
    it.  ``path`` makes it an external table (recommended: keeps data
    placement explicit); otherwise it lands in the session warehouse.
    Overwrites any existing table of the same name."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    missing = [c for c in (bucket_cols + (sort_cols or [])) if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    spark = df.sparkSession
    # no pre-DROP: SaveMode.Overwrite already replaces the catalog entry,
    # and dropping first widens the window where a failed write leaves NO
    # table behind instead of the previous one
    w = df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return spark.table(name)


def bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a previously written bucketed table (bucket metadata comes
    from the catalog, so the co-location survives across sessions that
    share the metastore)."""
    return spark.table(name)
