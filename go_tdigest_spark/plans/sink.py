"""Partitioned dataset sink: the write side of the 100 TB story.

Reading well at scale starts with writing well: a downstream consumer
gets partition pruning only if the producer laid the data out in
partition directories, and gets sane task counts only if file sizes are
bounded.  This helper pins both:

  - ``repartition(partition_cols)`` co-locates each partition value so
    an output directory receives a few large files, not one sliver per
    upstream task (the small-files problem that kills object-store
    listings at scale);
  - ``maxRecordsPerFile`` caps file size from the other side, so a hot
    partition value splits into multiple files instead of one monster;
  - ``partitionBy`` writes the hive-style ``col=value/`` layout that
    file-source readers turn into PartitionFilters — a reader's filter
    on the partition column prunes whole directories without opening a
    footer (plan-asserted in tests).

For skewed partition values, compose with the salting idea: add a
derived subpartition column (e.g. ``pmod(xxhash64(id), k)``) to both
``repartition`` and ``partitionBy`` and drop it at read time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["write_partitioned"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a hive-partitioned dataset at ``path``."""
    partition_cols = list(partition_cols)
    missing = [c for c in partition_cols if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns not in DataFrame: {missing}")
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    w = df.repartition(*partition_cols).write.mode(mode)
    if max_records_per_file is not None:
        if max_records_per_file < 1:
            raise ValueError("max_records_per_file must be >= 1")
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).format(fmt).save(path)
