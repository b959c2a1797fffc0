"""Structured Streaming t-digest aggregation.

Design: *append partials, merge on read*.  Each micro-batch runs the
same stage-1 partial build as the batch path (one digest per partition x
group per trigger) and appends those rows — with trigger lineage — to a
parquet state table.  Readers get exact, point-in-time correct digests
by tree-merging the partials.  This is the scale-correct shape for
streams: state is O(triggers x groups x compression) bytes, appends are
atomic with the file-commit protocol, there is no read-modify-write
race, and compaction (re-merging old partials into one row) is a
trivially safe background job because merge is associative
(reference: tdigest.go:262-272).

The digest is explicitly "parallel streaming friendly" (reference
README.md:3-4); mergeability is what lets a streaming sketch avoid
per-key mutable state entirely.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import build_partials, merge_partials


def tdigest_stream_writer(
    stream_df: DataFrame,
    value_col: str,
    by: Sequence[str],
    state_path: str,
    checkpoint_path: str,
    compression: float = 100.0,
    explode_arrays: bool = False,
):
    """Returns a DataStreamWriter that maintains the partial-digest state
    table; start it with ``.start()`` (or trigger(availableNow=True))."""
    by = list(by)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        partials = build_partials(
            batch_df, value_col, by, compression, explode_arrays=explode_arrays
        )
        (
            partials.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(state_path)
        )

    return (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )


def read_stream_digests(
    spark: SparkSession, state_path: str, by: Sequence[str], fanin: int | None = 64
) -> DataFrame:
    """Merge-on-read: current digests from the streaming state table."""
    by = list(by)
    partials = spark.read.parquet(state_path).select(
        *by, "digest", "n_rows", "total_weight"
    )
    return merge_partials(partials, by, fanin=fanin)
