"""Structured Streaming for the auxiliary sketch family (HLL / CMS /
Bloom / KLL) — the same *append partials, merge on read* deployment as
the t-digest stream (stream_agg.py):

  - every micro-batch builds stage-1 partials (one sketch per partition
    x group per trigger) and overwrites its own ``batch_id=N`` directory
    (exactly-once under foreachBatch's at-least-once replay);
  - readers tree-merge committed batches only (_SUCCESS markers), sized
    by partial count (see operators/_tree.py).

Any mergeable sketch drops into this shape — the writer takes the
stage-1 builder as a callable, so e.g. streaming distinct-user counts
are ``sketch_stream_writer(stream, lambda b: hll_partials(b, ["user_id"],
["event_type"]), ...)`` with ``read_stream_sketches(..., HLL.from_bytes)``
at query time.  Associative merge (register-max / counter-add / bit-or /
compactor concat) is what makes per-key mutable state unnecessary.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch_agg import _merge_stage


def sketch_stream_writer(
    stream_df: DataFrame,
    partials_fn: Callable[[DataFrame], DataFrame],
    state_path: str,
    checkpoint_path: str,
):
    """Returns a DataStreamWriter maintaining an append-partials state
    table for any sketch; start with ``.start()`` /
    ``.trigger(availableNow=True)``.

    ``partials_fn(batch_df)`` must return stage-1 partial rows
    (``by..., sketch binary, n_rows long``) — use ``hll_partials`` or an
    equivalent builder.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        partials = partials_fn(batch_df)
        # per-batch directory: crash replays overwrite, never double-count
        partials.write.mode("overwrite").parquet(
            f"{state_path}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )


def read_stream_sketches(
    spark: SparkSession,
    state_path: str,
    by: Sequence[str],
    decode: Callable[[bytes], object],
    fanin: int | None = 64,
) -> DataFrame:
    """Merge-on-read over committed batches only; tree sized by partial
    count because storage-read partitions pack many partials per group."""
    from .stream_agg import read_committed_partials

    by = list(by)
    partials, n_units = read_committed_partials(
        spark, state_path, by + ["sketch", "n_rows"], count_units=fanin is not None
    )
    return _merge_stage(partials, by, decode, fanin=fanin, n_units=n_units)
