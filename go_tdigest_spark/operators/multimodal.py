"""Multimodal (binary payload) plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side machinery here — schema, Arrow batch shape, partitioning,
UDF signatures — is real and tested; the actual media decode is stubbed
behind ``NotImplementedError`` (no image/audio libraries exist in this
container) with a clearly-marked deterministic fake for tests.

All feature extraction runs in ``mapInArrow`` so payload bytes stay in
Arrow buffers until the numpy view; nothing is exploded row-by-row
through Python objects.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKSUM_MOD = 2_147_483_647


def binary_features(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Per-payload metadata: byte length, additive checksum, head/tail
    bytes.  Vectorized over each Arrow batch (single numpy pass over the
    concatenated value buffer, sliced by offsets)."""
    from pyspark.sql.pandas.types import to_arrow_type

    id_field = df.select(id_col).schema.fields[0]
    id_dt = id_field.dataType.simpleString()
    out_schema = pa.schema(
        [
            # derive the Arrow type from the ACTUAL Spark id type: a
            # bigint-or-string assumption made from_arrays silently cast
            # int/short ids to strings while mapInArrow declared the
            # original type — executor-side schema mismatch
            pa.field("doc", to_arrow_type(id_field.dataType)),
            pa.field("n_bytes", pa.int64()),
            pa.field("checksum", pa.int64()),
            pa.field("head_byte", pa.int32()),
            pa.field("tail_byte", pa.int32()),
        ]
    )
    pruned = df.select(id_col, bin_col).where(F.col(bin_col).isNotNull())

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            payload = batch.column(1)
            n = len(payload)
            # binary arrays: contiguous value buffer + offsets
            data_buf = payload.buffers()[2]
            buf = (
                np.frombuffer(data_buf, dtype=np.uint8)
                if data_buf is not None
                else np.zeros(0, dtype=np.uint8)
            )
            offsets = np.frombuffer(
                payload.buffers()[1], dtype=np.int32, count=n + 1,
                offset=payload.offset * 4,
            ).astype(np.int64)
            lengths = np.diff(offsets)
            prefix = np.zeros(buf.size + 1, dtype=np.int64)
            np.cumsum(buf, dtype=np.int64, out=prefix[1:])
            csum = (prefix[offsets[1:]] - prefix[offsets[:-1]]) % CHECKSUM_MOD
            if buf.size:
                head = np.where(
                    lengths > 0, buf[np.minimum(offsets[:-1], buf.size - 1)], -1
                ).astype(np.int32)
                tail = np.where(
                    lengths > 0, buf[np.maximum(offsets[1:] - 1, 0)], -1
                ).astype(np.int32)
            else:
                head = np.full(n, -1, dtype=np.int32)
                tail = np.full(n, -1, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(lengths, type=pa.int64()),
                    pa.array(csum, type=pa.int64()),
                    pa.array(head, type=pa.int32()),
                    pa.array(tail, type=pa.int32()),
                ],
                schema=out_schema,
            )

    return pruned.mapInArrow(
        gen,
        f"doc {id_dt}, n_bytes long, checksum long, head_byte int, tail_byte int",
    )


def decode_media(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    media: str = "image",
    fake: bool = False,
) -> DataFrame:
    """Decode media payloads to typed metadata (width/height/channels or
    sample_rate/n_samples).

    STUB: real decoding requires PIL/ffmpeg, which this container does not
    ship.  ``fake=True`` substitutes a deterministic function of the byte
    length so the full Spark plumbing (schema, batching, downstream
    grouping) is exercised end to end.
    """
    if not fake:
        raise NotImplementedError(
            f"{media} decoding requires media libraries not present in this "
            "environment; pass fake=True for the deterministic test double"
        )
    id_dt = df.select(id_col).schema.fields[0].dataType.simpleString()
    pruned = df.select(id_col, bin_col).where(F.col(bin_col).isNotNull())

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            lengths = pa.compute.binary_length(batch.column(1)).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            # FAKE decode: dims derived from byte length, deterministic
            width = (lengths % 640 + 1).astype(np.int32)
            height = (lengths % 480 + 1).astype(np.int32)
            channels = np.full(len(lengths), 3, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(width),
                    pa.array(height),
                    pa.array(channels),
                ],
                names=["doc", "width", "height", "channels"],
            )

    return pruned.mapInArrow(
        gen, f"doc {id_dt}, width int, height int, channels int"
    )


def frame_sample(df: DataFrame, bin_col: str, id_col: str, stride: int = 16) -> DataFrame:
    """Sample every ``stride``-th byte of the payload ("frame sampling"
    shape for video columns): binary in, smaller binary out."""
    if stride < 1:
        # fail on the driver: stride=0 would raise per-row inside
        # executors and a negative stride silently REVERSES the payload
        raise ValueError(f"stride must be >= 1, got {stride}")
    id_dt = df.select(id_col).schema.fields[0].dataType.simpleString()
    pruned = df.select(id_col, bin_col).where(F.col(bin_col).isNotNull())

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            sampled = [
                None if v is None else bytes(bytes(v)[::stride])
                for v in batch.column(1).to_pylist()
            ]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(sampled, type=pa.binary())],
                names=["doc", "frames"],
            )

    return pruned.mapInArrow(gen, f"doc {id_dt}, frames binary")
