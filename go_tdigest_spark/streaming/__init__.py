from .sketch_stream import read_stream_sketches, sketch_stream_writer
from .stream_agg import (
    read_stream_digests,
    read_windowed_digests,
    tdigest_stateful_stream,
    tdigest_stream_writer,
    tdigest_windowed_stream_writer,
)

__all__ = [
    "read_stream_digests",
    "read_stream_sketches",
    "read_windowed_digests",
    "sketch_stream_writer",
    "tdigest_stateful_stream",
    "tdigest_stream_writer",
    "tdigest_windowed_stream_writer",
]
