from .stream_agg import (
    read_stream_digests,
    read_windowed_digests,
    tdigest_stateful_stream,
    tdigest_stream_writer,
    tdigest_windowed_stream_writer,
)

__all__ = [
    "read_stream_digests",
    "read_windowed_digests",
    "tdigest_stateful_stream",
    "tdigest_stream_writer",
    "tdigest_windowed_stream_writer",
]
