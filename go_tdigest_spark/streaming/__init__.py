from .stream_agg import read_stream_digests, tdigest_stateful_stream, tdigest_stream_writer

__all__ = ["read_stream_digests", "tdigest_stateful_stream", "tdigest_stream_writer"]
