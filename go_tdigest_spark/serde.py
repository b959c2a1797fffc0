"""Digest serialization.

Two codecs:

1. ``to_ref_bytes`` / ``from_ref_bytes`` — the reference's "smallEncoding"
   v2 wire format, byte-for-byte compatible with caio/go-tdigest
   (serialization.go:17-124) and with the Java t-digest's
   ``AVLTreeDigest.asSmallBytes`` (proven by the golden-blob test,
   serialization_test.go:193-235):

     big-endian header: int32 magic=2, float64 compression, int32 ncentroids
     then ncentroids float32 *deltas* between consecutive means
     then ncentroids uvarint counts

   Means are lossy (float32 deltas) — use it for cross-implementation
   exchange and compact checkpoints.

2. ``encode`` / ``decode`` — our internal format used for digest columns
   inside Spark plans: little-endian header (magic b"TD3", float64
   compression, int32 n) followed by raw float64 means and int64 counts.
   Exact (no precision loss) and NumPy-zero-copy to decode, which is what
   the shuffle hot path wants.
"""

from __future__ import annotations

import struct

import numpy as np

from .core import TDigest

_REF_MAGIC = 2
_REF_HEADER = struct.Struct(">idi")  # magic, compression, numCentroids
_INT_MAGIC = b"TD3\x00"
_INT_HEADER = struct.Struct("<4sdi")
_MAX_CENTROIDS = 1 << 22  # parity: serialization.go:95-97


def _encode_uvarint(values: np.ndarray) -> bytes:
    out = bytearray()
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError("counts must be non-negative")
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
    return bytes(out)


def _decode_uvarints(buf: bytes, offset: int, n: int) -> tuple[np.ndarray, int]:
    out = np.empty(n, dtype=np.int64)
    pos = offset
    ln = len(buf)
    for i in range(n):
        result = 0
        shift = 0
        while True:
            if pos >= ln:
                raise ValueError("truncated uvarint in digest payload")
            b = buf[pos]
            pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("uvarint overflow in digest payload")
        out[i] = result
    return out, pos


# --------------------------------------------------------------- reference v2


def to_ref_bytes(digest: TDigest) -> bytes:
    """Serialize in the reference's smallEncoding v2 (serialization.go:28-56)."""
    means, counts = digest.centroids()
    deltas = np.diff(means, prepend=0.0).astype(">f4")
    header = _REF_HEADER.pack(_REF_MAGIC, digest.compression, means.size)
    return header + deltas.tobytes() + _encode_uvarint(counts)


def from_ref_bytes(buf: bytes) -> TDigest:
    """Decode smallEncoding v2 (parity: serialization.go:132-190).

    Compression comes from the payload; count is recomputed as the sum of
    centroid counts; a strict trailing-bytes check is applied.
    """
    if len(buf) < _REF_HEADER.size:
        raise ValueError("buffer too small for deserialization")
    magic, compression, n = _REF_HEADER.unpack_from(buf, 0)
    if magic != _REF_MAGIC:
        raise ValueError(f"unsupported encoding version: {magic}")
    if n < 0 or n > _MAX_CENTROIDS:
        raise ValueError("bad number of centroids in serialization")
    need = _REF_HEADER.size + 4 * n
    if len(buf) < need:
        raise ValueError("buffer too small for deserialization")
    deltas = np.frombuffer(buf, dtype=">f4", count=n, offset=_REF_HEADER.size)
    means = np.cumsum(deltas.astype(np.float64))
    counts, end = _decode_uvarints(buf, need, n)
    if end != len(buf):
        raise ValueError("buffer has unread data")
    # structural validation BEYOND the reference (which trusts the
    # payload): a wire-format-valid blob with a zero count or a
    # negative mean delta would rehydrate a digest whose quantile/cdf
    # reads return confident garbage (zero total weight; non-monotone
    # means break the sorted-centroid invariant np.interp relies on).
    # Every payload our encoder or the reference encoder produces
    # passes (counts >= 1 by construction, deltas are diffs of sorted
    # means) — this only rejects corruption.
    if n:
        if deltas[1:].min(initial=0.0) < 0.0:
            raise ValueError("negative centroid mean delta (unsorted means)")
        if counts.min() < 1:
            raise ValueError("centroid count < 1 in serialization")
    return TDigest.from_centroids(means, counts, compression)


# ---------------------------------------------------------------- internal v3


def encode(digest: TDigest) -> bytes:
    """Exact internal encoding (float64 means / int64 counts)."""
    means, counts = digest.centroids()
    header = _INT_HEADER.pack(_INT_MAGIC, digest.compression, means.size)
    return (
        header
        + means.astype("<f8", copy=False).tobytes()
        + counts.astype("<i8", copy=False).tobytes()
    )


def decode(buf: bytes) -> TDigest:
    if len(buf) < _INT_HEADER.size:
        raise ValueError("buffer too small for deserialization")
    magic, compression, n = _INT_HEADER.unpack_from(buf, 0)
    if magic != _INT_MAGIC:
        raise ValueError("not an internal digest payload")
    off = _INT_HEADER.size
    if n < 0 or n > _MAX_CENTROIDS or len(buf) < off + 16 * n:
        raise ValueError("bad number of centroids in serialization")
    means = np.frombuffer(buf, dtype="<f8", count=n, offset=off).astype(np.float64)
    counts = np.frombuffer(buf, dtype="<i8", count=n, offset=off + 8 * n).astype(
        np.int64
    )
    return TDigest.from_centroids(means, counts, compression)


def empty_digest_bytes(compression: float = 100.0) -> bytes:
    return encode(TDigest(compression=compression))
