"""Merging t-digest kernel: vectorized NumPy, no Spark dependency.

This is a from-scratch implementation of the *merging digest* form of
Ted Dunning's t-digest (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests", arXiv:1902.04023).  The reference library
(caio/go-tdigest, /root/reference) uses per-sample randomized insertion
(tdigest.go:163-200); we deliberately use buffered sort + a single
k-bound merge sweep instead, because it is O(B log B) per flush and
fully vectorizable — the semantics contract we keep is the reference's
*query* behavior and *error bounds*, not its construction internals
(construction is RNG-dependent there anyway, tdigest.go:396-399).

Size bound parity: the reference allows a centroid to absorb weight only
while ``c <= 4 * n * q * (1-q) / compression`` (tdigest.go:393).  Our
sweep uses the equivalent scale-function formulation: with
``k(q) = (delta/4) * ln(q / (1-q))`` a centroid may span at most one
k-unit, which by the mean value theorem gives exactly the same
``4 n q (1-q) / delta`` weight bound.  Tails are therefore exact
singletons (k has singularities at q=0,1), which preserves min/max —
the same property the reference's TestSingletonInACrowd checks
(tdigest_test.go:169-193).

Query semantics replicated exactly (see docstrings):
  - quantile: tdigest.go:93-140  (piecewise-linear over centroid ranks,
    with before-first / after-last linear extrapolation)
  - cdf:      tdigest.go:295-333 (half-distance spans, terminal jump)
  - trimmed_mean: tdigest.go:411-455 (boundary clipping)
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["TDigest", "DEFAULT_COMPRESSION"]

DEFAULT_COMPRESSION = 100.0
# Buffered inserts: flush when this many raw samples are pending.
DEFAULT_BUFFER_SIZE = 32768


def _ksweep(
    means: np.ndarray, counts: np.ndarray | None, compression: float
) -> tuple[np.ndarray, np.ndarray]:
    """One left-to-right k-bound merge sweep over sorted weighted points.

    ``means`` must be sorted ascending; ``counts`` positive int64, or
    None meaning all-ones (the bulk-insert fast path: prefix weights are
    then ``arange`` and no ones array is ever materialized).
    Returns (means, counts) of the compressed centroid list, sorted.
    """
    m = means.size
    if m <= 1:
        if counts is None:
            return means.copy(), np.ones(m, dtype=np.int64)
        return means.copy(), counts.copy()

    if counts is None:
        wi = np.arange(1, m + 1, dtype=np.int64)
        wx = np.cumsum(means)
    else:
        wi = np.cumsum(counts)  # exact int64 prefix weights
        wx = np.cumsum(means * counts.astype(np.float64))
    wf = wi.astype(np.float64)
    n = wf[-1]

    # qlimit(q0) = sigmoid(logit(q0) + 4/delta); q0=0 -> 0 (tail singleton)
    efac = math.exp(4.0 / compression)

    # All-singleton fast path: a cluster starting at point i (prefix
    # weight wf[i-1]) absorbs its successor iff wf[i+1] <= qlimit*n.  If
    # NO point can absorb its successor, every cluster is a singleton and
    # the sweep's output IS its input (x clamps to the point's own mean).
    # This is the common case for small digests (total weight below
    # ~2*compression) — fine-grained groupings produce thousands of them
    # per task, and the O(m) vectorized check replaces m sequential
    # searchsorted calls.  Exact: same comparison the loop performs.
    wprev_all = np.concatenate(([0.0], wf[: m - 2]))
    q0_all = wprev_all / n
    qlim_n = (q0_all * efac) / (1.0 - q0_all + q0_all * efac) * n
    if np.all(wf[1:] > qlim_n):
        if counts is None:
            return means.copy(), np.ones(m, dtype=np.int64)
        return means.astype(np.float64, copy=True), counts.copy()

    ss = wf.searchsorted
    out_means = np.empty(m, dtype=np.float64)
    out_counts = np.empty(m, dtype=np.int64)
    k = 0
    i = 0
    wprev_i = 0  # int prefix weight before current centroid
    wxprev = 0.0
    while i < m:
        q0 = wprev_i / n
        qlimit = (q0 * efac) / (1.0 - q0 + q0 * efac)
        # widest j such that all points i..j-1 keep cumweight <= qlimit*n
        j = int(ss(qlimit * n, side="right"))
        if j <= i:
            j = i + 1
        c = int(wi[j - 1] - wprev_i)
        x = (wx[j - 1] - wxprev) / float(c)
        # numeric safety clamp: centroid mean must stay inside the span of
        # its constituents (parity with boundedWeightedAverage,
        # tdigest.go:147-153)
        lo, hi = means[i], means[j - 1]
        if x < lo:
            x = lo
        elif x > hi:
            x = hi
        out_means[k] = x
        out_counts[k] = c
        k += 1
        wprev_i = int(wi[j - 1])
        wxprev = wx[j - 1]
        i = j
    return out_means[:k], out_counts[:k]


def _ksweep_dense(
    means: np.ndarray, counts: np.ndarray, compression: float
) -> tuple[np.ndarray, np.ndarray]:
    """k-bound sweep over a dense histogram (unique sorted values with
    duplicate counts), allowed to SPLIT bins at rank boundaries.

    Splitting a bin is exact — all its mass sits at one value — so this
    reproduces, rank for rank, what the singleton-stream sweep would do
    on the expanded data (the plain weighted sweep cannot split input
    points and would under-resolve heavy duplicate runs, bypassing the
    k-bound the way a giant AddWeighted would).
    """
    m = means.size
    if m == 0:
        return means.copy(), counts.copy()
    wi = np.cumsum(counts)
    wx = np.cumsum(means * counts.astype(np.float64))
    n = int(wi[-1])
    nf = float(n)
    if n == 1:
        return means.astype(np.float64, copy=True), counts.copy()
    efac = math.exp(4.0 / compression)
    out_m: list[float] = []
    out_c: list[int] = []
    wprev = 0
    while wprev < n:
        q0 = wprev / nf
        qlimit = (q0 * efac) / (1.0 - q0 + q0 * efac)
        wend = int(qlimit * nf)
        if wend <= wprev:
            wend = wprev + 1
        elif wend > n:
            wend = n
        i0 = int(np.searchsorted(wi, wprev, side="right"))
        i1 = int(np.searchsorted(wi, wend, side="left"))
        total_x = wx[i1] - (wx[i0 - 1] if i0 > 0 else 0.0)
        head_extra = (wprev - (int(wi[i0 - 1]) if i0 > 0 else 0)) * means[i0]
        tail_extra = (int(wi[i1]) - wend) * means[i1]
        c = wend - wprev
        x = (total_x - head_extra - tail_extra) / c
        lo, hi = means[i0], means[i1]
        if x < lo:
            x = lo
        elif x > hi:
            x = hi
        out_m.append(float(x))
        out_c.append(c)
        wprev = wend
    return np.asarray(out_m, dtype=np.float64), np.asarray(out_c, dtype=np.int64)


class TDigest:
    """A mergeable quantile sketch (merging-digest formulation).

    State is a sorted centroid list (two parallel float64/int64 arrays —
    same struct-of-arrays layout as the reference's ``summary``,
    summary.go:9-12) plus an unsorted insert buffer that is compressed
    lazily ("buffered inserts, periodic compress").
    """

    __slots__ = ("compression", "_means", "_counts", "_buf_v", "_buf_w", "_buf_len",
                 "buffer_size")

    def __init__(
        self,
        compression: float = DEFAULT_COMPRESSION,
        buffer_size: int = DEFAULT_BUFFER_SIZE,
    ) -> None:
        # parity: compression must be >= 1 (options.go:20-28)
        if not compression >= 1:
            raise ValueError("compression should be >= 1")
        self.compression = float(compression)
        self.buffer_size = int(buffer_size)
        self._means = np.empty(0, dtype=np.float64)
        self._counts = np.empty(0, dtype=np.int64)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buf_len = 0

    # ------------------------------------------------------------------ build

    def add(self, value: float, weight: int = 1) -> None:
        """Insert one weighted sample (parity: AddWeighted, tdigest.go:163).

        NaN values and non-positive weights are rejected, matching the
        reference (summary.go:27-32, tdigest.go:164-166).
        """
        self.add_batch(np.asarray([value], dtype=np.float64),
                       np.asarray([weight], dtype=np.int64))

    def add_batch(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        """Insert a vector of samples with optional positive int weights.

        Unweighted integer input is kept in its native dtype until the
        flush sorts it (4-byte sorts are ~2x cheaper than 8-byte, and the
        all-ones weight vector is never materialized).
        """
        values = np.asarray(values)
        if values.ndim != 1:
            values = values.ravel()
        if values.size == 0:
            return
        if values.dtype.kind == "f":
            if values.dtype != np.float64:
                values = values.astype(np.float64)
            if np.isnan(values).any():
                raise ValueError("cannot add NaN values to the digest")
        elif values.dtype.kind not in "iu":
            values = values.astype(np.float64)
            if np.isnan(values).any():
                raise ValueError("cannot add NaN values to the digest")
        if weights is not None:
            weights = np.asarray(weights, dtype=np.int64)
            if weights.shape != values.shape:
                raise ValueError("values and weights must align")
            if (weights <= 0).any():
                raise ValueError("weights must be positive")
        self._buf_v.append(values)
        self._buf_w.append(weights)
        self._buf_len += values.size
        if self._buf_len >= self.buffer_size:
            self._flush()

    def _flush(self) -> None:
        if self._buf_len == 0:
            return
        bufs_v, bufs_w = self._buf_v, self._buf_w
        self._buf_v, self._buf_w = [], []
        self._buf_len = 0

        if all(w is None for w in bufs_w):
            # fast path: sort the raw samples in native dtype (all-ones
            # weights stay implicit), sweep them alone, then fold the
            # resulting small centroid list into the existing one —
            # exactly a digest merge, so semantics are unchanged
            v = bufs_v[0] if len(bufs_v) == 1 else np.concatenate(bufs_v)
            if v.dtype.kind in "iu":
                vmin = int(v.min())
                vmax = int(v.max())
                span = vmax - vmin
                if span < max(1 << 16, v.size // 4):
                    # dense integer domain (e.g. token ids): collapse
                    # duplicates with one bincount pass — no sort at all.
                    # The dense sweep splits bins at rank boundaries, so
                    # the result matches the singleton-stream sweep
                    # (exact tails included) at a fraction of the cost.
                    cnt = np.bincount(
                        (v - vmin).astype(np.int64), minlength=span + 1
                    )
                    nz = np.nonzero(cnt)[0]
                    bm = (nz + vmin).astype(np.float64)
                    bc = cnt[nz].astype(np.int64)
                    new_m, new_c = _ksweep_dense(bm, bc, self.compression)
                else:
                    v = np.sort(v, kind="stable")  # radix for ints
                    new_m, new_c = _ksweep(
                        v.astype(np.float64), None, self.compression
                    )
            else:
                v = np.sort(v)
                new_m, new_c = _ksweep(v, None, self.compression)
            if self._means.size == 0:
                self._means, self._counts = new_m, new_c
                return
            m = np.concatenate((self._means, new_m))
            c = np.concatenate((self._counts, new_c))
        else:
            chunks_v = [self._means] + [
                b if b.dtype == np.float64 else b.astype(np.float64) for b in bufs_v
            ]
            chunks_w = [self._counts] + [
                np.ones(b.size, dtype=np.int64) if w is None else w
                for b, w in zip(bufs_v, bufs_w)
            ]
            m = np.concatenate(chunks_v)
            c = np.concatenate(chunks_w)
        order = np.argsort(m, kind="stable")
        self._means, self._counts = _ksweep(m[order], c[order], self.compression)

    def compress(self) -> None:
        """Force-compact (parity: Compress, tdigest.go:239-254; advised
        before serializing, tdigest.go:236-238). Count-preserving."""
        self._flush()
        self._means, self._counts = _ksweep(self._means, self._counts, self.compression)

    def merge(self, *others: "TDigest") -> "TDigest":
        """Fold other digests into self (parity: Merge, tdigest.go:262-272).

        Associative and commutative up to sketch error — the map-reduce
        property the reference proves in TestMerge (tdigest_test.go:297-383).
        """
        for other in others:
            other._flush()
            if other._means.size:
                self._buf_v.append(other._means)
                self._buf_w.append(other._counts)
                self._buf_len += other._means.size
        self._flush()
        return self

    @classmethod
    def from_values(
        cls,
        values: np.ndarray,
        weights: np.ndarray | None = None,
        compression: float = DEFAULT_COMPRESSION,
    ) -> "TDigest":
        d = cls(compression=compression, buffer_size=max(DEFAULT_BUFFER_SIZE, len(values)))
        d.add_batch(np.asarray(values), weights)
        d._flush()
        return d

    @classmethod
    def from_centroids(
        cls,
        means: np.ndarray,
        counts: np.ndarray,
        compression: float = DEFAULT_COMPRESSION,
    ) -> "TDigest":
        """Rehydrate from an already-sorted centroid list (deserialization)."""
        d = cls(compression=compression)
        d._means = np.asarray(means, dtype=np.float64)
        d._counts = np.asarray(counts, dtype=np.int64)
        return d

    @classmethod
    def merge_all(cls, digests, compression: float | None = None) -> "TDigest":
        """Merge an iterable of digests into a fresh one (tree-merge leaf)."""
        digests = list(digests)
        if compression is None:
            compression = digests[0].compression if digests else DEFAULT_COMPRESSION
        out = cls(compression=compression)
        out.merge(*digests)
        return out

    # ------------------------------------------------------------ inspection

    @property
    def count(self) -> int:
        """Total weight ingested (parity: Count, tdigest.go:218-220)."""
        buffered = sum(
            v.size if w is None else int(w.sum())
            for v, w in zip(self._buf_v, self._buf_w)
        )
        return int(self._counts.sum()) + buffered

    def __len__(self) -> int:
        self._flush()
        return int(self._means.size)

    def centroids(self) -> tuple[np.ndarray, np.ndarray]:
        """Ordered (means, counts) view (parity: ForEachCentroid)."""
        self._flush()
        return self._means, self._counts

    def clone(self) -> "TDigest":
        self._flush()
        return TDigest.from_centroids(
            self._means.copy(), self._counts.copy(), self.compression
        )

    def reset(self) -> None:
        """Clear all state, keep configuration (parity: Reset,
        tdigest.go:346-349)."""
        self._means = np.empty(0, dtype=np.float64)
        self._counts = np.empty(0, dtype=np.int64)
        self._buf_v.clear()
        self._buf_w.clear()
        self._buf_len = 0

    # ---------------------------------------------------------------- queries

    def quantile(self, q):
        """Quantile estimate; exact parity with tdigest.go:93-140.

        The estimator is piecewise-linear interpolation through the points
        (rank_i, mean_i) with rank_i = headsum_i + (count_i - 1)/2, plus
        linear extrapolation of the first/last segment down to rank 0 and
        up to rank count-1.  q outside [0,1] raises; empty digest -> NaN;
        single centroid -> its mean.
        """
        q_arr = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if ((q_arr < 0) | (q_arr > 1)).any():
            raise ValueError("q must be between 0 and 1 (inclusive)")
        self._flush()
        m = self._means.size
        scalar = np.isscalar(q) or getattr(q, "ndim", 1) == 0
        if m == 0:
            out = np.full(q_arr.shape, np.nan)
            return float(out[0]) if scalar else out
        if m == 1:
            out = np.full(q_arr.shape, self._means[0])
            return float(out[0]) if scalar else out

        n = float(self._counts.sum())
        c = self._counts.astype(np.float64)
        head = np.concatenate(([0.0], np.cumsum(c)[:-1]))
        pos = head + (c - 1.0) / 2.0
        index = q_arr * (n - 1.0)

        xs = pos
        ys = self._means
        if pos[0] > 0.0:
            # extrapolate the first segment back to rank 0
            y0 = (pos[1] * ys[0] - pos[0] * ys[1]) / (pos[1] - pos[0])
            xs = np.concatenate(([0.0], xs))
            ys = np.concatenate(([y0], ys))
        if pos[-1] < n - 1.0:
            # extrapolate the last segment forward to rank n-1
            slope = (self._means[-1] - self._means[-2]) / (pos[-1] - pos[-2])
            yn = self._means[-1] + (n - 1.0 - pos[-1]) * slope
            xs = np.concatenate((xs, [n - 1.0]))
            ys = np.concatenate((ys, [yn]))
        out = np.interp(index, xs, ys)
        return float(out[0]) if scalar else out

    def cdf(self, x):
        """Fraction of mass <= x; exact parity with tdigest.go:295-333.

        Centroid i's mass is spread linearly over the span between the
        midpoints to its neighbors; spans tile contiguously, the mass of
        the last centroid is a jump to 1 at its left midpoint (that is
        the reference's loop structure — it never interpolates inside the
        final centroid).
        """
        x_arr = np.atleast_1d(np.asarray(x, dtype=np.float64))
        scalar = np.isscalar(x) or getattr(x, "ndim", 1) == 0
        self._flush()
        m = self._means.size
        if m == 0:
            out = np.full(x_arr.shape, np.nan)
            return float(out[0]) if scalar else out
        if m == 1:
            out = np.where(x_arr < self._means[0], 0.0, 1.0)
            return float(out[0]) if scalar else out

        n = float(self._counts.sum())
        mids = (self._means[:-1] + self._means[1:]) / 2.0
        lo0 = self._means[0] - (self._means[1] - self._means[0]) / 2.0
        knots = np.concatenate(([lo0], mids))  # length m
        heads = np.concatenate(([0.0], np.cumsum(self._counts[:-1]))) / n
        out = np.interp(x_arr, knots, heads)
        out = np.where(x_arr >= knots[-1], 1.0, out)
        # numerical hardening: subnormal-width spans can overflow the
        # interpolation slope to +/-inf (the hazard class behind the
        # reference's issue #17 / TestCDFInsideLastCentroid) — a CDF is a
        # fraction, clamp it
        out = np.clip(np.nan_to_num(out, nan=np.nan, posinf=1.0, neginf=0.0), 0.0, 1.0)
        return float(out[0]) if scalar else out

    def trimmed_mean(self, p1: float, p2: float) -> float:
        """Mean of mass between quantile fractions p1 and p2; parity with
        tdigest.go:411-455 (per-centroid boundary clipping)."""
        if p1 < 0 or p1 > 1:
            raise ValueError("p1 must be between 0 and 1 (inclusive)")
        if p2 < 0 or p2 > 1:
            raise ValueError("p2 must be between 0 and 1 (inclusive)")
        if p1 >= p2:
            raise ValueError("p1 must be lower than p2")
        self._flush()
        if self._means.size == 0:
            return 0.0
        n = float(self._counts.sum())
        min_count = p1 * n
        max_count = p2 * n
        ends = np.cumsum(self._counts.astype(np.float64))
        begins = ends - self._counts
        w = np.minimum(ends, max_count) - np.maximum(begins, min_count)
        w = np.maximum(w, 0.0)
        tw = w.sum()
        if tw == 0:
            return 0.0
        return float(np.dot(w, self._means) / tw)

    def __repr__(self) -> str:  # pragma: no cover
        self._flush()
        return (
            f"TDigest(compression={self.compression}, count={self.count}, "
            f"centroids={self._means.size})"
        )
