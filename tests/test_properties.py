"""Property-based kernel tests (hypothesis) — the role played in the
reference ecosystem by quick.Check-style randomized suites: invariants
that must hold for *any* input, not just the fixture corpus."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from go_tdigest_spark import serde
from go_tdigest_spark.core import TDigest

# subnormals excluded: a centroid-gap midpoint between 0 and a subnormal
# underflows to zero width, making CDF spans degenerate — an FP pathology
# outside the estimator's contract (the clip hardening in cdf() keeps the
# output a valid fraction even then)
finite = st.floats(
    allow_nan=False,
    allow_infinity=False,
    allow_subnormal=False,
    min_value=-1e12,
    max_value=1e12,
)
value_lists = st.lists(finite, min_size=1, max_size=400)
# statistical-equivalence properties need enough mass for rank-space
# comparisons to be meaningful (the reference's own versions use 100k
# samples); tiny inputs legitimately interpolate differently
bulk_lists = st.lists(finite, min_size=64, max_size=400)
compressions = st.sampled_from([1, 5, 20, 100, 500])


@settings(max_examples=150, deadline=None)
@given(values=value_lists, compression=compressions)
def test_bounds_count_and_monotone(values, compression):
    arr = np.asarray(values)
    d = TDigest.from_values(arr, compression=compression)
    assert d.count == len(values)
    lo, hi = arr.min(), arr.max()
    qs = np.linspace(0, 1, 21)
    est = d.quantile(qs)
    # estimates stay within observed bounds at the exact tails
    assert est[0] == lo and est[-1] == hi
    # monotone in q
    assert (np.diff(est) >= -1e-9 * max(1.0, abs(hi))).all()
    # cdf monotone, in [0,1]; 0 far below the first centroid span (the
    # reference spreads centroid mass half-way to the neighbor, so cdf can
    # be >0 slightly below min — tdigest.go:306-317), 1 at/above max
    span = max(hi - lo, 1.0)
    xs = np.linspace(lo - 2 * span, hi + 1, 23)
    cd = d.cdf(xs)
    assert (np.diff(cd) >= -1e-12).all()
    assert ((cd >= 0) & (cd <= 1)).all()
    assert cd[0] == 0.0 and cd[-1] == 1.0
    assert d.cdf(hi) == 1.0


@settings(max_examples=75, deadline=None)
@given(
    values=bulk_lists,
    compression=st.sampled_from([20, 100, 500]),
    parts=st.integers(2, 7),
)
def test_merge_equals_whole_within_bound(values, compression, parts):
    """Merged sub-digests must agree with a whole-data digest.  Agreement
    is measured in CDF space (value-space quantiles are ill-conditioned
    around large voids in arbitrary data — inherent to piecewise-linear
    interpolation, identically so in the reference)."""
    arr = np.asarray(values)
    whole = TDigest.from_values(arr, compression=compression)
    subs = [
        TDigest.from_values(arr[i::parts], compression=compression)
        for i in range(parts)
        if len(arr[i::parts])
    ]
    merged = TDigest.merge_all(subs)
    assert merged.count == whole.count == len(values)
    assert merged.quantile(0.0) == arr.min()
    assert merged.quantile(1.0) == arr.max()
    xs = np.quantile(arr, np.linspace(0, 1, 9))
    assert (np.abs(merged.cdf(xs) - whole.cdf(xs)) <= 0.11).all()


@settings(max_examples=100, deadline=None)
@given(values=value_lists, compression=compressions)
def test_serde_roundtrips(values, compression):
    d = TDigest.from_values(np.asarray(values), compression=compression)
    d2 = serde.decode(serde.encode(d))
    m1, c1 = d.centroids()
    m2, c2 = d2.centroids()
    assert (m1 == m2).all() and (c1 == c2).all()
    # reference wire format: counts exact, count preserved
    d3 = serde.from_ref_bytes(serde.to_ref_bytes(d))
    assert d3.count == d.count
    _, c3 = d3.centroids()
    assert (c1 == c3).all()


@settings(max_examples=75, deadline=None)
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=5000), min_size=64, max_size=500
    ),
    compression=compressions,
)
def test_int_bincount_path_matches_float_path(values, compression):
    """The dense-int bincount fast path must agree with the generic sorted
    float path — identical weighted point sets in, same sweep."""
    ints = np.asarray(values, dtype=np.int32)
    d_int = TDigest.from_values(ints, compression=compression)
    d_float = TDigest.from_values(
        np.sort(ints.astype(np.float64)), compression=compression
    )
    assert d_int.count == d_float.count
    for q in (0.0, 0.25, 0.5, 0.75, 1.0):
        a, b = d_int.quantile(q), d_float.quantile(q)
        span = float(ints.max() - ints.min())
        # tolerance shape mirrors the reference's weighted-vs-repeated
        # test (tdigest_test.go:228-236): one discrete value step plus a
        # range-scaled term — collapsing duplicates into weighted points
        # coarsens interpolation exactly like AddWeighted does upstream
        assert abs(a - b) <= 1.0 + 0.05 * span, (q, a, b)


@settings(max_examples=50, deadline=None)
@given(values=bulk_lists)
def test_weighted_equals_repeated(values):
    """AddWeighted(v, k) must be statistically equivalent to k adds
    (parity: TestWeights, tdigest_test.go:215-237)."""
    arr = np.asarray(values)
    weights = (np.arange(len(arr)) % 3 + 1).astype(np.int64)
    d_w = TDigest()
    d_w.add_batch(arr, weights)
    d_r = TDigest()
    d_r.add_batch(np.repeat(arr, weights))
    assert d_w.count == d_r.count
    s = np.sort(np.repeat(arr, weights))
    span = max(1.0, float(s[-1] - s[0]))
    for q in (0.25, 0.5, 0.75):
        assert abs(d_w.quantile(q) - d_r.quantile(q)) <= 0.1 * span


def test_reset_keeps_config():
    d = TDigest(compression=42)
    d.add_batch(np.arange(100.0))
    d.reset()
    assert d.count == 0 and len(d) == 0 and d.compression == 42
    d.add(5.0)
    assert d.quantile(0.5) == 5.0


# ------------------------------------------------------------------ KLL


@settings(max_examples=80, deadline=None)
@given(values=value_lists, k=st.sampled_from([8, 32, 200]))
def test_kll_invariants(values, k):
    """KLL mirrors the reference's property posture: exact count/min/max,
    quantile outputs inside [min, max], CDF in [0, 1] and monotone."""
    from go_tdigest_spark.sketches import KLL

    arr = np.asarray(values, dtype=np.float64)
    sk = KLL(k)
    sk.update(arr)
    assert sk.count == arr.size
    assert sk.quantile(0.0) == arr.min()
    assert sk.quantile(1.0) == arr.max()
    _, w = sk._weighted_items()
    assert int(w.sum()) == sk.count
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    est = [sk.quantile(q) for q in qs]
    assert all(arr.min() <= e <= arr.max() for e in est)
    assert est == sorted(est)  # quantile function is monotone
    xs = sorted({float(arr.min()), float(np.median(arr)), float(arr.max())})
    cdfs = [sk.cdf(x) for x in xs]
    assert all(0.0 <= c <= 1.0 for c in cdfs)
    assert cdfs == sorted(cdfs)
    assert sk.cdf(arr.max()) == 1.0

    # serde roundtrip is byte-stable and query-identical
    back = KLL.from_bytes(sk.to_bytes())
    assert back.to_bytes() == sk.to_bytes()
    assert [back.quantile(q) for q in qs] == est


@settings(max_examples=50, deadline=None)
@given(values=bulk_lists, parts=st.integers(min_value=2, max_value=8))
def test_kll_merge_matches_whole_within_bound(values, parts):
    """Partitioned build + merge answers like the single build — the
    distributed-correctness property (analogue of the reference's
    TestMerge suite)."""
    from go_tdigest_spark.sketches import KLL

    arr = np.asarray(values, dtype=np.float64)
    whole = KLL(64)
    whole.update(arr)
    merged = KLL(64)
    for chunk in np.array_split(arr, parts):
        part = KLL(64)
        part.update(chunk)
        merged.merge(part)
    assert merged.count == whole.count == arr.size
    assert merged.quantile(0.0) == whole.quantile(0.0) == arr.min()
    assert merged.quantile(1.0) == whole.quantile(1.0) == arr.max()
    s = np.sort(arr)

    def rank_err(x: float, q: float) -> float:
        # duplicated mass makes a value's true rank an INTERVAL
        # [left, right]; the error is the distance from q to it
        lo = np.searchsorted(s, x, side="left") / s.size
        hi = np.searchsorted(s, x, side="right") / s.size
        return 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))

    for q in (0.25, 0.5, 0.75):
        # k=64 at <=400 points: generous but real rank bound either way
        assert rank_err(merged.quantile(q), q) <= 0.25
        assert rank_err(whole.quantile(q), q) <= 0.25


def _ksweep_reference(means, counts, compression):
    """The sweep loop with no fast path — the pre-optimization form,
    kept as the oracle for the vectorized all-singleton shortcut."""
    import math

    m = means.size
    if m <= 1:
        if counts is None:
            return means.copy(), np.ones(m, dtype=np.int64)
        return means.copy(), counts.copy()
    if counts is None:
        wi = np.arange(1, m + 1, dtype=np.int64)
        wx = np.cumsum(means)
    else:
        wi = np.cumsum(counts)
        wx = np.cumsum(means * counts.astype(np.float64))
    wf = wi.astype(np.float64)
    n = wf[-1]
    efac = math.exp(4.0 / compression)
    out_means = np.empty(m, dtype=np.float64)
    out_counts = np.empty(m, dtype=np.int64)
    k = 0
    i = 0
    wprev_i = 0
    wxprev = 0.0
    while i < m:
        q0 = wprev_i / n
        qlimit = (q0 * efac) / (1.0 - q0 + q0 * efac)
        j = int(np.searchsorted(wf, qlimit * n, side="right"))
        if j <= i:
            j = i + 1
        c = int(wi[j - 1] - wprev_i)
        x = (wx[j - 1] - wxprev) / float(c)
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


@given(
    values=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=600,
    ),
    weights=st.one_of(
        st.none(),
        st.lists(st.integers(1, 50), min_size=1, max_size=600),
    ),
    compression=st.sampled_from([20.0, 100.0, 300.0]),
)
@settings(max_examples=150, deadline=None)
def test_ksweep_fast_path_matches_loop(values, weights, compression):
    # sizes straddle the all-singleton boundary (total weight ~ 2*delta)
    # in both directions, so BOTH branches are exercised and must agree
    # bit-for-bit
    from go_tdigest_spark.core import _ksweep

    means = np.sort(np.asarray(values, dtype=np.float64))
    if weights is None:
        counts = None
    else:
        counts = np.resize(np.asarray(weights, dtype=np.int64), means.size)
    got_m, got_c = _ksweep(means, counts, compression)
    want_m, want_c = _ksweep_reference(means, counts, compression)
    assert got_c.dtype == want_c.dtype and got_m.dtype == want_m.dtype
    np.testing.assert_array_equal(got_m, want_m)
    np.testing.assert_array_equal(got_c, want_c)


# ----------------------------------------------------- sketch algebra

hash_lists = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    min_size=1,
    max_size=600,
)


def _np64(xs):
    return np.array(xs, dtype=np.int64)


@settings(max_examples=60, deadline=None)
@given(values=hash_lists, n_parts=st.integers(min_value=1, max_value=7))
def test_theta_split_merge_bitwise_and_exactness(values, n_parts):
    """Theta union is bitwise independent of how the input was split
    across partials (the property that makes the salted merge tree
    order-free), and while unsaturated the estimate is EXACT."""
    from go_tdigest_spark.sketches import ThetaSketch

    h = _np64(values)
    whole = ThetaSketch(64)
    whole.update_hashes(h)

    merged = ThetaSketch(64)
    for part in np.array_split(h, n_parts):
        p = ThetaSketch(64)
        if part.size:
            p.update_hashes(part)
        merged.merge(p)
    assert merged.to_bytes() == whole.to_bytes()

    n_distinct = len(np.unique(h))
    if whole.is_exact():
        assert whole.estimate() == float(n_distinct)
    else:
        # sampling mode: 3-sigma RSE bound holds overwhelmingly; use
        # 6 sigma so the property never flakes
        rse6 = 2 * whole.rse_bound(3.0)
        assert abs(whole.estimate() - n_distinct) <= rse6 * n_distinct + 1


@settings(max_examples=60, deadline=None)
@given(a=hash_lists, b=hash_lists)
def test_theta_set_algebra_partition_identity(a, b):
    """At min-theta the retained sets partition: retained(A∩B) +
    retained(A\\B) == A's retained hashes below min-theta — exact, for
    any inputs, saturated or not."""
    from go_tdigest_spark.sketches import ThetaSketch

    sa, sb = ThetaSketch(32), ThetaSketch(32)
    sa.update_hashes(_np64(a))
    sb.update_hashes(_np64(b))
    inter = sa.intersect(sb)
    diff = sa.a_not_b(sb)
    th = min(sa._theta_u(), sb._theta_u())
    if th >= sa._FULL:  # both exact: no theta cut (2^64 overflows uint64)
        a_below = sa.hashes
    else:
        a_below = sa.hashes[sa.hashes < np.uint64(th)]
    got = np.sort(np.concatenate([inter.hashes, diff.hashes]))
    assert np.array_equal(got, np.sort(a_below))


@settings(max_examples=60, deadline=None)
@given(values=hash_lists, n_parts=st.integers(min_value=1, max_value=7))
def test_hll_and_cms_split_merge_equals_whole(values, n_parts):
    """HLL register-max and CMS counter-add merges are bitwise equal to
    a single-pass build for ANY split; CMS point queries never
    undercount."""
    from go_tdigest_spark.sketches import HLL, CountMinSketch

    h = _np64(values)
    hll_whole = HLL(8)
    hll_whole.update_hashes(h)
    cms_whole = CountMinSketch(3, 64)
    cms_whole.update_hashes(h)

    hll_m, cms_m = HLL(8), CountMinSketch(3, 64)
    for part in np.array_split(h, n_parts):
        if not part.size:
            continue
        p1, p2 = HLL(8), CountMinSketch(3, 64)
        p1.update_hashes(part)
        p2.update_hashes(part)
        hll_m.merge(p1)
        cms_m.merge(p2)
    assert hll_m.to_bytes() == hll_whole.to_bytes()
    assert cms_m.to_bytes() == cms_whole.to_bytes()

    uniq, true_counts = np.unique(h, return_counts=True)
    est = cms_whole.point_query_hashes(uniq)
    assert (est >= true_counts).all()  # overcount-only, always


@settings(max_examples=40, deadline=None)
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=500
    ),
    k=st.integers(min_value=4, max_value=32),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_misra_gries_recall_guarantee_any_split(values, k, n_parts):
    """Mergeable MG guarantee for any input and any split: counters
    never overcount, err <= N/(k+1), and every item with true frequency
    > N/(k+1) survives the merge with count >= true - err."""
    from go_tdigest_spark.sketches import MisraGries

    h = _np64(values)
    merged = MisraGries(k)
    for part in np.array_split(h, n_parts):
        p = MisraGries(k)
        if part.size:
            p.update_hashes(part)
        merged.merge(p)

    n = h.size
    assert merged.err <= n // (k + 1)
    uniq, true_counts = np.unique(h, return_counts=True)
    kept = dict(zip(merged.hashes.tolist(), merged.counts.tolist()))
    for item, true in zip(uniq.tolist(), true_counts.tolist()):
        got = kept.get(item)
        if got is not None:
            assert got <= true  # never overcounts
        if true > n // (k + 1):
            assert got is not None and got >= true - merged.err
