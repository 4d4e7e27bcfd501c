"""Pallas PairHMM kernel vs host f64 reference and GATK goldens.

Mirrors the cross-backend consistency gate in the reference
(VectorPairHMMUnitTest.java:100, tolerance 1e-5 in log10).
"""
import os

import numpy as np
import pytest

from gatk_tpu.ops import pairhmm_host, pairhmm_tpu
from tests.test_pairhmm_host import GOLDEN, load_golden_cases

pytestmark = pytest.mark.slow  # heavy integration tier (pytest.ini; testsettings.gradle:13-34)


def _mk_reads_haps(cases):
    reads, haps, ri, hi = [], [], [], []
    for hap, rb, rq, iq, dq, gcp, _ in cases:
        ri.append(len(reads))
        hi.append(len(haps))
        reads.append(dict(bases=rb, rq=rq, iq=iq, dq=dq, gcp=gcp))
        haps.append(hap)
    return reads, haps, np.array(ri), np.array(hi)


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference test data not present")
def test_kernel_matches_golden():
    cases = load_golden_cases(GOLDEN)[:256]
    reads, haps, ri, hi = _mk_reads_haps(cases)
    got = pairhmm_tpu.compute_log10_likelihoods(reads, haps, ri, hi)
    expected = np.array([c[-1] for c in cases])
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=0)


def test_kernel_matches_host_random():
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads, haps, ri, hi = [], [], [], []
    cases = []
    for k in range(40):
        rlen = int(rng.integers(10, 120))
        hlen = int(rng.integers(rlen, 300))
        hap = bases[rng.integers(0, 4, hlen)].tobytes()
        # read = noisy subsequence of hap
        start = int(rng.integers(0, hlen - rlen + 1))
        rb = bytearray(hap[start : start + rlen])
        for _ in range(int(rng.integers(0, 4))):
            rb[int(rng.integers(0, rlen))] = bases[int(rng.integers(0, 4))]
        rq = rng.integers(10, 50, rlen).astype(np.uint8)
        iq = rng.integers(30, 50, rlen).astype(np.uint8)
        dq = rng.integers(30, 50, rlen).astype(np.uint8)
        gcp = np.full(rlen, 10, np.uint8)
        reads.append(dict(bases=bytes(rb), rq=rq, iq=iq, dq=dq, gcp=gcp))
        haps.append(hap)
        ri.append(k)
        hi.append(k)
        cases.append((hap, bytes(rb), rq, iq, dq, gcp))
    got = pairhmm_tpu.compute_log10_likelihoods(reads, haps, np.array(ri), np.array(hi))
    expected = np.array([pairhmm_host.compute_log10_likelihood(*c) for c in cases])
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=0)


def test_kernel_extreme_underflow():
    # A long read that mismatches everywhere: the f64 result is ~-200 log10; the
    # f32 kernel must survive via rescaling.
    rlen = 120
    hap = (b"A" * 300)
    rb = b"C" * rlen
    rq = np.full(rlen, 40, np.uint8)
    iq = np.full(rlen, 45, np.uint8)
    dq = np.full(rlen, 45, np.uint8)
    gcp = np.full(rlen, 10, np.uint8)
    reads = [dict(bases=rb, rq=rq, iq=iq, dq=dq, gcp=gcp)]
    got = pairhmm_tpu.compute_log10_likelihoods(reads, [hap], np.array([0]), np.array([0]))
    expected = pairhmm_host.compute_log10_likelihood(hap, rb, rq, iq, dq, gcp)
    np.testing.assert_allclose(got[0], expected, atol=1e-3 * abs(expected), rtol=0)


def _random_region(rng, n_reads, n_haps, hlen_range=(120, 400)):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    hlen = int(rng.integers(*hlen_range))
    ref = bases[rng.integers(0, 4, hlen)]
    haps = []
    for _ in range(n_haps):
        h = ref.copy()
        h[rng.integers(0, hlen, 2)] = bases[rng.integers(0, 4, 2)]
        haps.append(h.tobytes())
    reads = []
    for _ in range(n_reads):
        rlen = int(rng.integers(20, min(100, hlen)))
        start = int(rng.integers(0, hlen - rlen + 1))
        rb = bytearray(ref[start : start + rlen].tobytes())
        rb[int(rng.integers(0, rlen))] = int(bases[int(rng.integers(0, 4))])
        reads.append(dict(
            bases=bytes(rb),
            rq=rng.integers(10, 50, rlen).astype(np.uint8),
            iq=np.full(rlen, 45, np.uint8),
            dq=np.full(rlen, 45, np.uint8),
            gcp=np.full(rlen, 10, np.uint8),
        ))
    return reads, haps


def _host_matrix(reads, haps):
    out = np.empty((len(haps), len(reads)))
    for j, h in enumerate(haps):
        for i, r in enumerate(reads):
            out[j, i] = pairhmm_host.compute_log10_likelihood(
                h, r["bases"], r["rq"], r["iq"], r["dq"], r["gcp"])
    return out


def test_pool_batcher_matches_host():
    """PoolBatcher (pooled cross-region dispatch) vs host f64 reference,
    exercising multi-region packing, read-chunk splitting, and multi-flush."""
    rng = np.random.default_rng(7)
    # small caps force: region B split across read chunks; pool flush between
    batcher = pairhmm_tpu.PoolBatcher(rp=160, hmax=512, interpret=True,
                                      nr_cap=33, nh_cap=9, pool_n=256, pool_k=2)
    regions = [
        _random_region(rng, 5, 3),
        _random_region(rng, 40, 2),   # > nr_cap-1: split into chunks
        _random_region(rng, 8, 4),
    ]
    handles = [batcher.add_region(reads, haps) for reads, haps in regions]
    batcher.flush()
    for (reads, haps), handle in zip(regions, handles):
        got = np.asarray(handle, np.float64)
        expected = _host_matrix(reads, haps)
        ok = expected > pairhmm_tpu.MIN_ACCEPTED_LOG10
        np.testing.assert_allclose(got[ok], expected[ok], atol=2e-4, rtol=0)


def test_pool_batcher_fetch_before_flush():
    rng = np.random.default_rng(11)
    batcher = pairhmm_tpu.PoolBatcher(rp=160, hmax=512, interpret=True,
                                      nr_cap=64, nh_cap=9, pool_n=256, pool_k=2)
    reads, haps = _random_region(rng, 6, 2)
    handle = batcher.add_region(reads, haps)
    got = np.asarray(handle, np.float64)  # must self-flush
    expected = _host_matrix(reads, haps)
    ok = expected > pairhmm_tpu.MIN_ACCEPTED_LOG10
    np.testing.assert_allclose(got[ok], expected[ok], atol=2e-4, rtol=0)


def test_pool_batcher_cpu_fallback():
    """Default CPU-backend path (no interpret): per-region scan fallback."""
    rng = np.random.default_rng(13)
    batcher = pairhmm_tpu.PoolBatcher()
    reads, haps = _random_region(rng, 4, 2)
    handle = batcher.add_region(reads, haps)
    batcher.flush()
    got = np.asarray(handle, np.float64)[: len(haps), : len(reads)]
    expected = _host_matrix(reads, haps)
    ok = expected > pairhmm_tpu.MIN_ACCEPTED_LOG10
    np.testing.assert_allclose(got[ok], expected[ok], atol=2e-4, rtol=0)
