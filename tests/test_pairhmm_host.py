"""Golden tests for the host f64 PairHMM against GATK's committed hmmresults data.

The golden file (reference test resource expected.Java.hmmresults.txt) lists
hap/read/qual strings (phred+33) with the Java LoglessPairHMM log10 result.
"""
import os

import numpy as np
import pytest

from gatk_tpu.ops import pairhmm_host
from gatk_tpu.utils.testdata import HMM_GOLDEN as GOLDEN
from gatk_tpu.utils.testdata import load_hmm_golden_cases as load_golden_cases


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference test data not present")
def test_host_pairhmm_matches_gatk_golden():
    cases = load_golden_cases(GOLDEN)
    assert len(cases) > 100
    got = np.array([pairhmm_host.compute_log10_likelihood(*c[:-1]) for c in cases])
    expected = np.array([c[-1] for c in cases])
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=0)


def test_perfect_match_likelihood_reasonable():
    # A perfectly matching read should have likelihood close to sum(log10(1-eps)).
    hap = b"ACGTACGTACGTACGTACGT"
    read = hap
    q = np.full(len(read), 40, dtype=np.uint8)
    res = pairhmm_host.compute_log10_likelihood(hap, read, q, q, q, np.full(len(read), 10, np.uint8))
    # free start deletions spread 1/H prior; result must be < 0 and > -3
    assert -3.0 < res < 0.0


def test_mismatch_penalty_monotonic():
    hap = b"ACGTACGTACGTACGTACGT"
    read = bytearray(hap)
    q = np.full(len(read), 40, dtype=np.uint8)
    gcp = np.full(len(read), 10, np.uint8)
    base = pairhmm_host.compute_log10_likelihood(hap, bytes(read), q, q, q, gcp)
    read[10] = ord("T")  # introduce one mismatch
    one = pairhmm_host.compute_log10_likelihood(hap, bytes(read), q, q, q, gcp)
    assert one < base - 2.0
