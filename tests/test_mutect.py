"""Mutect2 somatic-likelihoods math and activity tests (CPU)."""
import math

import numpy as np
import pytest

from gatk_tpu.mutect import somatic_likelihoods as sle
from gatk_tpu.mutect.engine import M2Args, m2_read_filter


def test_digamma_known_values():
    # digamma(1) = -gamma, digamma(2) = 1 - gamma
    gamma = 0.5772156649015329
    assert sle.digamma(1.0) == pytest.approx(-gamma, abs=1e-9)
    assert sle.digamma(2.0) == pytest.approx(1 - gamma, abs=1e-9)
    assert sle.digamma(10.5) == pytest.approx(2.3030010342976863, abs=1e-8)


def test_allele_fractions_posterior_obvious():
    # 90 reads strongly favor allele 0; 10 favor allele 1
    ll = np.zeros((2, 100))
    ll[1, :90] = -10.0
    ll[0, 90:] = -10.0
    post = sle.allele_fractions_posterior(ll, np.array([1.0, 1.0]))
    af = post / post.sum()
    assert af[0] == pytest.approx(91 / 102, abs=0.01)


def test_log_evidence_single_allele_is_loglik_sum():
    # with one allele, log evidence reduces to the sum of log likelihoods
    ll = np.array([[-1.0, -2.0, -0.5]])
    ev = sle.log_evidence(ll, np.array([1.0]))
    assert ev == pytest.approx(ll.sum(), abs=1e-6)


def test_log_likelihood_ratio_monotone_in_alt_count():
    weak = sle.log_likelihood_ratio(50, [30] * 2)
    strong = sle.log_likelihood_ratio(50, [30] * 20)
    assert strong > weak
    assert sle.log_likelihood_ratio(50, []) == -np.inf


def test_log_likelihood_ratio_high_depth_heuristic():
    # fork-specific: >300 ref reads with >1.6%*exp(-n/1000) confident alts => 5.0
    assert sle.log_likelihood_ratio(400, [20] * 30) == 5.0


def test_mito_mode_lowers_thresholds():
    a = M2Args(mitochondria_mode=True)
    assert a.emission_log10_odds == 0.0
    assert a.initial_log10_odds == 0.0
    b = M2Args()
    assert b.emission_log10_odds == 3.0 and b.initial_log10_odds == 2.0


def test_m2_read_filter(synthetic_read=None):
    from gatk_tpu.io.reads import Read
    import numpy as np

    def mk(mapq=60, flag=0, n=50):
        return Read("r", flag, 0, 100, mapq,
                    np.array([0], np.uint8), np.array([n], np.int32),
                    np.full(n, ord("A"), np.uint8), np.full(n, 30, np.uint8))

    assert m2_read_filter(mk())
    assert not m2_read_filter(mk(mapq=10))        # below MAPQ 20
    assert not m2_read_filter(mk(flag=0x400))     # duplicate
    assert not m2_read_filter(mk(n=20))           # below min read length 30


def test_filter_mutect_calls_engine():
    """Core filter semantics on synthetic records."""
    from gatk_tpu.io.vcf import Variant
    from gatk_tpu.mutect.filtering import FilterMutectCallsEngine

    def mk(tlod, mbq_alt=30, mpos=30, ecnt=1, alts=("C",)):
        return Variant(
            contig="chrM", pos=100, ref="A", alts=alts,
            info={"TLOD": f"{tlod:.2f}", "MBQ": f"30,{mbq_alt}", "MMQ": "60,60",
                  "MPOS": str(mpos), "ECNT": str(ecnt)},
            fmt_keys=("GT", "AF", "SB"),
            samples=[{"GT": "0/1", "AF": "0.5", "SB": "10,10,10,10"}],
        )

    strong, weak, lowbq, endpos = mk(500.0), mk(0.2), mk(500.0, mbq_alt=5), mk(500.0, mpos=0)
    eng = FilterMutectCallsEngine(mitochondria_mode=True)
    variants = [strong, weak, lowbq, endpos]
    eng.learn(variants)
    eng.apply(variants)
    assert strong.filters == ("PASS",)
    assert "weak_evidence" in weak.filters
    assert "base_qual" in lowbq.filters
    assert "position" in endpos.filters
    # mito mode: multiallelic not applied; default mode: applied
    multi = mk(500.0, alts=("C", "G", "T"))
    eng.apply([multi])
    assert multi.filters == ("PASS",)
    eng2 = FilterMutectCallsEngine(mitochondria_mode=False)
    eng2.apply([multi])
    assert "multiallelic" in multi.filters


def test_calculate_contamination_known_mixtures():
    """Hom-alt contamination estimates within 10% relative of known NA12891/NA12892
    mixture fractions (CalculateContaminationIntegrationTest data)."""
    import os

    from gatk_tpu.mutect.contamination import calculate_contamination, read_pileup_table
    from gatk_tpu.utils.testdata import reference_path

    D = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/calculatecontamination")
    if not os.path.isdir(D):
        pytest.skip("reference data missing")
    for fname, expected in [
        ("NA12891_0.01_NA12892_0.99.table", 0.011),
        ("NA12891_0.03_NA12892_0.97.table", 0.031),
        ("NA12891_0.05_NA12892_0.95.table", 0.051),
        ("NA12891_0.08_NA12892_0.92.table", 0.081),
    ]:
        _s, sites = read_pileup_table(os.path.join(D, fname))
        c, _se = calculate_contamination(sites)
        assert abs(c - expected) < max(0.15 * expected, 0.005), (fname, c)
