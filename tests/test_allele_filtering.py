"""AlleleFiltering tests mirroring AlleleFilteringUnitTest.java cases."""
import numpy as np

from gatk_tpu.assembly.haplotype import Haplotype, build_event_map
from gatk_tpu.calling.allele_filtering import (
    equal_up_to_hmer_change, filter_alleles)
from gatk_tpu.calling.likelihoods import AlleleLikelihoods


class _Read:
    def __init__(self, i):
        self.name = f"r{i}"
        self.is_reverse = bool(i % 2)
        self.pos = 0
        self.end = 20


def _hap(bases: str, ref: str, is_ref=False):
    ops = np.array([0], np.uint8)
    lens = np.array([len(bases)], np.int32)
    h = Haplotype(bases=bases.encode(), is_ref=is_ref, cigar_ops=ops,
                  cigar_lens=lens, alignment_start=0)
    build_event_map(h, np.frombuffer(ref.encode(), np.uint8), 0)
    return h


def test_equal_up_to_hmer_change():
    assert equal_up_to_hmer_change(b"CAGGCATG", b"CAGGGCATG")   # one hmer longer
    assert not equal_up_to_hmer_change(b"CAGGCATG", b"CATTCATG")  # base change
    assert not equal_up_to_hmer_change(b"CAGGCATG", b"CAGGGCAATG")  # two hmers


def test_no_need_to_filter():
    """AlleleFilteringUnitTest.testNoNeedToFilter: two well-supported
    haplotypes survive."""
    ref = "CATGCATG"
    haps = [_hap(ref, ref, is_ref=True), _hap("CAGGCATG", ref)]
    values = np.zeros((2, 30))
    values[0, 1::2] = 3.0
    values[1, 0::2] = 3.0
    lik = AlleleLikelihoods(haps, [_Read(i) for i in range(30)], values)
    out = filter_alleles(lik, 0)
    assert out.alleles == haps


def test_filter_close_mismatch():
    """AlleleFilteringUnitTest.testFilterCloseMis: the haplotype carrying an
    unsupported second SNP is removed."""
    ref = "CATGCATG"
    haps = [_hap(ref, ref, is_ref=True), _hap("CAGGCATG", ref), _hap("CAGTCATG", ref)]
    assert len(haps[2].events) == 2
    values = np.zeros((3, 30))
    values[0, 1::2] = 3.0
    values[1, 0::2] = 3.0
    row2 = np.zeros(30)
    row2[[0, 2, 10, 12]] = [2, 1, 1, 4]
    values[2] = row2
    lik = AlleleLikelihoods(haps, [_Read(i) for i in range(30)], values)
    out = filter_alleles(lik, 0)
    assert out.alleles == haps[:2]
    assert out.values.shape == (2, 30)


def test_filter_alleles_flag_wiring():
    from gatk_tpu.calling.hc_engine import HCArgs, maybe_filter_alleles

    ref = "CATGCATG"
    haps = [_hap(ref, ref, is_ref=True), _hap("CAGGCATG", ref), _hap("CAGTCATG", ref)]
    values = np.zeros((3, 30))
    values[0, 1::2] = 3.0
    values[1, 0::2] = 3.0
    lik = AlleleLikelihoods(haps, [_Read(i) for i in range(30)], values)
    # off by default: untouched
    lik2, haps2 = maybe_filter_alleles(lik, HCArgs(), 0)
    assert lik2 is lik and haps2 == haps
    lik3, haps3 = maybe_filter_alleles(lik, HCArgs(filter_alleles=True), 0)
    assert haps3 == haps[:2]
