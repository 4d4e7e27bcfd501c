"""DRAGEN PD-haplotype machinery tests.

Goldens are transcribed from the reference unit tests:
PartiallyDeterminedHaplotypeComputationEngineUnitTest.java (event-group
clustering, branch computation, haplotype/PD-haplotype construction with exact
expected bases, pd bytes and cigars) and the reduction properties of
LoglessPDPairHMM (all-zero pd bytes == LoglessPairHMM exactly; undetermined
bits only ever increase the likelihood).
"""
import numpy as np
import pytest

from gatk_tpu.assembly.haplotype import Event
from gatk_tpu.calling import pd_haplotypes as pdh
from gatk_tpu.ops import pairhmm_host, pdhmm

# events from the reference unit test (positions are 1-based there; the math is
# translation-invariant so we keep the same integers as 0-based starts)
SNP_C_90 = Event(90, "A", "C")
DEL_AAAAAAA_98 = Event(98, "AAAAAAA", "A")
SNP_C_100 = Event(100, "A", "C")
SNP_G_101 = Event(101, "A", "G")
SNP_G_102 = Event(102, "A", "G")
SNP_C_104 = Event(104, "A", "C")
SNP_C_105 = Event(105, "A", "C")
SNP_G_105 = Event(105, "A", "G")
SNP_C_106 = Event(106, "A", "C")
SNP_T_106 = Event(106, "A", "T")
SNP_C_107 = Event(107, "A", "C")
SNP_C_109 = Event(109, "A", "C")
SNP_C_120 = Event(120, "A", "C")
SNP_G_120 = Event(120, "A", "G")
DEL_AA_100 = Event(100, "AA", "A")
DEL_AAA_102 = Event(102, "AAA", "A")
DEL_AAAAAAA_102 = Event(102, "AAAAAAA", "A")
DEL_AA_105 = Event(105, "AA", "A")
INS_TT_100 = Event(100, "A", "AT")
INS_TT_103 = Event(103, "A", "AT")
INS_TT_105 = Event(105, "A", "AT")
INS_GGG_106 = Event(106, "A", "AGG")

REF10 = np.frombuffer(b"AAAAAAAAAA", np.uint8)


def test_events_overlap_for_pd():
    ov = pdh.events_overlap_for_pd
    assert not ov(SNP_C_100, SNP_G_101)
    assert not ov(SNP_C_107, SNP_G_105)
    assert ov(SNP_C_105, SNP_G_105)
    assert ov(SNP_T_106, SNP_T_106)
    # SNP vs deletion: +1 on deletion start, nothing on its end
    assert not ov(DEL_AAA_102, SNP_G_101)
    assert not ov(DEL_AAA_102, SNP_G_102)
    assert ov(DEL_AAA_102, SNP_C_104)
    assert not ov(DEL_AAA_102, SNP_C_105)
    # SNP vs insertion: +0.5 on insertion start and end
    assert not ov(SNP_G_102, INS_TT_103)
    assert not ov(SNP_C_104, INS_TT_103)
    assert not ov(SNP_C_105, INS_TT_105)
    # insertions overlap only at the same position
    assert ov(INS_TT_105, INS_TT_105)
    assert not ov(INS_TT_105, INS_GGG_106)
    # deletions
    assert ov(DEL_AAAAAAA_102, DEL_AAA_102)
    assert ov(DEL_AA_105, DEL_AAAAAAA_102)
    assert not ov(DEL_AA_100, DEL_AAA_102)
    # deletion vs insertion
    assert not ov(INS_TT_105, DEL_AA_105)
    assert not ov(INS_TT_103, DEL_AA_105)
    assert ov(DEL_AAAAAAA_102, INS_GGG_106)
    assert ov(INS_TT_103, DEL_AAA_102)


@pytest.mark.parametrize("events,sw_mutexes,expected", [
    ([SNP_C_90], [], [[SNP_C_90]]),
    ([SNP_C_90, SNP_C_100], [], [[SNP_C_90], [SNP_C_100]]),
    ([SNP_C_90, SNP_C_100, INS_TT_105, SNP_C_109], [],
     [[SNP_C_90], [SNP_C_100], [INS_TT_105], [SNP_C_109]]),
    ([SNP_C_105, SNP_G_105], [], [[SNP_C_105, SNP_G_105]]),
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105], [],
     [[DEL_AAAAAAA_102, SNP_C_105, SNP_G_105]]),
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105, SNP_C_120], [],
     [[DEL_AAAAAAA_102, SNP_C_105, SNP_G_105], [SNP_C_120]]),
    ([SNP_C_105, SNP_G_105, INS_TT_105], [],
     [[SNP_C_105, SNP_G_105], [INS_TT_105]]),
    ([DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106], [],
     [[DEL_AA_100, SNP_G_101], [DEL_AA_105, SNP_C_106]]),
    # SW mutex joining otherwise-independent groups
    ([SNP_C_90, SNP_C_100], [[SNP_C_90, SNP_C_100]], [[SNP_C_90, SNP_C_100]]),
    ([DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106], [[SNP_G_101, DEL_AA_105]],
     [[DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106]]),
    # two SW pair mutexes transitively combining three groups
    ([DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106, SNP_C_120],
     [[SNP_G_101, DEL_AA_105], [SNP_C_106, SNP_C_120]],
     [[DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106, SNP_C_120]]),
    # trio mutex transitively combining three groups
    ([DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106, SNP_C_120],
     [[SNP_G_101, DEL_AA_105, SNP_C_120]],
     [[DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106, SNP_C_120]]),
])
def test_event_group_clusters(events, sw_mutexes, expected):
    groups = pdh.get_event_group_clusters(events, sw_mutexes)
    actual = {tuple(g.events) for g in groups}
    want = {tuple(sorted(c, key=pdh.hap_snp_first_key)) for c in expected}
    assert actual == want


@pytest.mark.parametrize("events,sw,locus,det_idx,expected", [
    ([SNP_C_90], [], 90, None, [set()]),
    ([SNP_C_90], [], 90, 0, [{0}]),
    ([SNP_C_90, SNP_C_100], [], 100, None, [{0}]),
    ([SNP_C_90, SNP_C_100], [], 100, 1, [{0, 1}]),
    ([SNP_C_90, SNP_C_100, SNP_C_105], [], 100, None, [{0, 2}]),
    ([SNP_C_90, SNP_C_100, INS_TT_105, SNP_C_109], [], 90, 0, [{0, 1, 2, 3}]),
    ([SNP_C_105, SNP_G_105], [], 105, None, [set()]),
    ([SNP_C_105, SNP_G_105], [], 105, 0, [{0}]),
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105], [], 102, None, [{1, 2}]),
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105], [], 102, 0, [{0}]),
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105], [], 105, None, [{0}]),
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105], [], 105, 1, [{1}]),
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105, SNP_C_106], [], 106, 3, [{1, 2, 3}]),
    # ref determined at 106: branch between the spanning deletion and the SNPs
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105, SNP_C_106], [], 106, None,
     [{0}, {1, 2}]),
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105, SNP_C_120], [], 102, 0, [{0, 3}]),
    ([DEL_AAAAAAA_102, SNP_C_105, SNP_G_105, SNP_C_120, SNP_G_120], [], 102, 0,
     [{0, 3, 4}]),
    ([SNP_C_105, SNP_G_105, INS_GGG_106, SNP_C_107], [], 105, None, [{2, 3}]),
    ([DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106, SNP_C_120], [], 105, 2,
     [{0, 2, 4}, {1, 2, 4}]),
    ([DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106, SNP_C_120],
     [[SNP_G_101, DEL_AA_105], [SNP_C_106, SNP_C_120]], 120, 4,
     [{0, 2, 4}, {1, 4}]),
    ([DEL_AA_100, SNP_G_101, DEL_AA_105, SNP_C_106, SNP_C_120],
     [[SNP_G_101, DEL_AA_105], [SNP_C_106, SNP_C_120]], 105, 2, [{0, 2, 4}]),
    ([DEL_AAAAAAA_98, DEL_AA_100, SNP_G_101, DEL_AAAAAAA_102, DEL_AA_105,
      SNP_C_106, SNP_C_120], [], 120, 6,
     [{0, 4, 6}, {0, 5, 6}, {1, 3, 6}, {1, 4, 6}, {1, 5, 6}, {2, 3, 6},
      {2, 4, 6}, {2, 5, 6}]),
])
def test_compute_branches(events, sw, locus, det_idx, expected):
    groups = pdh.get_event_group_clusters(events, sw)
    determined = set() if det_idx is None else {events[det_idx]}
    locus_events = [e for e in events if e.start == locus]
    branches = pdh.compute_branches(groups, determined, locus_events)
    actual = {frozenset(b) for b in branches}
    want = {frozenset(events[i] for i in s) for s in expected}
    assert actual == want


@pytest.mark.parametrize("events,bases,cigar", [
    ([], "AAAAAAAAAA", "10M"),
    ([SNP_C_105], "AAAAACAAAA", "5M1X4M"),
    ([SNP_C_100], "CAAAAAAAAA", "1X9M"),
    ([SNP_C_109], "AAAAAAAAAC", "9M1X"),
    ([SNP_C_105, SNP_C_106], "AAAAACCAAA", "5M2X3M"),
    ([DEL_AA_105], "AAAAAAAAA", "6M1D3M"),
    ([DEL_AA_100], "AAAAAAAAA", "1M1D8M"),
    ([DEL_AA_105, SNP_C_109], "AAAAAAAAC", "6M1D2M1X"),
    ([DEL_AA_105, SNP_C_107, SNP_C_109], "AAAAAACAC", "6M1D1X1M1X"),
    ([INS_TT_105], "AAAAAATAAAA", "6M1I4M"),
    ([INS_GGG_106], "AAAAAAAGGAAA", "7M2I3M"),
    ([DEL_AA_100, INS_GGG_106, SNP_C_109], "AAAAAAGGAAC", "1M1D5M2I2M1X"),
    ([SNP_C_105, DEL_AA_105], "AAAAACAAA", "5M1X1D3M"),
    ([SNP_C_100, DEL_AA_100], "CAAAAAAAA", "1X1D8M"),
    ([SNP_C_100, DEL_AA_100, SNP_G_102], "CGAAAAAAA", "1X1D1X7M"),
    ([SNP_C_105, INS_TT_105], "AAAAACTAAAA", "5M1X1I4M"),
    ([SNP_C_100, INS_TT_100, SNP_G_101], "CTGAAAAAAAA", "1X1I1X8M"),
    ([SNP_C_100, INS_TT_100, SNP_G_101, SNP_C_105, DEL_AA_105], "CTGAAACAAA",
     "1X1I1X3M1X1D3M"),
    ([SNP_C_104, DEL_AA_105], "AAAACAAAA", "4M1X1M1D3M"),
    ([SNP_C_104, INS_TT_105], "AAAACATAAAA", "4M1X1M1I4M"),
])
def test_construct_haplotype_from_events(events, bases, cigar):
    hap = pdh.construct_haplotype_from_events(REF10, 100, events)
    assert hap.bases == bases.encode()
    assert hap.cigar == cigar


@pytest.mark.parametrize("events", [
    [SNP_C_105, SNP_G_105],          # overlapping SNPs
    [SNP_C_109, DEL_AA_100],         # out of order
    [SNP_C_90],                      # outside the haplotype
    [DEL_AAAAAAA_98],                # partially overlapping indel
])
def test_construct_haplotype_invalid_inputs(events):
    with pytest.raises(ValueError):
        pdh.construct_haplotype_from_events(REF10, 100, events)


@pytest.mark.parametrize("events,det,locus,bases,pd,cigar", [
    ([SNP_C_105, SNP_C_106], {SNP_C_106}, 106, "AAAAAACAAA",
     [0, 0, 0, 0, 0, 17, 0, 0, 0, 0], "6M1X3M"),
    ([SNP_C_105, SNP_C_106], set(), 106, "AAAAAAAAAA",
     [0, 0, 0, 0, 0, 17, 0, 0, 0, 0], "10M"),
    ([INS_TT_103, SNP_C_105, SNP_C_106], {INS_TT_103}, 103, "AAAATAAAAAA",
     [0, 0, 0, 0, 0, 0, 17, 17, 0, 0, 0], "4M1I6M"),
    ([INS_TT_103, SNP_C_105, SNP_C_106], set(), 103, "AAAAAAAAAA",
     [0, 0, 0, 0, 0, 17, 17, 0, 0, 0], "10M"),
    ([INS_TT_103, SNP_C_105, SNP_C_106], {SNP_C_105}, 105, "AAAATACAAAA",
     [0, 0, 0, 0, 6, 0, 0, 17, 0, 0, 0], "4M1I1M1X4M"),
    ([INS_TT_103, SNP_C_105, SNP_C_106], set(), 105, "AAAATAAAAAA",
     [0, 0, 0, 0, 6, 0, 0, 17, 0, 0, 0], "4M1I6M"),
    ([DEL_AAA_102, SNP_C_105, SNP_C_106], {DEL_AAA_102}, 102, "AAAAAAAA",
     [0, 0, 0, 17, 17, 0, 0, 0], "3M2D5M"),
    ([DEL_AAA_102, SNP_C_105, SNP_C_106], set(), 102, "AAAAAAAAAA",
     [0, 0, 0, 0, 0, 17, 17, 0, 0, 0], "10M"),
    ([DEL_AAA_102, SNP_C_105, SNP_C_106], {SNP_C_105}, 105, "AAAAACAAAA",
     [0, 0, 0, 2, 4, 0, 17, 0, 0, 0], "5M1X4M"),
    ([DEL_AAA_102, SNP_C_105, SNP_C_106], set(), 105, "AAAAAAAAAA",
     [0, 0, 0, 2, 4, 0, 17, 0, 0, 0], "10M"),
    ([DEL_AAA_102, SNP_C_105, SNP_C_106], {SNP_C_106}, 106, "AAAAAACAAA",
     [0, 0, 0, 2, 4, 17, 0, 0, 0, 0], "6M1X3M"),
    # complex alleles
    ([DEL_AAA_102, SNP_C_105, SNP_C_106, INS_GGG_106], {SNP_C_105}, 105,
     "AAAAACAGGAAA", [0, 0, 0, 2, 4, 0, 17, 2, 4, 0, 0, 0], "5M1X1M2I3M"),
    ([DEL_AAA_102, SNP_C_105, SNP_C_106, SNP_T_106, INS_GGG_106], set(), 105,
     "AAAAAAAGGAAA", [0, 0, 0, 2, 4, 0, 81, 2, 4, 0, 0, 0], "7M2I3M"),
    ([DEL_AAA_102, SNP_C_105, SNP_C_106, INS_GGG_106], {DEL_AAA_102}, 102,
     "AAAAAGGAAA", [0, 0, 0, 17, 17, 2, 4, 0, 0, 0], "3M2D2M2I3M"),
    ([DEL_AAA_102, SNP_C_105, SNP_C_106, SNP_T_106, INS_GGG_106], set(), 102,
     "AAAAAAAGGAAA", [0, 0, 0, 0, 0, 17, 81, 2, 4, 0, 0, 0], "7M2I3M"),
    ([SNP_G_101, SNP_C_105, DEL_AA_105], {SNP_G_101}, 101, "AGAAAAAAAA",
     [0, 0, 0, 0, 0, 17, 6, 0, 0, 0], "1M1X8M"),
    ([SNP_G_101, SNP_C_105, DEL_AA_105], set(), 101, "AAAAAAAAAA",
     [0, 0, 0, 0, 0, 17, 6, 0, 0, 0], "10M"),
])
def test_create_pd_haplotype(events, det, locus, bases, pd, cigar):
    locus_events = [e for e in events if e.start == locus]
    hap = pdh.create_pd_haplotype(REF10, 100, det, locus, events, locus_events)
    assert hap.bases == bases.encode()
    assert hap.pd_bytes.tolist() == pd
    assert hap.cigar == cigar
    assert hap.determined_position == locus
    assert hap.events == sorted(det, key=pdh.hap_snp_first_key)


def test_pd_haplotype_deletion_underlapping_determined():
    """DRAGEN constructs REF pd bases under a spanning undetermined deletion even
    when ref is determined at an interior locus (unit test :377-387)."""
    hap = pdh.create_pd_haplotype(REF10, 100, set(), 105,
                                  [DEL_AAAAAAA_102, DEL_AA_105], [DEL_AA_105])
    assert hap.bases == b"AAAAAAAAAA"
    assert hap.pd_bytes.tolist() == [0, 0, 0, 2, 0, 0, 0, 0, 4, 0]
    assert hap.cigar == "10M"


# ---------------------------------------------------------------------------
# PDHMM
# ---------------------------------------------------------------------------


def _mk_read(seq, q=30):
    n = len(seq)
    return (np.frombuffer(seq, np.uint8), np.full(n, q, np.uint8),
            np.full(n, 45, np.uint8), np.full(n, 45, np.uint8),
            np.full(n, 10, np.uint8))


def test_pdhmm_all_zero_pd_equals_logless():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for _ in range(5):
        hap = bytes(rng.choice(bases, 40))
        read = bytes(rng.choice(bases, 20))
        rb, rq, iq, dq, gcp = _mk_read(read, q=int(rng.integers(10, 40)))
        want = pairhmm_host.compute_log10_likelihood(hap, rb, rq, iq, dq, gcp)
        got = pdhmm.compute_pd_log10(hap, np.zeros(len(hap), np.uint8),
                                     rb, rq, iq, dq, gcp)
        assert got == pytest.approx(want, abs=1e-12)


def test_pdhmm_undetermined_snp_scores_like_either_base():
    """A SNP-undetermined base must score at least as well as each determined
    variant (priors are pointwise >=), and exactly equal the matching-base score
    when the read matches either allele."""
    hap_ref = b"ACGTACGTAAGTACGT"
    hap_alt = b"ACGTACGTACGTACGT"  # A->C at index 9
    pd = np.zeros(16, np.uint8)
    pd[9] = pdhmm.PD_SNP + 16  # undetermined C at a ref-A base
    for read_seq in (b"GTAAGTAC", b"GTACGTAC"):
        rb, rq, iq, dq, gcp = _mk_read(read_seq)
        s_ref = pairhmm_host.compute_log10_likelihood(hap_ref, rb, rq, iq, dq, gcp)
        s_alt = pairhmm_host.compute_log10_likelihood(hap_alt, rb, rq, iq, dq, gcp)
        s_pd = pdhmm.compute_pd_log10(hap_ref, pd, rb, rq, iq, dq, gcp)
        assert s_pd >= max(s_ref, s_alt) - 1e-12


def test_pdhmm_undetermined_deletion_jump():
    """A read matching the deleted form must score (nearly) as well against the
    PD haplotype with a DEL_START..DEL_END span as against the actual deletion
    haplotype, and far better than against the plain reference."""
    hap_full = b"ACGTACGTTTTTACGTACGT"   # contains TTTT insertion-like block
    hap_del = b"ACGTACGTTACGTACGT"       # 3bp deleted (keeps one T)
    pd = np.zeros(20, np.uint8)
    pd[9] = pdhmm.PD_DEL_START
    pd[11] = pdhmm.PD_DEL_END            # undetermined deletion of bases 9-11
    read_seq = b"CGTACGTTACGTACG"        # supports the deletion
    rb, rq, iq, dq, gcp = _mk_read(read_seq)
    s_full = pairhmm_host.compute_log10_likelihood(hap_full, rb, rq, iq, dq, gcp)
    s_del = pairhmm_host.compute_log10_likelihood(hap_del, rb, rq, iq, dq, gcp)
    s_pd = pdhmm.compute_pd_log10(hap_full, pd, rb, rq, iq, dq, gcp)
    assert s_del > s_full + 2  # the read strongly supports the deletion
    assert s_pd > s_full + 2   # the PD jump recovers (most of) that support
    assert s_pd >= s_full - 1e-12


def test_pdhmm_native_matches_python():
    pytest.importorskip("ctypes")
    if pdhmm._load_native() is None:
        pytest.skip("native pdhmm library not built")
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    haps, pds, reads = [], [], []
    for _ in range(4):
        h = bytes(rng.choice(bases, int(rng.integers(20, 50))))
        pd = np.zeros(len(h), np.uint8)
        # random SNP-undetermined site + an undetermined deletion span
        pd[int(rng.integers(2, len(h) - 6))] = pdhmm.PD_SNP + 16
        s = int(rng.integers(4, len(h) - 4))
        pd[s] |= pdhmm.PD_DEL_START
        pd[s + 2] |= pdhmm.PD_DEL_END
        haps.append(h)
        pds.append(pd)
    for _ in range(3):
        n = int(rng.integers(10, 25))
        reads.append({
            "bases": np.asarray(rng.choice(bases, n), np.uint8),
            "rq": np.asarray(rng.integers(10, 40, n), np.uint8),
            "iq": np.full(n, 45, np.uint8),
            "dq": np.full(n, 45, np.uint8),
            "gcp": np.full(n, 10, np.uint8),
        })
    mat = pdhmm.compute_pd_likelihood_matrix(haps, pds, reads)
    for ri, rd in enumerate(reads):
        for hi in range(len(haps)):
            want = pdhmm.compute_pd_log10(haps[hi], pds[hi], rd["bases"],
                                          rd["rq"], rd["iq"], rd["dq"], rd["gcp"])
            assert mat[ri, hi] == pytest.approx(want, abs=1e-9)


def test_generate_pd_haplotypes_end_to_end():
    """generatePDHaplotypes on a small synthetic region: two non-overlapping SNPs
    give ref+alt determined haps at each locus with the other site undetermined."""
    from gatk_tpu.assembly.haplotype import Haplotype

    ref = np.frombuffer(b"AAAACAAAAGAAAA", np.uint8)
    h1 = Haplotype(b"AAAATAAAAGAAAA")
    h1.events = [Event(4, "C", "T")]
    h2 = Haplotype(b"AAAACAAAACAAAA")
    h2.events = [Event(9, "G", "C")]
    out = pdh.generate_pd_haplotypes([h1, h2], ref, 0, (0, 14))
    assert out is not None
    # 2 loci x (ref + 1 alt) = 4 PD haplotypes
    assert len(out) == 4
    by_locus = {}
    for h in out:
        by_locus.setdefault(h.determined_position, []).append(h)
    assert set(by_locus) == {4, 9}
    for locus, haps in by_locus.items():
        other = 9 if locus == 4 else 4
        dets = {frozenset(h.determined_events) for h in haps}
        assert frozenset() in dets          # ref-determined
        assert any(d for d in dets)          # alt-determined
        for h in haps:
            assert h.pd_bytes[other] & pdh.SNP  # other site undetermined
            assert not h.pd_bytes[locus]
