"""SW golden tests mirroring the reference's SmithWatermanAlignerAbstractUnitTest
data (expected cigars/offsets are test data from the reference's TestNG providers)."""
import numpy as np
import pytest

from gatk_tpu.ops import smith_waterman as sw

LONG_REF = (
    "ATAGAAAATAGTTTTTGGAAATATGGGTGAAGAGACATCTCCTCTTATGGAAAAAGGGATTCTAGAATTTAACAATAAATATTCCCAACTTTCCCC"
    "AAGGCTTTAAAATCTACCTTGAAGGAGCAGCTGATGTATTTCTAGAACAGACTTAGGTGTCTTGGTGTGGCCTGTAAAGAGATACTGTCTTTCTCT"
    "TTTGAGTGTAAGAGAGAAAGGACAGTCTACTCAATAAAGAGTGCTGGGAAAACTGAATATCCACACACAGAATAATAAAACTAGATCCTATCTCTC"
    "ACCATATACAAAGATCAACTCAAAACAAATTAAAGACCTAAATGTAAGACAAGAAATTATAAAACTACTAGAAAAAAACACAAGGGAAATGCTTCA"
    "GGACATTGGC"
)

CASES = [
    # (ref, alt, params, overhang, expected_offset, expected_cigar)
    ("AAAGGACTGACTG", "ACTGACTGACTG", sw.ORIGINAL_DEFAULT, sw.SOFTCLIP, 1, "12M"),
    ("AAAGACTACTG", "AACGGACACTG", sw.SWParameters(50, -100, -220, -12), sw.SOFTCLIP, 1, "2M2I3M1D4M"),
    ("AAAGACTACTG", "AACGGACACTG", sw.SWParameters(200, -50, -300, -22), sw.SOFTCLIP, 0, "11M"),
    ("AAACCCCC", "CCCCCGGG", sw.ORIGINAL_DEFAULT, sw.SOFTCLIP, 3, "5M3S"),
    (
        "TGTGTGTGTGTGTGACAGAGAGAGAGAGAGAGAGAGAGAGAGAGA",
        "ACAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGAGA",
        sw.STANDARD_NGS, sw.SOFTCLIP, 14, "31M20S",
    ),
    ("AAACCCCC", "CCCCC", sw.ORIGINAL_DEFAULT, sw.SOFTCLIP, 3, "5M"),
    ("AAACCCCC", "CCCCC", sw.ORIGINAL_DEFAULT, sw.INDEL, 0, "3D5M"),
    ("AAACCCCC", "CCCCC", sw.ORIGINAL_DEFAULT, sw.LEADING_INDEL, 0, "3D5M"),
    ("AAACCCCC", "CCCCC", sw.ORIGINAL_DEFAULT, sw.IGNORE, 3, "5M"),
    (LONG_REF, "AAAAAAA", sw.ORIGINAL_DEFAULT, sw.SOFTCLIP, 359, "7M"),
    (LONG_REF, "AAAAAAA", sw.ORIGINAL_DEFAULT, sw.INDEL, 0, "1M358D6M29D"),
    (LONG_REF, "AAAAAAA", sw.ORIGINAL_DEFAULT, sw.LEADING_INDEL, 0, "1M1D6M"),
    (LONG_REF, "AAAAAAA", sw.ORIGINAL_DEFAULT, sw.IGNORE, 359, "7M"),
]


@pytest.mark.parametrize("ref,alt,params,overhang,exp_off,exp_cigar", CASES)
def test_sw_golden(ref, alt, params, overhang, exp_off, exp_cigar):
    a = sw.align(ref.encode(), alt.encode(), params, overhang)
    assert a.cigar == exp_cigar
    assert a.offset == exp_off


def test_identical_alignments_with_differing_flank_lengths():
    padded_ref = "GCGTCGCAGTCTTAAGGCCCCGCCTTTTCAGACAGCTTCCGCTGGGCCTGGGCCGCTGCGGGGCGGTCACGGCCCCTTTAAGCCTGAGCCCCGCCCCCTGGCTCCCCGCCCCCTCTTCTCCCCTCCCCCAAGCCAGCACCTGGTGCCCCGGCGGGTCGTGCGGCGCGGCGCTCCGCGGTGAGCGCCTGACCCCGAGGGGGCCCGGGGCCGCGTCCCTGGGCCCTCCCCACCCTTGCGGTGGCCTCGCGGGTCCCAGGGGCGGGGCTGGAGCGGCAGCAGGGCCGGGGAGATGGGCGGTGGGGAGCGCGGGAGGGACCGGGCCGAGCCGGGGGAAGGGCTCCGGTGACT"
    padded_hap = "GCGTCGCAGTCTTAAGGCCCCGCCTTTTCAGACAGCTTCCGCTGGGCCTGGGCCGCTGCGGGGCGGTCACGGCCCCTTTAAGCCTGAGCCCCGCCCCCTGGCTCCCCGCCCCCTCTTCTCCCCTCCCCCAAGCCAGCACCTGGTGCCCCGGCGGGTCGTGCGGCGCGGCGCTCCGCGGTGAGCGCCTGACCCCGA--GGGCC---------------GGGCCCTCCCCACCCTTGCGGTGGCCTCGCGGGTCCCAGGGGCGGGGCTGGAGCGGCAGCAGGGCCGGGGAGATGGGCGGTGGGGAGCGCGGGAGGGACCGGGCCGAGCCGGGGGAAGGGCTCCGGTGACT".replace("-", "")
    not_padded_ref = "CTTTAAGCCTGAGCCCCGCCCCCTGGCTCCCCGCCCCCTCTTCTCCCCTCCCCCAAGCCAGCACCTGGTGCCCCGGCGGGTCGTGCGGCGCGGCGCTCCGCGGTGAGCGCCTGACCCCGAGGGGGCCCGGGGCCGCGTCCCTGGGCCCTCCCCACCCTTGCGGTGGCCTCGCGGGTCCCAGGGGCGGGGCTGGAGCGGCAGCAGGGCCGGGGAGATGGGCGGTGGGGAGCGCGGGAGGGA"
    not_padded_hap = "CTTTAAGCCTGAGCCCCGCCCCCTGGCTCCCCGCCCCCTCTTCTCCCCTCCCCCAAGCCAGCACCTGGTGCCCCGGCGGGTCGTGCGGCGCGGCGCTCCGCGGTGAGCGCCTGACCCCGA---------GGGCC--------GGGCCCTCCCCACCCTTGCGGTGGCCTCGCGGGTCCCAGGGGCGGGGCTGGAGCGGCAGCAGGGCCGGGGAGATGGGCGGTGGGGAGCGCGGGAGGGA".replace("-", "")
    pad = "N" * 10
    a1 = sw.align((pad + padded_ref + pad).encode(), (pad + padded_hap + pad).encode(), sw.NEW_SW_PARAMETERS, sw.SOFTCLIP)
    a2 = sw.align((pad + not_padded_ref + pad).encode(), (pad + not_padded_hap + pad).encode(), sw.NEW_SW_PARAMETERS, sw.SOFTCLIP)
    assert len(a1.cigar_ops) == len(a2.cigar_ops)
    for o1, l1, o2, l2 in zip(a1.cigar_ops, a1.cigar_lens, a2.cigar_ops, a2.cigar_lens):
        if o1 == 0 and o2 == 0:
            continue
        assert o1 == o2 and l1 == l2


def test_exact_match_fast_path():
    a = sw.align(b"ACGTACGT", b"ACGTACGT", sw.ORIGINAL_DEFAULT, sw.SOFTCLIP)
    assert a.cigar == "8M" and a.offset == 0


def test_cigar_consumes_full_alt():
    """Property: for SOFTCLIP, cigar read-length must equal alt length."""
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for _ in range(50):
        ref = bases[rng.integers(0, 4, int(rng.integers(20, 200)))].tobytes()
        alt = bases[rng.integers(0, 4, int(rng.integers(10, 150)))].tobytes()
        for ov in (sw.SOFTCLIP, sw.INDEL, sw.LEADING_INDEL, sw.IGNORE):
            a = sw.align(ref, alt, sw.ORIGINAL_DEFAULT, ov)
            consumed = sum(
                int(l) for o, l in zip(a.cigar_ops, a.cigar_lens) if o in (0, 1, 4)
            )
            if ov == sw.SOFTCLIP:
                assert consumed == len(alt), (a.cigar, len(alt))
