"""DRAGstr tests: default-table golden, STR analysis, decimation, estimation."""
import numpy as np

from conftest import reference_path
from gatk_tpu.utils import dragstr


def test_default_params_golden(tmp_path):
    out = str(tmp_path / "params.txt")
    dragstr.DragstrParams().write(out, [("estimatedOrDefaults", "defaults")])
    golden = reference_path(
        "src/test/resources/org/broadinstitute/hellbender/tools/dragstr/calibrate-dragstr-model-default-output.txt")
    assert open(out).read() == open(golden).read()


def test_params_round_trip(tmp_path):
    out = str(tmp_path / "params.txt")
    p = dragstr.DragstrParams()
    p.write(out)
    back = dragstr.DragstrParams.read(out)
    np.testing.assert_allclose(back.gop, p.gop)
    np.testing.assert_allclose(back.gcp, p.gcp)
    np.testing.assert_allclose(back.api, p.api)


def _b(s):
    return np.frombuffer(s.encode(), np.uint8)


def test_analyze_strs():
    # AAAA: period 1, repeats 4/3/2/1 walking through
    periods, repeats = dragstr.analyze_strs(_b("AAAAT"))
    assert periods[0] == 1 and repeats[0] == 4
    assert repeats[1] == 3 and repeats[3] == 1
    # ACACAC: period 2 x3 at position 0
    periods, repeats = dragstr.analyze_strs(_b("ACACACGT"))
    assert periods[0] == 2 and repeats[0] == 3
    # period 3
    periods, repeats = dragstr.analyze_strs(_b("AGTAGTAGTC"))
    assert periods[0] == 3 and repeats[0] == 3
    # ties go to the smaller period (AAAA is period1 x4, not period2 x2)
    periods, repeats = dragstr.analyze_strs(_b("AAAAC"))
    assert periods[0] == 1


def test_find_and_decimate_loci():
    seq = _b("GC" + "ACACACACAC" + "GT" + "TTTTT" + "C")
    loci = dragstr.find_str_loci(seq)
    # the CA dinucleotide run is anchored at index 1 ("C" + "ACACACACA")
    ac = [l for l in loci if l[1] == 2 and l[2] == 5]
    assert ac and ac[0][0] == 1
    # the T homopolymer run starts at index 13 (the T of "GT") with 6 copies
    tt = [l for l in loci if l[1] == 1 and l[2] == 6]
    assert tt and tt[0][0] == 13
    # decimation keeps 1 in 2^bit: period-2 repeat-2 has bit 9 -> only first kept
    many = [(i, 2, 2, i + 4) for i in range(1024)]
    kept = dragstr.decimate_loci(many)
    assert len(kept) == 2  # counts 0 and 512
    # period-1 repeat-10+ has bit 0 -> all kept
    many1 = [(i, 1, 10, i + 10) for i in range(100)]
    assert len(dragstr.decimate_loci(many1)) == 100


def test_estimation_learns_error_rates():
    """Strata with many indel-carrying reads should get lower GP (more slippage)
    than clean strata."""
    rng = np.random.default_rng(0)
    cases = {}
    for r in range(1, 21):
        n_cases = 100
        # indel error rate grows with repeat length
        err = 0.002 if r <= 5 else 0.2
        cases[(1, r)] = [(30, int(rng.binomial(30, err))) for _ in range(n_cases)]
    params = dragstr.estimate_params(cases)
    # slippage-heavy long repeats get a substantially lower gap penalty
    assert params.gop[0, 19] < params.gop[0, 0] - 5
    # monotone non-increasing GP across repeat lengths for period 1
    gops = params.gop[0]
    assert all(a >= b - 1e-9 for a, b in zip(gops, gops[1:]))


def make_read(pos, cigar, n=None):
    from gatk_tpu.io.reads import Read

    ops, lens = [], []
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            ops.append("MIDNSHP=X".index(ch))
            lens.append(int(num))
            num = ""
    read_len = sum(l for o, l in zip(ops, lens) if "MIDNSHP=X"[o] in "MIS=X")
    return Read("r", 0, 0, pos, 60,
                np.array(ops, np.uint8), np.array(lens, np.int32),
                np.full(read_len, ord("A"), np.uint8),
                np.full(read_len, 30, np.uint8))


def test_collect_case():
    # STR at 0-based [100, 110); reads span padded region [95, 115)
    reads = [make_read(90, "40M"),           # clean spanning read
             make_read(90, "15M2I23M"),      # insertion at ref 105 (inside STR)
             make_read(90, "12M3D25M"),      # deletion at 102-104 (inside STR)
             make_read(104, "30M")]          # does not span padded start
    n, k, min_mq, n_sup = dragstr.collect_case(reads, 1000, 100, 110, padding=5)
    assert n == 3
    assert k == 2
    assert min_mq == 60 and n_sup == 0
