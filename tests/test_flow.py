"""Flow-space (Ultima) machinery tests.

Key codec cases mirror FlowBasedKeyCodec's documented examples
(FlowBasedKeyCodec.java:103-115); DP properties mirror what
FlowBasedPairHMMUnitTest exercises (perfect match beats mismatch, symmetric
batched == host f64)."""
import numpy as np
import pytest

from gatk_tpu.ops import flow, flow_pairhmm


def k(s):
    return np.frombuffer(s.encode(), dtype=np.uint8)


class TestKeyCodec:
    def test_base_array_to_key_doc_example(self):
        # TTTATGC over TGCA -> 0030101101 is the javadoc example read right to
        # left of the flow cycle; verify against a hand-computed walk.
        key = flow.base_array_to_key(k("TTTATGC"), "TGCA")
        # T:3, G:0, C:0, A:1, T:1, G:1, C:1 -> walk: T=3, G=0, C=0, A=1, T=0?
        # hand-walk: flows T,G,C,A,T,G,C,A...
        # T->TTT(3) G->0 C->0 A->A(1) T->T(1) G->G(1) C->C(1)
        assert key.tolist() == [3, 0, 0, 1, 1, 1, 1]

    def test_key_roundtrip_bases(self):
        rng = np.random.default_rng(1)
        bases = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 60)]
        key = flow.base_array_to_key(bases, "TGCA")
        fo = flow.flow_to_base("TGCA", len(key))
        recon = np.concatenate([np.full(c, b, np.uint8) for c, b in zip(key, fo)]
                               or [np.zeros(0, np.uint8)])
        assert np.array_equal(recon, bases)

    def test_key_to_base(self):
        key = np.array([3, 0, 0, 1, 1, 1, 1])
        assert flow.key_to_base(key).tolist() == [-1, 2, 2, 2, 3, 4, 5]

    def test_base_array_to_key_space_doc_example(self):
        # javadoc: TTTATGC, scores 1..7 -> [d,d,1,1,4,4,5,6,6,7] over ACTG...
        # our walk over TGCA gives key [3,0,0,1,1,1,1]; min-per-run + carry
        out = flow.base_array_to_key_space(
            k("TTTATGC"), 7, np.array([1, 2, 3, 4, 5, 6, 7]), 9, "TGCA")
        assert out.tolist() == [1, 1, 1, 4, 5, 6, 7]

    def test_period_guard(self):
        with pytest.raises(ValueError):
            flow.base_array_to_key(k("AXXT"), "TGCA")


class TestFlowBasedRead:
    def test_flow_matrix_call_probs(self):
        r = flow.FlowBasedRead(k("TTGCA"), np.full(5, 30, np.uint8))
        # no tp tag: every called hmer gets prob 1 - sum(min fills)
        for f, run in enumerate(r.key):
            p = r.get_prob(f, int(run))
            assert p > 0.98
            if run > 0:
                assert r.get_prob(f, int(run) + 1) == pytest.approx(
                    r.per_hmer_min_error)

    def test_tp_tag_moves_error_mass(self):
        # read TT with tp=[-1,-1]: q-derived error prob lands on hmer 1
        r = flow.FlowBasedRead(k("TT"), np.array([20, 20], np.uint8),
                               tp=np.array([-1, -1]))
        key_flow = int(np.argmax(r.key))
        assert r.get_prob(key_flow, 1) == pytest.approx(2 * 1e-2)
        assert r.get_prob(key_flow, 2) == pytest.approx(1 - 0.002 - 0.02 + 0.001, abs=0.03)

    def test_prob_table_caps_at_max_hmer(self):
        r = flow.FlowBasedRead(k("TTGCA"), np.full(5, 30, np.uint8), max_hmer=3)
        tab = r.prob_table(8)
        assert tab.shape == (r.n_flows, 9)
        assert np.array_equal(tab[:, 3], tab[:, 8])


def _mk_read(bases, qual=35, tp_spread=True):
    b = k(bases)
    tp = None
    if tp_spread:
        tp = np.zeros(len(b), np.int8)
        tp[::2] = -1  # half of each hmer's bases report a -1 error hypothesis
    return flow.FlowBasedRead(b, np.full(len(b), qual, np.uint8), tp=tp)


class TestFlowPairHMM:
    HAP = "TTGCAATGGCATTTGCAGGTTACA"

    def test_perfect_match_beats_mismatch(self):
        hap = flow.FlowBasedHaplotype(k(self.HAP))
        read_match = _mk_read(self.HAP[:16])
        alt = "GG" + self.HAP[2:14]  # TT->GG hmer swap
        read_mm = _mk_read(alt)
        lm = flow_pairhmm.flow_pairhmm_log10(hap, read_match)
        lx = flow_pairhmm.flow_pairhmm_log10(hap, read_mm)
        assert lm > lx
        assert lm > -3.0  # near-certain match
        assert lx < lm - 3.0

    def test_hmer_length_error_penalized(self):
        hap = flow.FlowBasedHaplotype(k(self.HAP))
        read_short = _mk_read("T" + self.HAP[2:16])  # TT -> T
        lm = flow_pairhmm.flow_pairhmm_log10(hap, _mk_read(self.HAP[:15]))
        ls = flow_pairhmm.flow_pairhmm_log10(hap, read_short)
        assert lm > ls

    def test_batched_jax_matches_host(self):
        haps = [flow.FlowBasedHaplotype(k(self.HAP)),
                flow.FlowBasedHaplotype(k(self.HAP[:4] + "T" + self.HAP[4:])),
                flow.FlowBasedHaplotype(k(self.HAP.replace("GG", "GC", 1)))]
        reads = [_mk_read(self.HAP[:16]),
                 _mk_read(self.HAP[4:20]),
                 _mk_read("T" + self.HAP[2:18]),
                 _mk_read(self.HAP[:12], qual=20, tp_spread=False)]
        mat = flow_pairhmm.compute_flow_likelihood_matrix(haps, reads)
        assert mat.shape == (4, 3)
        for ri, r in enumerate(reads):
            for hi, h in enumerate(haps):
                want = flow_pairhmm.flow_pairhmm_log10(h, r)
                assert mat[ri, hi] == pytest.approx(want, abs=2e-3), (ri, hi)

    def test_engine_plumbing(self):
        from gatk_tpu.calling.hc_engine import HCArgs
        args = HCArgs(likelihood_engine="FlowBasedHMM")
        assert args.flow_order == "TGCA"


def test_flow_feature_mapper(tmp_path):
    """FlowFeatureMapper: per-read SNV features with the identical-base
    surround rule, X_* evidence fields, coordinate-sorted output."""
    import numpy as np

    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import bam as bamio, sam as samio, vcf as vcfio
    from gatk_tpu.io.reads import Read

    ref_seq = "ACGTACGTACGTACGTACGTACGTACGTACGT"  # 32bp
    ref_path = str(tmp_path / "ref.fasta")
    with open(ref_path, "w") as fh:
        fh.write(">c1\n" + ref_seq + "\n")
    with open(ref_path + ".fai", "w") as fh:
        fh.write("c1\t32\t4\t32\t33\n")

    header = samio.SamHeader(sequences=[samio.SequenceRecord("c1", 32, 0)])
    bam_path = str(tmp_path / "r.bam")
    w = bamio.BamWriter(bam_path, header)

    def mk(name, pos, seq, flag=0):
        return Read(name=name, flag=flag, ref_id=0, pos=pos, mapq=60,
                    cigar_ops=np.array([0], np.uint8),
                    cigar_lens=np.array([len(seq)], np.int32),
                    bases=np.frombuffer(seq.encode(), np.uint8).copy(),
                    quals=np.full(len(seq), 30, np.uint8))

    # read 1: SNV at ref pos 10 (G->T), well surrounded
    alt = ref_seq[4:10] + "T" + ref_seq[11:20]
    w.write(mk("r1", 4, alt))
    # read 2: matches the reference exactly -> no features
    w.write(mk("r2", 4, ref_seq[4:20]))
    # read 3: mismatch at the first base -> fails the surround rule
    w.write(mk("r3", 4, "T" + ref_seq[5:20]))
    # read 4: duplicate flag -> filtered
    w.write(mk("r4", 4, alt, flag=0x400))
    w.close()

    out = str(tmp_path / "features.vcf")
    assert TOOL_REGISTRY["FlowFeatureMapper"](
        ["-I", bam_path, "-R", ref_path, "-O", out]) == 0
    recs = list(vcfio.VcfReader(out))
    assert len(recs) == 1
    v = recs[0]
    assert v.contig == "c1" and v.pos == 10
    assert v.ref == "G" and v.alts == ("T",)
    assert v.info["X_RN"] == "r1"
    assert v.info["X_INDEX"] == "6"
    assert v.info["X_EDIST"] == "1"
    assert float(v.info["X_SCORE"]) == 3.0  # qual 30 / 10 (non-flow fallback)


def test_hap_collapsing_roundtrip():
    """LongHomopolymerHaplotypeCollapsingEngine: a haplotype whose 14-mer was
    collapsed to 12 by the sequencer is re-expanded against the reference."""
    import numpy as np

    from gatk_tpu.calling import hap_collapsing as hc

    rng = np.random.default_rng(5)
    left = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 30))
    right = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 30))
    ref = left + b"A" * 14 + right
    assert hc.needs_collapsing(ref, 12)
    assert not hc.needs_collapsing(ref, 15)
    collapsed = hc.collapse_bases(ref, 12)
    assert collapsed == left + b"A" * 12 + right
    # uncollapse restores the full homopolymer
    bases, offset, was_collapsed = hc.uncollapse_by_ref(collapsed, ref, 12)
    assert was_collapsed
    assert bases == ref
    # a real SNP next to the homopolymer survives uncollapsing
    snp = bytearray(collapsed)
    snp[10] = ord("A") if snp[10] != ord("A") else ord("C")
    bases2, _o, _c = hc.uncollapse_by_ref(bytes(snp), ref, 12)
    assert len(bases2) == len(ref)
    assert bases2[10] == snp[10]
    assert bases2[30:44] == b"A" * 14


def test_uncollapse_haplotypes_event_maps():
    import numpy as np

    from gatk_tpu.assembly.haplotype import Haplotype, build_event_map
    from gatk_tpu.calling import hap_collapsing as hc

    rng = np.random.default_rng(7)
    left = bytes(rng.choice(np.frombuffer(b"CGT", np.uint8), 25))
    right = bytes(rng.choice(np.frombuffer(b"CGT", np.uint8), 25))
    ref = left + b"A" * 15 + right
    ref_arr = np.frombuffer(ref, np.uint8)
    collapsed = hc.collapse_bases(ref, 12)
    snp = bytearray(collapsed)
    snp[5] = ord("G") if snp[5] != ord("G") else ord("T")
    h_ref = Haplotype(ref, is_ref=True, cigar_ops=np.array([0], np.uint8),
                      cigar_lens=np.array([len(ref)], np.int32), alignment_start=500)
    h_alt = Haplotype(bytes(snp))
    out = hc.uncollapse_haplotypes([h_ref, h_alt], ref_arr, 500, 12)
    assert len(out) == 2
    alt = next(h for h in out if not h.is_ref)
    assert len(alt.bases) == len(ref)  # homopolymer restored
    assert len(alt.events) == 1
    assert alt.events[0].start == 505 and alt.events[0].is_snp()
