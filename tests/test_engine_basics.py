import numpy as np
import pytest

from gatk_tpu.engine import clipping, intervals
from gatk_tpu.io import sam
from gatk_tpu.io.reads import Read


def mk_read(pos, cigar, seq=None, quals=None, name="r1"):
    ops, lens = sam.cigar_from_string(cigar)
    n = sam.cigar_read_length(ops, lens)
    if seq is None:
        seq = np.frombuffer((b"ACGT" * (n // 4 + 1))[:n], dtype=np.uint8).copy()
    if quals is None:
        quals = np.full(n, 30, np.uint8)
    return Read(name, 0, 0, pos, 60, ops, lens, np.asarray(seq, np.uint8), np.asarray(quals, np.uint8))


class TestIntervals:
    def test_parse(self):
        iv = intervals.parse_interval("chr1:100-200")
        assert iv == intervals.Interval("chr1", 99, 200)
        iv = intervals.parse_interval("20:10,000,000-10,100,000")
        assert iv.start == 9999999 and iv.end == 10100000
        iv = intervals.parse_interval("chrM", {"chrM": 16569})
        assert iv.size == 16569

    def test_merge_and_split(self):
        ivs = [intervals.Interval("c", 0, 100), intervals.Interval("c", 50, 150),
               intervals.Interval("c", 200, 300)]
        merged = intervals.merge_overlapping(ivs)
        assert merged == [intervals.Interval("c", 0, 150), intervals.Interval("c", 200, 300)]
        parts = intervals.split_interval(intervals.Interval("c", 0, 250), 100)
        assert [p.size for p in parts] == [100, 100, 50]

    def test_shards(self):
        sh = intervals.Shard.make(intervals.Interval("c", 100, 200), 50, 220)
        assert sh.padded == intervals.Interval("c", 50, 220)


class TestClipping:
    def test_clip_left_simple(self):
        r = mk_read(100, "10M")
        c = clipping._clip_left(r, 3)
        assert c.pos == 103 and sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "7M"
        assert len(c.bases) == 7

    def test_clip_right_simple(self):
        r = mk_read(100, "10M")
        c = clipping._clip_right(r, 7)
        assert c.pos == 100 and sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "7M"

    def test_clip_through_insertion(self):
        r = mk_read(100, "4M2I4M")
        c = clipping._clip_left(r, 5)  # removes 4M and 1 of the I
        assert c.pos == 104
        assert sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "1I4M"

    def test_clip_through_deletion(self):
        r = mk_read(100, "4M2D4M")
        c = clipping._clip_left(r, 4)
        # the leading deletion is dropped and start moves past it
        assert c.pos == 106
        assert sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "4M"

    def test_hard_clip_to_interval(self):
        r = mk_read(100, "10M")
        c = clipping.hard_clip_to_interval(r, 103, 108)
        assert c.pos == 103 and c.end == 108
        assert len(c.bases) == 5

    def test_revert_soft_clips(self):
        r = mk_read(100, "3S5M2S")
        c = clipping.revert_soft_clipped_bases(r)
        assert c.pos == 97
        assert sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "10M"
        assert len(c.bases) == 10

    def test_hard_clip_soft_clips(self):
        r = mk_read(100, "3S5M2S")
        c = clipping.hard_clip_soft_clipped_bases(r)
        assert c.pos == 100
        assert sam.cigar_to_string(c.cigar_ops, c.cigar_lens) == "5M"
        assert len(c.bases) == 5

    def test_low_qual_ends(self):
        q = np.array([2, 2, 30, 30, 30, 30, 2], np.uint8)
        r = mk_read(100, "7M", quals=q)
        c = clipping.hard_clip_low_qual_ends(r, 9)
        assert c.pos == 102 and len(c.bases) == 4

    def test_unclipped_start_end(self):
        r = mk_read(100, "3S5M2S")
        assert r.unclipped_start() == 97
        assert r.unclipped_end() == 107


def test_read_filter_library_registry():
    """ReadFilterLibrary-style registry: named toggles + counting summary
    (engine/filters/ReadFilterLibrary.java + CountingReadFilter.java)."""
    import numpy as np

    from gatk_tpu.engine import filters
    from gatk_tpu.io.reads import Read

    def mk(mapq=60, flag=0, tlen=100, n=50):
        return Read("r", flag, 0, 100, mapq,
                    np.array([0], np.uint8), np.array([n], np.int32),
                    np.full(n, ord("A"), np.uint8), np.full(n, 30, np.uint8),
                    tlen=tlen, tags={"RG": "rg1"})

    assert len(filters.READ_FILTER_LIBRARY) >= 25
    stack = filters.build_filter_stack(filters.HC_DEFAULT_FILTER_NAMES)
    assert stack(mk())
    assert not stack(mk(mapq=10))
    assert stack.counts["MappingQualityReadFilter"] == 1
    # disabling the MQ filter lets the low-MQ read through
    stack2 = filters.build_filter_stack(
        filters.HC_DEFAULT_FILTER_NAMES, disable=["MappingQualityReadFilter"])
    assert stack2(mk(mapq=10))
    # enabling an extra filter rejects unpaired reads
    stack3 = filters.build_filter_stack(
        filters.HC_DEFAULT_FILTER_NAMES, enable=["PairedReadFilter"])
    assert not stack3(mk())
    assert stack3(mk(flag=0x1 | 0x2))
    # summary lines mention filtered counts
    assert any("MappingQualityReadFilter" in l for l in stack.summary_lines())
    # parameterized filters
    assert filters.ReadLengthReadFilter(10, 60)(mk())
    assert not filters.ReadLengthReadFilter(51, 60)(mk())
    assert filters.FragmentLengthReadFilter(150)(mk())
    assert not filters.FragmentLengthReadFilter(50)(mk())
    nread = mk()
    nread.bases[:10] = ord("N")
    assert not filters.AmbiguousBaseReadFilter(0.05)(nread)
    assert filters.AmbiguousBaseReadFilter(0.5)(nread)


def test_as_annotations_emitted():
    """-G AS_StandardAnnotation adds the AS_* spine to INFO."""
    import numpy as np

    from gatk_tpu.assembly.haplotype import Haplotype, build_event_map
    from gatk_tpu.calling.genotyping_engine import assign_genotype_likelihoods
    from gatk_tpu.calling.likelihoods import AlleleLikelihoods
    from gatk_tpu.io.reads import Read

    ref = "ACGTACGTACGTACGTACGT"
    alt = ref[:10] + "T" + ref[11:]

    def hap(bases, is_ref=False):
        h = Haplotype(bases=bases.encode(), is_ref=is_ref,
                      cigar_ops=np.array([0], np.uint8),
                      cigar_lens=np.array([len(bases)], np.int32),
                      alignment_start=0)
        build_event_map(h, np.frombuffer(ref.encode(), np.uint8), 0)
        return h

    haps = [hap(ref, True), hap(alt)]
    reads = []
    for i in range(20):
        bases = (ref if i % 2 else alt).encode()
        reads.append(Read(f"r{i}", 16 if i % 3 == 0 else 0, 0, 0, 60,
                          np.array([0], np.uint8), np.array([len(bases)], np.int32),
                          np.frombuffer(bases, np.uint8).copy(),
                          np.full(len(bases), 30, np.uint8)))
    values = np.zeros((2, 20))
    values[0, 0::2] = -8.0
    values[1, 1::2] = -8.0
    lik = AlleleLikelihoods(haps, reads, values)
    variants = assign_genotype_likelihoods(
        haps, lik, np.frombuffer(ref.encode(), np.uint8), 0, 0, len(ref),
        "chr1", "S", as_annotations=True)
    assert variants
    info = variants[0].info
    for key in ("AS_SB_TABLE", "AS_FS", "AS_SOR", "AS_MQ",
                "AS_BaseQRankSum", "AS_ReadPosRankSum", "AS_QD"):
        assert key in info, key
    assert "|" in info["AS_SB_TABLE"]


def _mini_region(alt_reads=10, ref_reads=10, lik_sep=-8.0):
    """(haps, reads, likelihoods, ref array) for a 1-SNP toy region."""
    import numpy as np

    from gatk_tpu.assembly.haplotype import Haplotype, build_event_map
    from gatk_tpu.calling.likelihoods import AlleleLikelihoods
    from gatk_tpu.io.reads import Read

    ref = "ACGTACGTACGTACGTACGT"
    alt = ref[:10] + "T" + ref[11:]

    def hap(bases, is_ref=False):
        h = Haplotype(bases=bases.encode(), is_ref=is_ref,
                      cigar_ops=np.array([0], np.uint8),
                      cigar_lens=np.array([len(bases)], np.int32),
                      alignment_start=0)
        build_event_map(h, np.frombuffer(ref.encode(), np.uint8), 0)
        return h

    haps = [hap(ref, True), hap(alt)]
    n = alt_reads + ref_reads
    reads = []
    for i in range(n):
        bases = (alt if i < alt_reads else ref).encode()
        reads.append(Read(f"r{i}", 0, 0, 0, 60,
                          np.array([0], np.uint8), np.array([len(bases)], np.int32),
                          np.frombuffer(bases, np.uint8).copy(),
                          np.full(len(bases), 30, np.uint8)))
    values = np.zeros((2, n))
    values[0, :alt_reads] = lik_sep   # alt reads dislike the ref haplotype
    values[1, alt_reads:] = lik_sep   # ref reads dislike the alt haplotype
    lik = AlleleLikelihoods(haps, reads, values)
    return haps, reads, lik, np.frombuffer(ref.encode(), np.uint8)


def test_output_modes():
    """--output-mode gates (walkers/genotyper/OutputMode.java): VARIANTS_ONLY
    drops low-confidence sites, CONFIDENT_SITES emits confident hom-ref calls,
    ACTIVE_SITES force-emits with the LowQual filter."""
    from gatk_tpu.calling.genotyping_engine import assign_genotype_likelihoods

    # all-ref reads: the site is a confident hom-ref -> not a variant
    common = dict(ref_start=0, span_start=0, span_end=20, contig="chr1",
                  sample="S")

    def run(mode):
        haps, _reads, lik, ref = _mini_region(alt_reads=0, ref_reads=20)
        return assign_genotype_likelihoods(haps, lik, ref_bases=ref,
                                           output_mode=mode, **common)

    assert run("EMIT_VARIANTS_ONLY") == []
    got = run("EMIT_ALL_CONFIDENT_SITES")
    assert len(got) == 1
    assert got[0].samples[0]["GT"] == "0/0"
    assert got[0].filters == ()
    got = run("EMIT_ALL_ACTIVE_SITES")
    assert len(got) == 1 and got[0].filters == ("LowQual",)


def test_genotype_assignment_posteriors_matches_pls_when_clear():
    """USE_POSTERIOR_PROBABILITIES must agree with USE_PLS_TO_ASSIGN on a
    clear-cut het (the prior can't flip a strong likelihood)."""
    from gatk_tpu.calling.genotyping_engine import assign_genotype_likelihoods

    for method in ("USE_PLS_TO_ASSIGN", "USE_POSTERIOR_PROBABILITIES"):
        haps, reads, lik, ref = _mini_region(alt_reads=10, ref_reads=10)
        got = assign_genotype_likelihoods(
            haps, lik, ref_bases=ref, ref_start=0, span_start=0, span_end=20,
            contig="chr1", sample="S", genotype_assignment_method=method)
        assert len(got) == 1, method
        assert got[0].samples[0]["GT"] == "0/1", method
