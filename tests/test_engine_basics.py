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
    # VCF mode emits the RAW reducible forms, like the reference
    # (expected.testVCFMode.gatk4.alleleSpecific.vcf); finalized AS_ values
    # come from GenotypeGVCFs / VariantAnnotator
    for key in ("AS_SB_TABLE", "AS_RAW_MQ", "AS_RAW_BaseQRankSum",
                "AS_RAW_MQRankSum", "AS_RAW_ReadPosRankSum"):
        assert key in info, key
    assert "|" in info["AS_SB_TABLE"]
    # integer value,count list sections (CompressedDataList form)
    ref_sec = info["AS_RAW_MQRankSum"].split("|")[0]
    assert ref_sec == "60,10", ref_sec


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


def test_region_trimmer_spans_and_haplotype_trim():
    """AssemblyRegionTrimmer math (snp padding 20 / indel padding 75) and
    Haplotype.trim semantics (boundary deletions dropped, events preserved)."""
    import numpy as np

    from gatk_tpu.assembly.haplotype import Event, Haplotype, build_event_map
    from gatk_tpu.calling import region_trimmer as rt
    from gatk_tpu.engine.intervals import Interval

    span = Interval("c", 1000, 1400)
    padded = Interval("c", 900, 1500)
    # snp at 1200, del at 1300
    got = rt.compute_trim_spans([Event(1200, "A", "C"),
                                 Event(1300, "AT", "A")], span, padded)
    vspan, pv = got
    assert (vspan.start, vspan.end) == (1200, 1302)
    assert pv.start == 1200 - 20 and pv.end == 1302 + 75
    # events outside the active span are ignored
    assert rt.compute_trim_spans([Event(1450, "A", "C")], span, padded) is None

    # haplotype trim around a SNP
    rng = np.random.default_rng(0)
    ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), 300)
    hap_bases = ref.copy()
    hap_bases[150] = ord("T") if ref[150] != ord("T") else ord("A")
    ref_start = 1000
    h = Haplotype(hap_bases.tobytes(), cigar_ops=np.array([0], np.uint8),
                  cigar_lens=np.array([300], np.int32), alignment_start=1000)
    build_event_map(h, ref, ref_start)
    assert len(h.events) == 1
    res = rt.trim_assembly([h, Haplotype(ref.tobytes(), is_ref=True,
                                         cigar_ops=np.array([0], np.uint8),
                                         cigar_lens=np.array([300], np.int32),
                                         alignment_start=1000)],
                           ref, ref_start, Interval("c", 1050, 1250),
                           Interval("c", 1000, 1300))
    assert res is not None
    haps, vspan, pv, new_ref, new_start = res
    assert (vspan.start, vspan.end) == (1150, 1151)
    assert pv.start == 1130 and pv.end == 1171
    assert new_start == pv.start
    assert all(len(nh.bases) == pv.end - pv.start for nh in haps)
    alt = next(nh for nh in haps if nh.events)
    assert alt.events[0].start == 1150  # event preserved at the same locus


def test_region_trimmer_indel_haplotype():
    """Deletion haplotypes trim with the cigar respected (D spans excluded from
    bases, boundary deletions dropped)."""
    import numpy as np

    from gatk_tpu.assembly.haplotype import Haplotype, build_event_map
    from gatk_tpu.calling import region_trimmer as rt
    from gatk_tpu.engine.intervals import Interval

    rng = np.random.default_rng(1)
    ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), 200)
    # 5bp deletion at ref offset 100-105
    hap_bases = np.concatenate([ref[:100], ref[105:]])
    h = Haplotype(hap_bases.tobytes(),
                  cigar_ops=np.array([0, 2, 0], np.uint8),
                  cigar_lens=np.array([100, 5, 95], np.int32),
                  alignment_start=0)
    rh = Haplotype(ref.tobytes(), is_ref=True,
                   cigar_ops=np.array([0], np.uint8),
                   cigar_lens=np.array([200], np.int32), alignment_start=0)
    build_event_map(h, ref, 0)
    assert len(h.events) == 1 and h.events[0].is_indel()
    res = rt.trim_assembly([rh, h], ref, 0, Interval("c", 50, 150),
                           Interval("c", 0, 200))
    assert res is not None
    haps, vspan, pv, new_ref, new_start = res
    alt = next(nh for nh in haps if nh.events)
    ev = alt.events[0]
    assert ev.is_indel() and len(ev.ref) == 6
    assert ev.start == 99
    # the trimmed alt is 5bp shorter than the window
    assert len(alt.bases) == (pv.end - pv.start) - 5


def test_standard_interval_argument_collection():
    """IntervalArgumentCollection semantics via the shared arg collections
    (cli_args.py): -ip padding, UNION/INTERSECTION set rules, -XL subtraction
    with -ixp padding."""
    import argparse

    from gatk_tpu import cli_args
    from gatk_tpu.engine.intervals import Interval

    cl = {"chr1": 10000, "chr2": 10000}

    def resolve(argv):
        p = argparse.ArgumentParser()
        cli_args.add_interval_args(p)
        return cli_args.resolve_intervals(p.parse_args(argv), cl)

    assert resolve([]) is None
    got = resolve(["-L", "chr1:101-200", "-ip", "50"])
    assert got == [Interval("chr1", 50, 250)]
    # UNION merges overlapping -L values
    got = resolve(["-L", "chr1:101-200", "-L", "chr1:150-300"])
    assert got == [Interval("chr1", 100, 300)]
    # INTERSECTION intersects across -L values
    got = resolve(["-L", "chr1:101-200", "-L", "chr1:150-300",
                   "-isr", "INTERSECTION"])
    assert got == [Interval("chr1", 149, 200)]
    # -XL punches a hole (with -ixp padding)
    got = resolve(["-L", "chr1:101-500", "-XL", "chr1:201-300", "-ixp", "10"])
    assert got == [Interval("chr1", 100, 190), Interval("chr1", 310, 500)]
    # -XL without -L excludes from whole contigs
    got = resolve(["-XL", "chr1:1-9000"])
    assert Interval("chr1", 9000, 10000) in got and \
        Interval("chr2", 0, 10000) in got
