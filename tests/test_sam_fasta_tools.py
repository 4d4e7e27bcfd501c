"""Tests for the read/FASTA/VCF utility tool tranche (picard surface:
MergeSamFiles, RevertSam, ValidateSamFile, BuildBamIndex, FixMateInformation,
SetNmMdAndUqTags, CreateSequenceDictionary, ShiftFasta, GatherVcfs, LiftoverVcf,
CollectAlignmentSummaryMetrics, plotting...)."""
import os

import numpy as np
import pytest

from gatk_tpu.cli import TOOL_REGISTRY
from gatk_tpu.io import bam, fasta, vcf

MITO = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
        "tools/mutect/mito")
BAM = f"{MITO}/NA12878.bam"
REF = f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta"

needs_mito = pytest.mark.skipif(not os.path.exists(BAM), reason="mito data missing")


def _subset_bam(tmp_path, n=300, name="subset.bam"):
    reader = bam.BamReader(BAM)
    out = str(tmp_path / name)
    w = bam.BamWriter(out, reader.header)
    reads = []
    for i, r in enumerate(reader):
        if i >= n:
            break
        w.write(r)
        reads.append(r)
    w.close()
    return out, reads


@needs_mito
def test_split_and_merge_roundtrip(tmp_path):
    src, reads = _subset_bam(tmp_path)
    shard_dir = str(tmp_path / "shards")
    assert TOOL_REGISTRY["SplitSamByNumberOfReads"](
        ["-I", src, "-O", shard_dir, "--split-to-n-reads", "100"]) == 0
    shards = sorted(os.listdir(shard_dir))
    assert len(shards) == 3
    merged = str(tmp_path / "merged.bam")
    assert TOOL_REGISTRY["MergeSamFiles"](
        ["-O", merged] + [x for s in shards for x in ("-I", os.path.join(shard_dir, s))]) == 0
    got = list(bam.BamReader(merged))
    assert len(got) == len(reads)
    assert [r.pos for r in got] == sorted(r.pos for r in reads)


@needs_mito
def test_revert_sam(tmp_path):
    src, _ = _subset_bam(tmp_path, n=50)
    out = str(tmp_path / "reverted.bam")
    assert TOOL_REGISTRY["RevertSam"](["-I", src, "-O", out]) == 0
    got = list(bam.BamReader(out))
    assert len(got) == 50
    names = [r.name for r in got]
    assert names == sorted(names)  # queryname order
    for r in got:
        assert r.is_unmapped
        assert r.pos == -1 and r.mapq == 0
        assert len(r.cigar_ops) == 0
        assert "NM" not in (r.tags or {})


@needs_mito
def test_validate_sam_file_clean_and_dirty(tmp_path, capsys):
    src, reads = _subset_bam(tmp_path, n=100)
    assert TOOL_REGISTRY["ValidateSamFile"](["-I", src]) == 0
    assert "No errors found" in capsys.readouterr().out
    # corrupt: write a record whose cigar doesn't match the sequence length
    reader = bam.BamReader(src)
    bad = str(tmp_path / "bad.bam")
    w = bam.BamWriter(bad, reader.header)
    for i, r in enumerate(reader):
        if i == 10:
            r.cigar_ops = np.array([0], np.uint8)
            r.cigar_lens = np.array([len(r.bases) + 5], np.int32)
        w.write(r)
    w.close()
    assert TOOL_REGISTRY["ValidateSamFile"](["-I", bad]) == 2
    assert "INVALID_CIGAR" in capsys.readouterr().out


@needs_mito
def test_build_bam_index_queries_match_golden_index(tmp_path):
    """Our .bai must produce identical query results to the reference-shipped
    NA12878.bai (same binning scheme, SAM spec 5.2)."""
    import shutil

    src = str(tmp_path / "mito.bam")
    shutil.copy(BAM, src)
    assert TOOL_REGISTRY["BuildBamIndex"](["-I", src]) == 0
    assert os.path.exists(src + ".bai")
    ours = bam.BamReader(src)
    golden = bam.BamReader(BAM)  # uses the shipped NA12878.bai
    assert ours.index is not None and golden.index is not None
    for lo, hi in ((0, 100), (400, 800), (5000, 5100), (16000, 16569)):
        mine = [(r.name, r.pos) for r in ours.query("chrM", lo, hi)
                if not r.is_unmapped]
        want = [(r.name, r.pos) for r in golden.query("chrM", lo, hi)
                if not r.is_unmapped]
        assert mine == want, (lo, hi, len(mine), len(want))
    # pseudo-bin counts present and correct
    assert 0 in ours.index.meta
    n_mapped = ours.index.meta[0][1][0]
    assert n_mapped == sum(1 for r in bam.BamReader(src) if not r.is_unmapped)


@needs_mito
def test_fix_mate_information(tmp_path):
    # deep coordinate-sorted data: need a larger window for both mates to land
    # in the subset
    src, _ = _subset_bam(tmp_path, n=3000)
    # scramble mate positions
    reader = bam.BamReader(src)
    scrambled = str(tmp_path / "scrambled.bam")
    w = bam.BamWriter(scrambled, reader.header)
    originals = {}
    for r in reader:
        if r.is_paired:
            originals.setdefault(r.name, {})[r.flag & 0x40] = (r.mate_pos, r.tlen)
            r.mate_pos = 0
            r.tlen = 0
        w.write(r)
    w.close()
    out = str(tmp_path / "fixed.bam")
    assert TOOL_REGISTRY["FixMateInformation"](["-I", scrambled, "-O", out]) == 0
    got = {}
    for r in bam.BamReader(out):
        if r.is_paired and not r.flag & (0x100 | 0x800):
            got.setdefault(r.name, {})[r.flag & 0x40] = (r.mate_pos, r.tlen)
    restored = 0
    for name, d in got.items():
        if len(d) == 2 and len(originals.get(name, {})) == 2:
            assert d == originals[name], name
            restored += 1
    assert restored > 5


@needs_mito
def test_set_nm_md_uq_tags(tmp_path):
    """Recomputed NM must equal an independently-counted edit distance, and the
    MD string's match-lengths + mismatch/deletion bases must cover the ref span
    (htsjdk SequenceUtil.calculateMdAndNmTags semantics)."""
    import re

    from gatk_tpu.io import sam

    src, reads = _subset_bam(tmp_path, n=150)
    out = str(tmp_path / "tagged.bam")
    assert TOOL_REGISTRY["SetNmMdAndUqTags"](
        ["-I", src, "-O", out, "-R", REF]) == 0
    ref = fasta.FastaReference(REF)
    checked = 0
    for r in bam.BamReader(out):
        if r.is_unmapped:
            continue
        # independent NM: mismatches in M blocks + inserted + deleted bases
        span = sam.cigar_ref_length(r.cigar_ops, r.cigar_lens)
        rb = ref.fetch("chrM", r.pos, r.pos + span)
        nm = 0
        ri = qi = 0
        for op, ln in zip(r.cigar_ops, r.cigar_lens):
            op, ln = int(op), int(ln)
            if op in (sam.OP_M, sam.OP_EQ, sam.OP_X):
                nm += int(np.count_nonzero(rb[ri : ri + ln] != r.bases[qi : qi + ln]))
                ri += ln
                qi += ln
            elif op == sam.OP_I:
                nm += ln
                qi += ln
            elif op == sam.OP_D:
                nm += ln
                ri += ln
            elif op == sam.OP_S:
                qi += ln
        assert r.tags["NM"] == nm, (r.name, r.tags["NM"], nm)
        md = r.tags["MD"]
        del_bases = sum(len(x) - 1 for x in re.findall(r"\^[ACGTN]+", md))
        stripped = re.sub(r"\^[ACGTN]+", "", md)
        matches = sum(int(x) for x in re.findall(r"\d+", stripped))
        mismatches = len(re.findall(r"[ACGTN]", stripped))
        assert matches + mismatches + del_bases == span, (md, span)
        assert "UQ" in r.tags
        checked += 1
    assert checked > 100


@needs_mito
def test_downsample_sam_deterministic(tmp_path):
    src, _ = _subset_bam(tmp_path, n=400)
    out1, out2 = str(tmp_path / "d1.bam"), str(tmp_path / "d2.bam")
    for out in (out1, out2):
        assert TOOL_REGISTRY["DownsampleSam"](
            ["-I", src, "-O", out, "-P", "0.5"]) == 0
    n1 = [r.name for r in bam.BamReader(out1)]
    n2 = [r.name for r in bam.BamReader(out2)]
    assert n1 == n2  # deterministic
    assert 100 < len(n1) < 300  # ~50%
    # template-consistent: mates share the fate
    kept = set(n1)
    for r in bam.BamReader(src):
        if r.is_paired and r.name in kept:
            pass  # both records of kept names must be in the output
    from collections import Counter

    src_counts = Counter(r.name for r in bam.BamReader(src))
    out_counts = Counter(n1)
    for name, c in out_counts.items():
        assert c == src_counts[name]


@needs_mito
def test_get_sample_name_and_count_bases(tmp_path, capsys):
    src, reads = _subset_bam(tmp_path, n=50)
    assert TOOL_REGISTRY["GetSampleName"](["-I", src]) == 0
    assert capsys.readouterr().out.strip().endswith("NA12878")
    assert TOOL_REGISTRY["CountBases"](["-I", src]) == 0
    assert int(capsys.readouterr().out.strip()) == sum(len(r.bases) for r in reads)


@needs_mito
def test_create_sequence_dictionary_md5_matches_golden(tmp_path):
    out = str(tmp_path / "mt.dict")
    assert TOOL_REGISTRY["CreateSequenceDictionary"](["-R", REF, "-O", out]) == 0
    text = open(out).read()
    # golden M5 from the reference-shipped .dict
    assert "M5:c68f52674c9fb33aef52dcf399755519" in text
    assert "SN:chrM\tLN:16569" in text


@needs_mito
def test_shift_fasta_roundtrip(tmp_path):
    out = str(tmp_path / "shifted.fasta")
    assert TOOL_REGISTRY["ShiftFasta"](["-R", REF, "-O", out]) == 0
    orig = fasta.FastaReference(REF)
    shifted = fasta.FastaReference(out)
    o = orig.fetch("chrM")
    s = shifted.fetch("chrM")
    n = len(o)
    off = n // 2
    assert np.array_equal(s, np.concatenate([o[off:], o[:off]]))
    assert os.path.exists(out + ".shiftback.chain")
    chain = open(out + ".shiftback.chain").read()
    assert chain.startswith("chain")


@needs_mito
def test_fasta_alternate_reference_maker(tmp_path):
    vpath = str(tmp_path / "v.vcf")
    w = vcf.VcfWriter(vpath, ["S"])
    w.write(vcf.Variant(contig="chrM", pos=151, ref="T", alts=("C",),
                        fmt_keys=("GT",), samples=[{"GT": "1/1"}]))
    w.close()
    out = str(tmp_path / "alt.fasta")
    assert TOOL_REGISTRY["FastaAlternateReferenceMaker"](
        ["-R", REF, "-O", out, "-V", vpath]) == 0
    got = fasta.FastaReference(out).fetch("chrM")
    orig = fasta.FastaReference(REF).fetch("chrM")
    assert chr(got[151]) == "C" and chr(orig[151]) == "T"
    assert np.array_equal(got[:151], orig[:151])
    assert np.array_equal(got[152:], orig[152:])


def _write_vcf(path, records):
    w = vcf.VcfWriter(path, ["S"])
    for contig, pos, ref_a, alt in records:
        w.write(vcf.Variant(contig=contig, pos=pos, ref=ref_a, alts=(alt,),
                            fmt_keys=("GT",), samples=[{"GT": "0/1"}]))
    w.close()


def test_gather_vcfs_and_sort_vcf(tmp_path):
    a, b = str(tmp_path / "a.vcf"), str(tmp_path / "b.vcf")
    _write_vcf(a, [("1", 100, "A", "C"), ("1", 200, "G", "T")])
    _write_vcf(b, [("1", 300, "A", "G")])
    out = str(tmp_path / "g.vcf")
    assert TOOL_REGISTRY["GatherVcfs"](["-I", a, "-I", b, "-O", out]) == 0
    assert [v.pos for v in vcf.VcfReader(out)] == [100, 200, 300]
    # out-of-order shards must be rejected
    from gatk_tpu.cli import UserError

    with pytest.raises(UserError):
        TOOL_REGISTRY["GatherVcfs"](["-I", b, "-I", a, "-O", str(tmp_path / "x.vcf")])
    # SortVcf fixes the order instead
    out2 = str(tmp_path / "s.vcf")
    assert TOOL_REGISTRY["SortVcf"](["-I", b, "-I", a, "-O", out2]) == 0
    assert [v.pos for v in vcf.VcfReader(out2)] == [100, 200, 300]


def test_liftover_vcf(tmp_path):
    # target reference: 100bp, source maps [0,50) -> target [10,60)
    tgt_seq = "".join("ACGT"[i % 4] for i in range(100))
    tgt = str(tmp_path / "target.fasta")
    with open(tgt, "w") as fh:
        fh.write(">c1\n" + tgt_seq + "\n")
    with open(tgt + ".fai", "w") as fh:
        fh.write(f"c1\t100\t4\t100\t101\n")
    chain = str(tmp_path / "lift.chain")
    with open(chain, "w") as fh:
        fh.write("chain 100 src 50 + 0 50 c1 100 + 10 60 1\n50\n\n")
    src_vcf = str(tmp_path / "in.vcf")
    # pos 5 on src -> pos 15 on target; target base at 15 is 'T' (15%4==3)
    _write_vcf(src_vcf, [("src", 5, tgt_seq[15], "A" if tgt_seq[15] != "A" else "C"),
                         ("src", 45, "A" if tgt_seq[55] != "A" else "C", "G"),
                         ("other", 5, "A", "C")])
    out, rej = str(tmp_path / "lifted.vcf"), str(tmp_path / "rej.vcf")
    assert TOOL_REGISTRY["LiftoverVcf"](
        ["-I", src_vcf, "-O", out, "-C", chain, "-R", tgt, "--reject", rej]) == 0
    lifted = list(vcf.VcfReader(out))
    assert len(lifted) == 1 and lifted[0].contig == "c1" and lifted[0].pos == 15
    rejects = list(vcf.VcfReader(rej))
    # ref-mismatch at 45 + unmapped contig
    assert len(rejects) == 2
    assert {r.filters[0] for r in rejects} == {"MismatchedRefAllele", "NoTarget"}


@needs_mito
def test_alignment_summary_and_quality_yield_metrics(tmp_path):
    src, reads = _subset_bam(tmp_path, n=200)
    out = str(tmp_path / "asm.txt")
    assert TOOL_REGISTRY["CollectAlignmentSummaryMetrics"](
        ["-I", src, "-O", out]) == 0
    text = open(out).read()
    assert "## METRICS CLASS\tpicard.analysis.AlignmentSummaryMetrics" in text
    lines = [l for l in text.splitlines() if l.startswith(("PAIR", "FIRST", "SECOND"))]
    pair = [l for l in lines if l.startswith("PAIR")][0].split("\t")
    cols = [l for l in text.splitlines() if l.startswith("CATEGORY")][0].split("\t")
    primary = [r for r in reads if not (r.is_secondary or r.is_supplementary) and r.is_paired]
    assert int(pair[cols.index("TOTAL_READS")]) == len(primary)
    aligned = [r for r in primary if not r.is_unmapped and not r.flag & 0x200]
    assert int(pair[cols.index("PF_READS_ALIGNED")]) == len(aligned)

    qy = str(tmp_path / "qy.txt")
    assert TOOL_REGISTRY["CollectQualityYieldMetrics"](["-I", src, "-O", qy]) == 0
    text = open(qy).read()
    row = text.splitlines()[[i for i, l in enumerate(text.splitlines())
                             if l.startswith("TOTAL_READS")][0] + 1].split("\t")
    n_primary = sum(1 for r in reads if not (r.is_secondary or r.is_supplementary))
    assert int(row[0]) == n_primary
    want_bases = sum(len(r.bases) for r in reads
                     if not (r.is_secondary or r.is_supplementary))
    assert int(row[3]) == want_bases


def test_plot_tools(tmp_path):
    cr = str(tmp_path / "cr.tsv")
    with open(cr, "w") as fh:
        fh.write("@HD\tVN:1.6\n@SQ\tSN:c1\tLN:10000\n")
        fh.write("CONTIG\tSTART\tEND\tLOG2_COPY_RATIO\n")
        for i in range(50):
            fh.write(f"c1\t{i * 100 + 1}\t{i * 100 + 100}\t{(i % 7 - 3) / 10}\n")
    seg = str(tmp_path / "model.seg")
    with open(seg, "w") as fh:
        fh.write("@HD\tVN:1.6\n")
        fh.write("CONTIG\tSTART\tEND\tNUM_POINTS_COPY_RATIO\t"
                 "LOG2_COPY_RATIO_POSTERIOR_10\tLOG2_COPY_RATIO_POSTERIOR_50\t"
                 "LOG2_COPY_RATIO_POSTERIOR_90\n")
        fh.write("c1\t1\t2500\t25\t-0.1\t0.0\t0.1\n")
        fh.write("c1\t2501\t5000\t25\t0.2\t0.3\t0.4\n")
    outdir = str(tmp_path / "plots")
    assert TOOL_REGISTRY["PlotDenoisedCopyRatios"](
        ["--standardized-copy-ratios", cr, "--denoised-copy-ratios", cr,
         "-O", outdir, "--output-prefix", "t"]) == 0
    assert os.path.getsize(os.path.join(outdir, "t.denoised.png")) > 1000
    assert TOOL_REGISTRY["PlotModeledSegments"](
        ["--denoised-copy-ratios", cr, "--segments", seg,
         "-O", outdir, "--output-prefix", "t"]) == 0
    assert os.path.getsize(os.path.join(outdir, "t.modeled.png")) > 1000


@needs_mito
def test_clip_reads_and_unmark_duplicates(tmp_path):
    src, _ = _subset_bam(tmp_path, n=100)
    out = str(tmp_path / "clipped.bam")
    assert TOOL_REGISTRY["ClipReads"](
        ["-I", src, "-O", out, "-QT", "2"]) == 0
    assert len(list(bam.BamReader(out))) > 0
    out2 = str(tmp_path / "undup.bam")
    assert TOOL_REGISTRY["UnmarkDuplicates"](["-I", src, "-O", out2]) == 0
    assert all(not r.is_duplicate for r in bam.BamReader(out2))


@needs_mito
def test_split_reads_by_sample(tmp_path):
    src, reads = _subset_bam(tmp_path, n=100)
    outdir = str(tmp_path / "split")
    os.makedirs(outdir)
    assert TOOL_REGISTRY["SplitReads"](
        ["-I", src, "-O", outdir, "--split-sample"]) == 0
    files = os.listdir(outdir)
    assert len(files) == 1 and "NA12878" in files[0]
    assert len(list(bam.BamReader(os.path.join(outdir, files[0])))) == 100
