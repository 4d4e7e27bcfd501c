"""Round-5 Picard tranche: per-tool functional tests on real mito data and
synthetic fixtures (picard_tools.py)."""
import os

import numpy as np
import pytest

from gatk_tpu.cli import TOOL_REGISTRY
from gatk_tpu.io import bam, sam, vcf

MITO = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
        "tools/mutect/mito")
BAM = f"{MITO}/NA12878.bam"
VCF_IN = f"{MITO}/unfiltered.vcf"

pytestmark = pytest.mark.skipif(not os.path.exists(BAM),
                                reason="mito resources unavailable")


def run(tool, argv):
    rc = TOOL_REGISTRY[tool](argv)
    assert not rc


def test_make_sites_only_vcf(tmp_path):
    out = tmp_path / "sites.vcf"
    run("MakeSitesOnlyVcf", ["-I", VCF_IN, "-O", str(out)])
    recs = list(vcf.VcfReader(str(out)))
    assert recs and all(not v.samples for v in recs)
    assert len(recs) == len(list(vcf.VcfReader(VCF_IN)))


def test_vcf_to_interval_list_and_to_bed(tmp_path):
    il = tmp_path / "x.interval_list"
    run("VcfToIntervalList", ["-I", VCF_IN, "-O", str(il)])
    body = [l for l in open(il) if not l.startswith("@")]
    recs = list(vcf.VcfReader(VCF_IN))
    assert len(body) == len(recs)
    f = body[0].split("\t")
    assert f[0] == recs[0].contig and int(f[1]) == recs[0].pos + 1
    bed = tmp_path / "x.bed"
    run("IntervalListToBed", ["-I", str(il), "-O", str(bed)])
    bf = open(bed).readline().split("\t")
    assert int(bf[1]) == recs[0].pos and bf[0] == recs[0].contig


def test_update_vcf_sequence_dictionary(tmp_path):
    out = tmp_path / "u.vcf"
    run("UpdateVcfSequenceDictionary",
        ["-I", VCF_IN, "-O", str(out), "-SD", BAM])
    hdr = [l for l in open(out) if l.startswith("##contig")]
    assert any("chrM" in h for h in hdr)


def test_vcf_format_converter_roundtrip(tmp_path):
    out = tmp_path / "c.vcf.gz"
    run("VcfFormatConverter", ["-I", VCF_IN, "-O", str(out)])
    assert len(list(vcf.VcfReader(str(out)))) == len(list(vcf.VcfReader(VCF_IN)))


def test_filter_vcf(tmp_path):
    src = tmp_path / "in.vcf"
    w = vcf.VcfWriter(str(src), ["S"])
    for pos, dp in ((10, 5), (20, 50)):
        w.write(vcf.Variant(contig="chrM", pos=pos, ref="A", alts=("G",),
                            qual=50.0, filters=(), info={},
                            fmt_keys=("GT", "DP"),
                            samples=[{"GT": "0/1", "DP": str(dp)}]))
    w.close()
    out = tmp_path / "f.vcf"
    run("FilterVcf", ["-I", str(src), "-O", str(out), "--MIN_DP", "10"])
    recs = {v.pos: v for v in vcf.VcfReader(str(out))}
    assert "AllGtsFiltered" in recs[10].filters
    assert recs[20].filters == ("PASS",)


def test_liftover_interval_list(tmp_path):
    il = tmp_path / "in.interval_list"
    il.write_text("@SQ\tSN:chrM\tLN:16569\nchrM\t101\t200\t+\tx\n")
    chain = tmp_path / "c.chain"
    # shift chrM by +1000 into chrM2
    chain.write_text("chain 1 chrM 16569 + 0 16569 chrM2 20000 + 1000 17569 1\n16569\n\n")
    out = tmp_path / "out.interval_list"
    run("LiftOverIntervalList",
        ["-I", str(il), "-O", str(out), "--CHAIN", str(chain)])
    body = [l for l in open(out) if not l.startswith("@")]
    f = body[0].split("\t")
    assert f[0] == "chrM2" and int(f[1]) == 1101 and int(f[2]) == 1200


def _mini_bam(tmp_path, reads, name="mini.bam", lengths=(16569,)):
    header = sam.SamHeader.parse(
        "".join(f"@SQ\tSN:c{i}\tLN:{l}\n" for i, l in enumerate(lengths))
        + "@RG\tID:rg1\tSM:s1\tLB:libA\n@RG\tID:rg2\tSM:s1\tLB:libB\n")
    path = tmp_path / name
    w = bam.BamWriter(str(path), header)
    for rd in reads:
        w.write(rd)
    w.close()
    return str(path)


def _read(name, pos, flag=0, ref_id=0, n=20, rg="rg1", mapq=60):
    from gatk_tpu.io.reads import Read

    return Read(name, flag, ref_id, pos, mapq, np.zeros(1, np.uint8),
                np.array([n], np.int32), np.full(n, ord("A"), np.uint8),
                np.full(n, 30, np.uint8), tags={"RG": rg})


def test_clean_sam(tmp_path):
    r1 = _read("a", 16560, n=20)  # hangs 11bp off the 16569 end
    r2 = _read("b", 5, flag=sam.UNMAPPED, mapq=37)
    p = _mini_bam(tmp_path, [r2, r1])
    out = tmp_path / "clean.bam"
    run("CleanSam", ["-I", p, "-O", str(out)])
    got = {rd.name: rd for rd in bam.BamReader(str(out))}
    assert got["b"].mapq == 0
    a = got["a"]
    assert a.end <= 16569
    assert a.cigar_ops[-1] == sam.OP_S and a.cigar_lens[-1] == 11


def test_reorder_sam(tmp_path):
    p = _mini_bam(tmp_path, [_read("a", 10, ref_id=0), _read("b", 5, ref_id=1)],
                  lengths=(1000, 2000))
    d = tmp_path / "new.dict"
    d.write_text("@SQ\tSN:c1\tLN:2000\n@SQ\tSN:c0\tLN:1000\n")
    out = tmp_path / "re.bam"
    run("ReorderSam", ["-I", p, "-O", str(out), "-SD", str(d)])
    got = list(bam.BamReader(str(out)))
    assert [r.name for r in got] == ["b", "a"]  # c1 now first


def test_filter_sam_reads(tmp_path):
    p = _mini_bam(tmp_path, [_read("a", 10), _read("b", 50)])
    lst = tmp_path / "names.txt"
    lst.write_text("a\n")
    out = tmp_path / "f.bam"
    run("FilterSamReads", ["-I", p, "-O", str(out), "--FILTER",
                           "includeReadList", "--READ_LIST_FILE", str(lst)])
    assert [r.name for r in bam.BamReader(str(out))] == ["a"]


def test_sam_format_converter(tmp_path):
    p = _mini_bam(tmp_path, [_read("a", 10)])
    out = tmp_path / "o.sam"
    run("SamFormatConverter", ["-I", p, "-O", str(out)])
    lines = open(out).read().splitlines()
    body = [l for l in lines if not l.startswith("@")]
    assert body[0].startswith("a\t0\tc0\t11\t60\t20M")


def test_split_sam_by_library(tmp_path):
    p = _mini_bam(tmp_path, [_read("a", 10, rg="rg1"), _read("b", 20, rg="rg2")])
    d = tmp_path / "split"
    run("SplitSamByLibrary", ["-I", p, "-O", str(d)])
    assert sorted(os.listdir(d)) == ["libA.bam", "libB.bam"]
    assert [r.name for r in bam.BamReader(str(d / "libA.bam"))] == ["a"]


def test_position_based_downsample(tmp_path):
    reads = [_read(f"M:1:1101:{i}:7", 10 + i + 20 * j) for i in range(20)
             for j in (0, 1)]  # mate pairs share the read name
    p = _mini_bam(tmp_path, reads)
    out = tmp_path / "d.bam"
    run("PositionBasedDownsampleSam", ["-I", p, "-O", str(out), "-F", "0.5"])
    got = [r.name for r in bam.BamReader(str(out))]
    assert 0 < len(got) < len(reads)
    # mates (same position key) stay together
    for name in got:
        assert got.count(name) == 2


def test_calculate_read_group_checksum(tmp_path, capsys):
    p = _mini_bam(tmp_path, [_read("a", 10)])
    out = tmp_path / "md5.txt"
    run("CalculateReadGroupChecksum", ["-I", p, "-O", str(out)])
    assert len(open(out).read().strip()) == 32


def test_collect_duplicate_metrics(tmp_path):
    r1 = _read("a", 10)
    r2 = _read("b", 10, flag=sam.DUPLICATE)
    p = _mini_bam(tmp_path, [r1, r2])
    out = tmp_path / "dup.txt"
    run("CollectDuplicateMetrics", ["-I", p, "-M", str(out)])
    body = open(out).read()
    assert "DuplicationMetrics" in body and "libA" in body


def test_accumulate_quality_yield(tmp_path):
    from gatk_tpu.tools.metrics_tools import write_metrics_file

    cols = ["TOTAL_READS", "PF_READS", "TOTAL_BASES"]
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    write_metrics_file(str(a), "x", "picard.analysis.QualityYieldMetrics", cols,
                       [[10, 9, 1000]])
    write_metrics_file(str(b), "x", "picard.analysis.QualityYieldMetrics", cols,
                       [[5, 5, 500]])
    out = tmp_path / "sum.txt"
    run("AccumulateQualityYieldMetrics",
        ["-I", str(a), "-I", str(b), "-O", str(out)])
    rows = [l for l in open(out).read().splitlines() if l and l[0].isdigit()]
    assert rows[0].split("\t") == ["15", "14", "1500"]


def test_mark_illumina_adapters(tmp_path):
    from gatk_tpu.io.reads import Read

    adapter = b"AGATCGGAAGAGC"
    bases = b"ACGTACGTACGTACGTACGT" + adapter
    rd = Read("a", sam.UNMAPPED, -1, -1, 0, np.zeros(0, np.uint8),
              np.zeros(0, np.int32), np.frombuffer(bases, np.uint8).copy(),
              np.full(len(bases), 30, np.uint8), tags={"RG": "rg1"})
    clean = _read("b", 10, n=30)
    p = _mini_bam(tmp_path, [rd, clean])
    out = tmp_path / "adapters.bam"
    m = tmp_path / "adapters.txt"
    run("MarkIlluminaAdapters", ["-I", p, "-O", str(out), "-M", str(m)])
    got = {r.name: r for r in bam.BamReader(str(out))}
    assert got["a"].tags.get("XT") == 21  # 1-based clip point
    assert "XT" not in got["b"].tags


def test_merge_bam_alignment(tmp_path):
    from gatk_tpu.io.reads import Read

    un = Read("a", sam.UNMAPPED, -1, -1, 0, np.zeros(0, np.uint8),
              np.zeros(0, np.int32), np.full(20, ord("A"), np.uint8),
              np.full(20, 30, np.uint8), tags={"RG": "rg1", "RX": "ACGT"})
    un_only = Read("c", sam.UNMAPPED, -1, -1, 0, np.zeros(0, np.uint8),
                   np.zeros(0, np.int32), np.full(20, ord("C"), np.uint8),
                   np.full(20, 30, np.uint8), tags={"RG": "rg1"})
    up = _mini_bam(tmp_path, [un, un_only], name="u.bam")
    aligned = _read("a", 100)
    aligned.tags.pop("RG", None)
    ap = _mini_bam(tmp_path, [aligned], name="al.bam")
    out = tmp_path / "m.bam"
    run("MergeBamAlignment",
        ["--ALIGNED_BAM", ap, "--UNMAPPED_BAM", up, "-O", str(out)])
    got = {r.name: r for r in bam.BamReader(str(out))}
    assert got["a"].tags.get("RX") == "ACGT" and got["a"].pos == 100
    assert got["c"].is_unmapped


def test_collect_rnaseq_metrics(tmp_path):
    flat = tmp_path / "refFlat.txt"
    # gene on c0: tx 0-1000, cds 100-900, exons 0-500 and 600-1000
    flat.write_text("G1\tNM_1\tc0\t+\t0\t1000\t100\t900\t2\t0,600,\t500,1000,\n")
    reads = [_read("a", 150, n=50), _read("b", 520, n=50), _read("c", 5000, n=50)]
    p = _mini_bam(tmp_path, reads, lengths=(16569,))
    out = tmp_path / "rna.txt"
    run("CollectRnaSeqMetrics", ["-I", p, "-O", str(out), "--REF_FLAT", str(flat)])
    lines = open(out).read().splitlines()
    hdr = [l for l in lines if l.startswith("PF_BASES")]
    i = lines.index(hdr[0])
    vals = dict(zip(hdr[0].split("\t"), lines[i + 1].split("\t")))
    assert int(vals["CODING_BASES"]) == 50       # read a fully in cds/exon
    assert int(vals["INTRONIC_BASES"]) == 50     # read b in the 500-600 intron
    assert int(vals["INTERGENIC_BASES"]) == 50   # read c outside the gene


def test_genotype_concordance(tmp_path):
    def write_vcf(path, rows):
        w = vcf.VcfWriter(str(path), ["S"])
        for contig, pos, ref, alt, gt in rows:
            w.write(vcf.Variant(contig=contig, pos=pos, ref=ref, alts=(alt,),
                                qual=50.0, filters=(), info={},
                                fmt_keys=("GT",), samples=[{"GT": gt}]))
        w.close()

    t = tmp_path / "t.vcf"
    c = tmp_path / "c.vcf"
    write_vcf(t, [("chrM", 10, "A", "G", "0/1"), ("chrM", 20, "A", "G", "1/1"),
                  ("chrM", 30, "A", "AT", "0/1")])
    write_vcf(c, [("chrM", 10, "A", "G", "0/1"), ("chrM", 20, "A", "G", "0/1"),
                  ("chrM", 40, "A", "G", "0/1")])
    out = tmp_path / "gc"
    run("GenotypeConcordance",
        ["--CALL_VCF", str(c), "--TRUTH_VCF", str(t), "-O", str(out)])
    body = open(str(out) + ".genotype_concordance_summary_metrics").read()
    lines = [l.split("\t") for l in body.splitlines() if l.startswith(("SNP", "INDEL"))]
    snp = next(l for l in lines if l[0] == "SNP")
    # TP=1 (site 10), mismatch=1 (site 20), FP=1 (site 40), FN=0
    assert snp[3] == "1" and snp[4] == "1" and snp[6] == "1"
    indel = next(l for l in lines if l[0] == "INDEL")
    assert indel[5] == "1"  # FN at site 30


def test_extract_and_check_fingerprint(tmp_path):
    hmap = tmp_path / "hmap.txt"
    # two canonical NA12878 mito SNPs: 263 A>G (hom), 152 T>C (hom)
    hmap.write_text("chrM\t263\tx\tA\tG\nchrM\t152\ty\tT\tC\n")
    fp = tmp_path / "fp.vcf"
    run("ExtractFingerprint",
        ["-I", BAM, "-O", str(fp), "-H", str(hmap)])
    recs = {v.pos: v for v in vcf.VcfReader(str(fp))}
    assert recs[262].samples[0]["GT"] == "1/1"
    assert recs[151].samples[0]["GT"] == "1/1"
    out = tmp_path / "chk"
    run("CheckFingerprint",
        ["-I", BAM, "-G", str(fp), "-H", str(hmap), "-O", str(out)])
    body = open(str(out) + ".fingerprinting_summary_metrics").read()
    assert "TRUE" in body  # the BAM matches its own fingerprint


def test_mark_duplicates_with_mate_cigar_routes(tmp_path):
    # same duplicates as MarkDuplicates on coordinate-sorted input
    r1 = _read("a", 10)
    r2 = _read("b", 10)
    p = _mini_bam(tmp_path, [r1, r2])
    out = tmp_path / "md.bam"
    m = tmp_path / "md.txt"
    run("MarkDuplicatesWithMateCigar", ["-I", p, "-O", str(out), "-M", str(m)])
    got = list(bam.BamReader(str(out)))
    assert sum(1 for r in got if r.is_duplicate) == 1


def test_umi_aware_mark_duplicates(tmp_path):
    from gatk_tpu.io.reads import Read

    def umi_read(name, umi):
        r = _read(name, 10)
        r.tags["RX"] = umi
        return r

    # same position, different UMIs -> NOT duplicates of each other
    p = _mini_bam(tmp_path, [umi_read("a", "AAAA"), umi_read("b", "TTTT"),
                             umi_read("c", "AAAT")])  # c within edit distance of a
    out = tmp_path / "umi.bam"
    m = tmp_path / "umi.txt"
    run("UmiAwareMarkDuplicatesWithMateCigar",
        ["-I", p, "-O", str(out), "-M", str(m)])
    got = {r.name: r for r in bam.BamReader(str(out))}
    assert not got["b"].is_duplicate  # distinct UMI cluster
    dups = sum(1 for r in got.values() if r.is_duplicate)
    assert dups == 1  # one of a/c marked within the merged cluster


# ---------------------------------------------------------------------------
# tranche 2
# ---------------------------------------------------------------------------

def test_view_sam(tmp_path, capsys):
    p = _mini_bam(tmp_path, [_read("a", 10), _read("b", 5, flag=sam.UNMAPPED)])
    run("ViewSam", ["-I", p, "--ALIGNMENT_STATUS", "Aligned"])
    out = capsys.readouterr().out
    assert "\na\t" in "\n" + out and "\nb\t" not in "\n" + out
    assert "@SQ\tSN:c0" in out


def test_compare_sams(tmp_path):
    p1 = _mini_bam(tmp_path, [_read("a", 10), _read("b", 50)], name="x.bam")
    p2 = _mini_bam(tmp_path, [_read("a", 10), _read("b", 50)], name="y.bam")
    assert TOOL_REGISTRY["CompareSAMs"]([p1, p2]) == 0
    p3 = _mini_bam(tmp_path, [_read("a", 10), _read("b", 60)], name="z.bam")
    assert TOOL_REGISTRY["CompareSAMs"]([p1, p3]) == 1


def test_check_terminator_block(tmp_path):
    p = _mini_bam(tmp_path, [_read("a", 10)])
    assert TOOL_REGISTRY["CheckTerminatorBlock"](["-I", p]) == 0
    trunc = tmp_path / "trunc.bam"
    trunc.write_bytes(open(p, "rb").read()[:-28])
    assert TOOL_REGISTRY["CheckTerminatorBlock"](["-I", str(trunc)]) == 100


def test_fix_vcf_header(tmp_path):
    src = tmp_path / "in.vcf"
    w = vcf.VcfWriter(str(src), ["S"])
    w.write(vcf.Variant(contig="chrM", pos=9, ref="A", alts=("G",), qual=10.0,
                        filters=("weird_filter",), info={"MYKEY": "1"},
                        fmt_keys=("GT", "XX"),
                        samples=[{"GT": "0/1", "XX": "z"}]))
    w.close()
    out = tmp_path / "fixed.vcf"
    run("FixVcfHeader", ["-I", str(src), "-O", str(out)])
    hdr = open(out).read()
    assert "##INFO=<ID=MYKEY" in hdr
    assert "##FORMAT=<ID=XX" in hdr
    assert "##FILTER=<ID=weird_filter" in hdr


def test_gather_gvcfs(tmp_path):
    parts = []
    for i, pos in enumerate(((5, 10), (10, 20))):
        pth = tmp_path / f"s{i}.vcf"
        w = vcf.VcfWriter(str(pth), ["S"])
        for p0 in pos:
            w.write(vcf.Variant(contig="chrM", pos=p0, ref="A", alts=("G",),
                                qual=10.0, filters=(), info={},
                                fmt_keys=("GT",), samples=[{"GT": "0/1"}]))
        w.close()
        parts.append(str(pth))
    out = tmp_path / "g.vcf"
    run("GatherGvcfs", ["-I", parts[0], "-I", parts[1], "-O", str(out)])
    poss = [v.pos for v in vcf.VcfReader(str(out))]
    assert poss == [5, 10, 20]  # overlap at 10 clipped once


def test_collect_variant_calling_metrics(tmp_path):
    db = tmp_path / "dbsnp.vcf"
    w = vcf.VcfWriter(str(db), [])
    w.write(vcf.Variant(contig="chrM", pos=10, ref="A", alts=("G",), qual=None,
                        filters=(), info={}, fmt_keys=(), samples=[]))
    w.close()
    call = tmp_path / "c.vcf"
    w = vcf.VcfWriter(str(call), [])
    for pos, ref, alt in ((10, "A", "G"), (20, "C", "A"), (30, "A", "AT")):
        w.write(vcf.Variant(contig="chrM", pos=pos, ref=ref, alts=(alt,),
                            qual=30.0, filters=(), info={}, fmt_keys=(),
                            samples=[]))
    w.close()
    out = tmp_path / "vc"
    run("CollectVariantCallingMetrics",
        ["-I", str(call), "--DBSNP", str(db), "-O", str(out)])
    body = open(str(out) + ".variant_calling_summary_metrics").read()
    row = [l for l in body.splitlines() if l and l[0].isdigit()][0].split("\t")
    assert row[0] == "2" and row[1] == "1" and row[6] == "1"


def test_extract_sequences_and_nonn(tmp_path):
    mito_fa = f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta"
    il = tmp_path / "x.interval_list"
    il.write_text("chrM\t1\t10\t+\tfirst10\n")
    out = tmp_path / "sub.fasta"
    run("ExtractSequences", ["--INTERVAL_LIST", str(il), "-R", mito_fa,
                             "-O", str(out)])
    lines = open(out).read().splitlines()
    assert lines[0] == ">first10" and len(lines[1]) == 10
    run("NonNFastaSize", ["-I", str(out), "-O", str(tmp_path / "n.txt")])
    assert int(open(tmp_path / "n.txt").read()) == 10


def test_add_comments_and_replace_header(tmp_path):
    p = _mini_bam(tmp_path, [_read("a", 10)])
    out = tmp_path / "co.bam"
    run("AddCommentsToBam", ["-I", p, "-O", str(out), "-C", "hello world"])
    assert "@CO\thello world" in bam.BamReader(str(out)).header.text
    out2 = tmp_path / "rh.bam"
    run("ReplaceSamHeader", ["-I", p, "--HEADER", str(out), "-O", str(out2)])
    assert "@CO\thello world" in bam.BamReader(str(out2)).header.text
    assert [r.name for r in bam.BamReader(str(out2))] == ["a"]


def test_add_oa_tag(tmp_path):
    p = _mini_bam(tmp_path, [_read("a", 10)])
    out = tmp_path / "oa.bam"
    run("AddOATag", ["-I", p, "-O", str(out)])
    rd = next(iter(bam.BamReader(str(out))))
    assert rd.tags["OA"].startswith("c0,11,+,20M,60")


def test_revert_oq_add_mate_cigar(tmp_path):
    r1 = _read("a", 10, flag=sam.PAIRED | sam.FIRST_OF_PAIR)
    r1.tags["OQ"] = "I" * 20  # Q40
    r2 = _read("a", 100, flag=sam.PAIRED | sam.SECOND_OF_PAIR, n=30)
    p = _mini_bam(tmp_path, [r1, r2])
    out = tmp_path / "rq.bam"
    run("RevertOriginalBaseQualitiesAndAddMateCigar",
        ["-I", p, "-O", str(out)])
    got = {(r.flag & 0xC0): r for r in bam.BamReader(str(out))}
    assert (got[0x40].quals == 40).all()
    assert got[0x40].tags["MC"] == "30M"
    assert got[0x80].tags["MC"] == "20M"


def test_collect_jumping_library_metrics(tmp_path):
    # inward (FR) pair: leftmost forward
    r = _read("a", 10, flag=sam.PAIRED | sam.FIRST_OF_PAIR | sam.MATE_REVERSE)
    r.mate_ref_id = 0
    r.mate_pos = 200
    p = _mini_bam(tmp_path, [r])
    out = tmp_path / "jump.txt"
    run("CollectJumpingLibraryMetrics", ["-I", p, "-O", str(out)])
    body = open(out).read()
    row = [l for l in body.splitlines() if l and l[0].isdigit()][0].split("\t")
    assert row[1] == "1"  # NONJUMP (inward)


def test_compare_metrics(tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("## header A\nX\t1\n")
    b.write_text("## header B\nX\t1\n")
    assert TOOL_REGISTRY["CompareMetrics"]([str(a), str(b)]) == 0
    b.write_text("## header B\nX\t2\n")
    assert TOOL_REGISTRY["CompareMetrics"]([str(a), str(b)]) == 1


def test_cluster_crosscheck_metrics(tmp_path):
    m = tmp_path / "cc.txt"
    m.write_text("LEFT_SAMPLE\tRIGHT_SAMPLE\tLOD_SCORE\n"
                 "s1\ts2\t12.0\n"
                 "s1\ts3\t-30.0\n"
                 "s2\ts3\t-28.0\n")
    out = tmp_path / "clusters.txt"
    run("ClusterCrosscheckMetrics", ["-I", str(m), "-O", str(out)])
    body = open(out).read()
    assert "s1,s2" in body and "s3" in body


def test_wgs_metrics_variants_and_markdup_routes(tmp_path):
    p = _mini_bam(tmp_path, [_read("a", 10), _read("b", 10)])
    out = tmp_path / "raw.txt"
    run("CollectRawWgsMetrics", ["-I", p, "-O", str(out)])
    assert "MEAN_COVERAGE" in open(out).read()
    md = tmp_path / "md.bam"
    run("SimpleMarkDuplicatesWithMateCigar",
        ["-I", p, "-O", str(md), "-M", str(tmp_path / "m.txt")])
    assert sum(1 for r in bam.BamReader(str(md)) if r.is_duplicate) == 1


def test_python_executor_examples(tmp_path):
    """The two Python-executor example walkers (subprocess + FIFO streaming
    protocol surfaces of utils/python/)."""
    run("ExamplePostTraversalPythonExecutor",
        ["-I", BAM, "-O", str(tmp_path / "j.txt"),
         "-P", str(tmp_path / "p.txt"), "-L", "chrM:1-150"])
    assert open(tmp_path / "p.txt").read() == open(tmp_path / "j.txt").read()
    assert "Read at chrM:" in open(tmp_path / "p.txt").read()
    run("ExampleStreamingPythonExecutor",
        ["-I", BAM, "-O", str(tmp_path / "s.txt"), "-L", "chrM:1-150",
         "--batchSize", "100"])
    n = sum(1 for l in open(tmp_path / "s.txt") if l.startswith("Read at"))
    assert n > 100  # multiple acknowledged batches
