"""Misc utility tool tests (tools/misc_tools.py)."""
import os

import numpy as np
import pytest

from gatk_tpu.cli import TOOL_REGISTRY, UserError
from gatk_tpu.io import bam as bamio, sam as samio, vcf as vcfio
from gatk_tpu.io.reads import Read

MITO = "/root/reference/src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito"
BAM = f"{MITO}/NA12878.bam"
FASTA = f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta"

pytestmark = pytest.mark.skipif(not os.path.exists(BAM), reason="mito data")


def test_print_reads_header(tmp_path):
    out = tmp_path / "h.txt"
    assert TOOL_REGISTRY["PrintReadsHeader"](["-I", BAM, "-O", str(out)]) == 0
    text = out.read_text()
    assert "@SQ" in text and "chrM" in text


def test_count_bases_in_reference(capsys):
    assert TOOL_REGISTRY["CountBasesInReference"](
        ["-R", FASTA, "-L", "chrM:1-1000"]) == 0
    outp = capsys.readouterr().out
    lines = dict(l.split("\t") for l in outp.strip().splitlines()
                 if "\t" in l and "INFO" not in l)
    assert int(lines["total"]) == 1000
    assert sum(int(lines.get(b, 0)) for b in "ACGTN") == 1000


def test_bgzf_block_information(capsys):
    assert TOOL_REGISTRY["PrintBGZFBlockInformation"](["--bgzf-file", BAM]) == 0
    outp = capsys.readouterr().out
    assert "BGZF EOF marker" in outp and "Block #1 at file offset 0" in outp


def test_compare_interval_lists(tmp_path, capsys):
    a = tmp_path / "a.bed"
    b = tmp_path / "b.bed"
    a.write_text("chrM\t0\t100\nchrM\t200\t300\n")
    b.write_text("chrM\t0\t100\nchrM\t200\t300\n")
    assert TOOL_REGISTRY["CompareIntervalLists"](
        ["-L", str(a), "-L2", str(b)]) == 0
    b.write_text("chrM\t0\t100\nchrM\t200\t350\n")
    with pytest.raises(UserError):
        TOOL_REGISTRY["CompareIntervalLists"](["-L", str(a), "-L2", str(b)])
    assert "50 bp only in" in capsys.readouterr().out


def _mini_bam(tmp_path, reads, name="m.bam"):
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chrM", 16569, 0)])
    path = tmp_path / name
    w = bamio.BamWriter(str(path), header)
    for r in reads:
        w.write(r)
    w.close()
    return str(path)


def _read(name="r1", pos=100, quals=None, n=10, cigar=None):
    ops, lens = cigar if cigar else (np.array([0], np.uint8),
                                     np.array([n], np.int32))
    return Read(name=name, flag=0, ref_id=0, pos=pos, mapq=60,
                cigar_ops=ops, cigar_lens=lens,
                bases=np.full(n, ord("A"), np.uint8),
                quals=quals if quals is not None else np.full(n, 30, np.uint8))


def test_fix_misencoded_and_compare_quals(tmp_path, capsys):
    src = _mini_bam(tmp_path, [_read(quals=np.full(10, 64, np.uint8))])
    out = tmp_path / "fixed.bam"
    assert TOOL_REGISTRY["FixMisencodedBaseQualityReads"](
        ["-I", src, "-O", str(out)]) == 0
    r = next(iter(bamio.BamReader(str(out))))
    assert r.quals.tolist() == [33] * 10
    # CompareBaseQualities flags the difference
    with pytest.raises(UserError):
        TOOL_REGISTRY["CompareBaseQualities"]([src, str(out), "--throw-on-diff"])
    assert TOOL_REGISTRY["CompareBaseQualities"]([src, src]) == 0


def test_add_original_alignment_tags(tmp_path):
    src = _mini_bam(tmp_path, [_read()])
    out = tmp_path / "oa.bam"
    assert TOOL_REGISTRY["AddOriginalAlignmentTags"](["-I", src, "-O", str(out)]) == 0
    r = next(iter(bamio.BamReader(str(out))))
    assert r.tags["OA"].startswith("chrM,101,+,10M,60")


def test_annotate_vcf_with_bam_depth(tmp_path):
    src = tmp_path / "v.vcf"
    src.write_text("##fileformat=VCFv4.2\n"
                   "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                   "chrM\t152\t.\tT\tC\t50\tPASS\t.\n")
    out = tmp_path / "o.vcf"
    assert TOOL_REGISTRY["AnnotateVcfWithBamDepth"](
        ["-V", str(src), "-I", BAM, "-O", str(out)]) == 0
    rec = next(iter(vcfio.VcfReader(str(out))))
    assert int(rec.info["BAM_DEPTH"]) > 100


def test_remove_nearby_indels(tmp_path):
    src = tmp_path / "v.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chrM\t100\t.\tAT\tA\t50\tPASS\t.\n"
        "chrM\t120\t.\tC\tCG\t50\tPASS\t.\n"     # within 50 of first -> both dropped
        "chrM\t500\t.\tG\tGA\t50\tPASS\t.\n"     # isolated -> kept
        "chrM\t600\t.\tT\tC\t50\tPASS\t.\n")     # SNP -> kept
    out = tmp_path / "o.vcf"
    assert TOOL_REGISTRY["RemoveNearbyIndels"](
        ["-V", str(src), "-O", str(out), "--min-indel-spacing", "50"]) == 0
    poss = [v.pos + 1 for v in vcfio.VcfReader(str(out))]
    assert poss == [500, 600]


def test_gtf_to_bed(tmp_path):
    gtf = tmp_path / "g.gtf"
    gtf.write_text(
        'chr1\thavana\tgene\t100\t200\t.\t+\t.\tgene_id "G1"; gene_name "ALPHA";\n'
        'chr1\thavana\texon\t100\t150\t.\t+\t.\tgene_id "G1";\n'
        'chr1\thavana\tgene\t500\t900\t.\t-\t.\tgene_id "G2"; gene_name "BETA";\n')
    out = tmp_path / "g.bed"
    assert TOOL_REGISTRY["GtfToBed"](["-G", str(gtf), "-O", str(out)]) == 0
    lines = out.read_text().strip().splitlines()
    assert lines == ["chr1\t99\t200\tALPHA", "chr1\t499\t900\tBETA"]


def test_left_align_indels(tmp_path):
    # reference ...GGG AAAA GGG...; read has deletion placed right-most:
    # 5M 1D 4M over ref AAAAA -> should left-align to 2M(?) compute:
    # ref:  G G A A A A A G G G  (pos 0..9)
    # read: G G A A A A G G G  with cigar 6M1D3M (del at offset 6, ref pos 6)
    # left aligned: deletion shifts to the start of the A run: 2M1D7M
    import gatk_tpu.tools.misc_tools as mt

    ref = b"GGAAAAAGGG"
    read = b"GGAAAAGGG"
    ops, lens = mt._left_align_cigar(
        np.array([0, 2, 0], np.uint8), np.array([6, 1, 3], np.int32), read, ref)
    assert (ops, lens) == ([0, 2, 0], [2, 1, 7])


def test_gather_pileup_summaries(tmp_path):
    from gatk_tpu.mutect.contamination import PileupSite, write_pileup_table, read_pileup_table

    a = tmp_path / "a.table"
    b = tmp_path / "b.table"
    write_pileup_table(str(a), "S1", [PileupSite("chr1", 100, 10, 2, 0, 0.05)])
    write_pileup_table(str(b), "S1", [PileupSite("chr1", 500, 8, 4, 1, 0.10)])
    out = tmp_path / "o.table"
    assert TOOL_REGISTRY["GatherPileupSummaries"](
        ["-I", str(a), "-I", str(b), "-O", str(out)]) == 0
    sample, sites = read_pileup_table(str(out))
    assert sample == "S1" and [s.position for s in sites] == [100, 500]
    write_pileup_table(str(b), "S2", [PileupSite("chr1", 500, 8, 4, 1, 0.10)])
    with pytest.raises(UserError):
        TOOL_REGISTRY["GatherPileupSummaries"](["-I", str(a), "-I", str(b), "-O", str(out)])


def test_calculate_mixing_fractions(tmp_path):
    # pooled BAM: site 100 private-het in S1 (25% alt), site 300 in S2 (25% alt)
    reads = []
    for i in range(20):
        alt = i % 4 == 0  # 25% alt fraction
        b = np.full(10, ord("A"), np.uint8)
        if alt:
            b[5] = ord("G")
        reads.append(Read(name=f"a{i}", flag=0, ref_id=0, pos=95, mapq=60,
                          cigar_ops=np.array([0], np.uint8),
                          cigar_lens=np.array([10], np.int32), bases=b,
                          quals=np.full(10, 30, np.uint8)))
    for i in range(20):
        alt = i % 4 == 0
        b = np.full(10, ord("C"), np.uint8)
        if alt:
            b[5] = ord("T")
        reads.append(Read(name=f"b{i}", flag=0, ref_id=0, pos=295, mapq=60,
                          cigar_ops=np.array([0], np.uint8),
                          cigar_lens=np.array([10], np.int32), bases=b,
                          quals=np.full(10, 30, np.uint8)))
    bam = _mini_bam(tmp_path, reads, "pool.bam")
    v = tmp_path / "v.vcf"
    v.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
        "chrM\t101\t.\tA\tG\t50\tPASS\t.\tGT\t0/1\t0/0\n"
        "chrM\t301\t.\tC\tT\t50\tPASS\t.\tGT\t0/0\t0/1\n")
    out = tmp_path / "mix.table"
    assert TOOL_REGISTRY["CalculateMixingFractions"](
        ["-V", str(v), "-I", bam, "-O", str(out)]) == 0
    lines = out.read_text().strip().splitlines()
    fr = {l.split("\t")[0]: float(l.split("\t")[1]) for l in lines[1:]}
    assert abs(fr["S1"] - 0.5) < 1e-6 and abs(fr["S2"] - 0.5) < 1e-6


def test_analyze_covariates(tmp_path):
    recal = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
             "tools/BQSR/")
    import glob

    candidates = sorted(glob.glob(recal + "*.recal.txt")) or sorted(
        glob.glob(recal + "expected.*.table*"))
    if not candidates:
        pytest.skip("no recal golden available")
    out = tmp_path / "c.csv"
    assert TOOL_REGISTRY["AnalyzeCovariates"](
        ["-before", candidates[0], "-csv", str(out)]) == 0
    text = out.read_text().splitlines()
    assert text[0].startswith("Recalibration,ReadGroup,QualityScore")
    assert len(text) > 1


def test_callable_loci(tmp_path):
    out = tmp_path / "c.bed"
    summ = tmp_path / "c.summary"
    assert TOOL_REGISTRY["CallableLoci"]([
        "-I", BAM, "-R", FASTA, "-L", "chrM:1-2000",
        "-O", str(out), "--summary", str(summ)]) == 0
    rows = [l.split("\t") for l in out.read_text().strip().splitlines()]
    states = {r[3] for r in rows}
    # mito: deep coverage through ~900, none after
    assert "CALLABLE" in states and "NO_COVERAGE" in states
    # runs tile the interval exactly
    assert rows[0][1] == "0" and rows[-1][2] == "2000"
    for a, b in zip(rows, rows[1:]):
        assert a[2] == b[1]
    text = summ.read_text()
    assert "CALLABLE" in text and "NO_COVERAGE" in text


def test_local_assembler(tmp_path):
    fa = tmp_path / "a.fa"
    gfa = tmp_path / "a.gfa"
    assert TOOL_REGISTRY["LocalAssembler"]([
        "-I", BAM, "-R", FASTA, "-L", "chrM:100-400",
        "--fasta-file", str(fa), "--gfa-file", str(gfa),
        "--assembly-name", "mito"]) == 0
    text = fa.read_text()
    names = [l[1:] for l in text.splitlines() if l.startswith(">")]
    assert len(names) >= 2  # ref contig + at least one variant haplotype
    assert names[0].startswith("mito_chrM_")
    gfa_text = gfa.read_text().splitlines()
    assert gfa_text[0].startswith("H\t")
    assert sum(1 for l in gfa_text if l.startswith("S\t")) == len(names)


def test_vcf_comparator(tmp_path):
    def write(name, qual, gt, dp="30"):
        p = tmp_path / name
        p.write_text(
            "##fileformat=VCFv4.2\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
            f"chrM\t100\t.\tA\tG\t{qual}\tPASS\tDP={dp}\tGT\t{gt}\n")
        return str(p)

    a = write("a.vcf", "50.0", "0/1")
    e = write("e.vcf", "50.0", "0/1")
    assert TOOL_REGISTRY["VCFComparator"](["-V", a, "-V", e]) == 0
    e2 = write("e2.vcf", "55.0", "0/1")
    with pytest.raises(UserError):
        TOOL_REGISTRY["VCFComparator"](["-V", a, "-V", e2])
    assert TOOL_REGISTRY["VCFComparator"](["-V", a, "-V", e2, "--ignore-quals"]) == 0
    # phasing-insensitive genotype match
    e3 = write("e3.vcf", "50.0", "1|0")
    with pytest.raises(UserError):
        TOOL_REGISTRY["VCFComparator"](["-V", a, "-V", e3])
    assert TOOL_REGISTRY["VCFComparator"](
        ["-V", a, "-V", e3, "--ignore-genotype-phasing"]) == 0
    # DP tolerance
    e4 = write("e4.vcf", "50.0", "0/1", dp="32")
    with pytest.raises(UserError):
        TOOL_REGISTRY["VCFComparator"](["-V", a, "-V", e4])
    assert TOOL_REGISTRY["VCFComparator"](
        ["-V", a, "-V", e4, "--dp-change-allowed", "5"]) == 0


def test_compare_references(tmp_path, capsys):
    a = tmp_path / "a.fa"
    b = tmp_path / "b.fa"
    a.write_text(">chr1\nACGTACGT\n>chr2\nGGGG\n")
    b.write_text(">chr1\nACGTACGT\n>chr2\nGGCG\n")
    out = tmp_path / "t.tsv"
    assert TOOL_REGISTRY["CompareReferences"](
        ["-R", str(a), "-refcomp", str(b), "-O", str(out),
         "--base-comparison", "FIND_SNPS_ONLY"]) == 0
    txt = capsys.readouterr().out
    assert "SNP chr2:3 G->C" in txt and "1 differing sequences" in txt
    rows = out.read_text().strip().splitlines()
    assert rows[0].startswith("MD5\tLength")
    assert len(rows) == 3


def test_flow_pairhmm_align_reads_to_haplotypes(tmp_path):
    haps = tmp_path / "h.fa"
    seq = "ACGTTTGCAAGGCATCG"
    alt = "ACGTTTGCATGGCATCG"
    haps.write_text(f">hap1\n{seq}\n>hap2\n{alt}\n")
    reads = [Read(name="r1", flag=0, ref_id=0, pos=0, mapq=60,
                  cigar_ops=np.array([0], np.uint8),
                  cigar_lens=np.array([len(seq)], np.int32),
                  bases=np.frombuffer(seq.encode(), np.uint8).copy(),
                  quals=np.full(len(seq), 30, np.uint8))]
    bam = _mini_bam(tmp_path, reads, "flow.bam")
    out = tmp_path / "m.tsv"
    assert TOOL_REGISTRY["FlowPairHMMAlignReadsToHaplotypes"](
        ["-I", bam, "-H", str(haps), "-O", str(out)]) == 0
    rows = out.read_text().strip().splitlines()
    assert rows[0] == "read\thap1\thap2"
    vals = rows[1].split("\t")
    # read matches hap1 exactly -> higher likelihood than hap2
    assert float(vals[1]) > float(vals[2])


def test_revert_base_quality_scores(tmp_path):
    r = _read(quals=np.full(10, 20, np.uint8))
    r.tags["OQ"] = "".join(chr(33 + 35) for _ in range(10))
    src = _mini_bam(tmp_path, [r], "oq.bam")
    out = tmp_path / "rev.bam"
    assert TOOL_REGISTRY["RevertBaseQualityScores"](["-I", src, "-O", str(out)]) == 0
    rr = next(iter(bamio.BamReader(str(out))))
    assert rr.quals.tolist() == [35] * 10 and "OQ" not in rr.tags


def test_transfer_read_tags(tmp_path):
    aligned = _mini_bam(tmp_path, [_read(name="q1")], "al.bam")
    un = _read(name="q1")
    un.tags["RX"] = "AACCGG"
    unmapped = _mini_bam(tmp_path, [un], "un.bam")
    out = tmp_path / "tagged.bam"
    assert TOOL_REGISTRY["TransferReadTags"](
        ["-I", aligned, "--unmapped-sam", unmapped, "-O", str(out)]) == 0
    rr = next(iter(bamio.BamReader(str(out))))
    assert rr.tags["RX"] == "AACCGG"


def test_read_anonymizer(tmp_path):
    out = tmp_path / "anon.bam"
    assert TOOL_REGISTRY["ReadAnonymizer"](
        ["-I", BAM, "-R", FASTA, "-O", str(out)]) == 0
    from gatk_tpu.io import fasta as fio

    ref = fio.FastaReference(FASTA)
    for i, r in enumerate(bamio.BamReader(str(out))):
        if r.is_unmapped:
            continue
        # M-aligned bases now equal the reference
        seg = ref.fetch_bytes("chrM", r.pos, r.end)
        import gatk_tpu.io.sam as sam

        if (r.cigar_ops == sam.OP_M).all() and len(r.bases) == len(seg):
            assert bytes(r.bases) == bytes(seg)
        if i > 50:
            break


def test_print_distant_mates(tmp_path):
    near = _read(name="n")
    near.flag = 0x1 | 0x2
    near.mate_ref_id = 0
    near.mate_pos = 200
    far = _read(name="f", pos=100)
    far.flag = 0x1
    far.mate_ref_id = 0
    far.mate_pos = 3_000_000
    src = _mini_bam(tmp_path, [near, far], "dm.bam")
    out = tmp_path / "dm_out.bam"
    assert TOOL_REGISTRY["PrintDistantMates"](["-I", src, "-O", str(out)]) == 0
    got = [r.name for r in bamio.BamReader(str(out))]
    assert got == ["f"]


def test_site_depth_to_baf(tmp_path):
    sd = tmp_path / "sd.tsv"
    # het site: 15/15 -> fits; hom site: 28/2 -> fails chi-square
    sd.write_text("chr1\t100\tS1\t15\t0\t15\t0\n"
                  "chr1\t200\tS1\t28\t0\t2\t0\n"
                  "chr1\t300\tS1\t3\t0\t4\t0\n")  # depth < 10 -> dropped
    sites = tmp_path / "sites.vcf"
    sites.write_text("##fileformat=VCFv4.2\n"
                     "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                     "chr1\t100\t.\tA\tG\t.\tPASS\t.\n"
                     "chr1\t200\t.\tA\tG\t.\tPASS\t.\n"
                     "chr1\t300\t.\tA\tG\t.\tPASS\t.\n")
    out = tmp_path / "baf.tsv"
    assert TOOL_REGISTRY["SiteDepthtoBAF"](
        ["-F", str(sd), "--baf-sites-vcf", str(sites), "-O", str(out)]) == 0
    rows = out.read_text().strip().splitlines()
    assert len(rows) == 1
    contig, pos, sample, baf = rows[0].split("\t")
    assert (contig, pos, sample) == ("chr1", "99", "S1") and float(baf) == 0.5


def test_condense_depth_evidence(tmp_path):
    rd = tmp_path / "rd.txt"
    rd.write_text("#Chr\tStart\tEnd\tS1\tS2\n"
                  "chr1\t0\t100\t5\t7\n"
                  "chr1\t100\t200\t3\t1\n"
                  "chr1\t200\t300\t2\t2\n"      # would exceed 200 max -> new acc
                  "chr1\t500\t600\t9\t9\n")     # gap -> separate
    out = tmp_path / "m.txt"
    assert TOOL_REGISTRY["CondenseDepthEvidence"](
        ["-F", str(rd), "-O", str(out), "--max-interval-size", "200"]) == 0
    rows = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert rows[0] == "chr1\t0\t200\t8\t8"
    assert rows[1] == "chr1\t200\t300\t2\t2"
    assert rows[2] == "chr1\t500\t600\t9\t9"


def test_generate_tool_docs(tmp_path):
    out = tmp_path / "docs"
    assert TOOL_REGISTRY["GenerateToolDocs"](["-O", str(out)]) == 0
    index = (out / "index.md").read_text()
    assert "[HaplotypeCaller](HaplotypeCaller.md)" in index
    hc = (out / "HaplotypeCaller.md").read_text()
    assert "usage:" in hc and "--output" in hc


def _sv_vcf(tmp_path, name, rows):
    p = tmp_path / name
    with open(p, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
        for pos, end, svtype in rows:
            fh.write(f"chr1\t{pos}\t.\tN\t<{svtype}>\t.\tPASS\t"
                     f"END={end};SVTYPE={svtype};ALGORITHMS=pesr\tGT\t0/1\n")
    return str(p)


def test_sv_stratify(tmp_path):
    vcf_path = _sv_vcf(tmp_path, "sv.vcf", [
        (1000, 1200, "DEL"),      # small DEL
        (5000, 95000, "DEL"),     # large DEL
        (2000, 2300, "DUP")])     # DUP -> default
    cfg = tmp_path / "strata.tsv"
    cfg.write_text("NAME\tSVTYPE\tMIN_SIZE\tMAX_SIZE\tTRACKS\n"
                   "DEL_small\tDEL\t0\t1000\t\n"
                   "DEL_large\tDEL\t1000\t-1\t\n")
    out = tmp_path / "strat.vcf"
    assert TOOL_REGISTRY["SVStratify"](
        ["-V", vcf_path, "-O", str(out), "--stratify-config", str(cfg)]) == 0
    recs = list(vcfio.VcfReader(str(out)))
    assert [r.info["STRAT"] for r in recs] == ["DEL_small", "DEL_large", "default"]


def test_sv_stratify_with_track(tmp_path):
    vcf_path = _sv_vcf(tmp_path, "sv.vcf", [(1000, 1500, "DEL"),
                                            (9000, 9500, "DEL")])
    track = tmp_path / "sd.bed"
    track.write_text("chr1\t900\t1600\n")  # covers only the first record
    cfg = tmp_path / "strata.tsv"
    cfg.write_text("NAME\tSVTYPE\tMIN_SIZE\tMAX_SIZE\tTRACKS\n"
                   "DEL_SD\tDEL\t-1\t-1\tSD\n")
    out = tmp_path / "strat.vcf"
    assert TOOL_REGISTRY["SVStratify"](
        ["-V", vcf_path, "-O", str(out), "--stratify-config", str(cfg),
         "--track-name", "SD", "--track-intervals", str(track),
         "--stratify-overlap-fraction", "0.5"]) == 0
    recs = list(vcfio.VcfReader(str(out)))
    assert recs[0].info["STRAT"] == "DEL_SD"
    assert recs[1].info["STRAT"] == "default"


def test_grouped_sv_cluster(tmp_path):
    # two small DELs that overlap (cluster together) + one large DEL
    a = _sv_vcf(tmp_path, "a.vcf", [(1000, 1400, "DEL"), (5000, 90000, "DEL")])
    b = _sv_vcf(tmp_path, "b.vcf", [(1050, 1420, "DEL")])
    cfg = tmp_path / "strata.tsv"
    cfg.write_text("NAME\tSVTYPE\tMIN_SIZE\tMAX_SIZE\tTRACKS\n"
                   "DEL_small\tDEL\t0\t5000\t\n"
                   "DEL_large\tDEL\t5000\t-1\t\n")
    out = tmp_path / "cl.vcf"
    assert TOOL_REGISTRY["GroupedSVCluster"](
        ["-V", a, "-V", b, "-O", str(out), "--stratify-config", str(cfg)]) == 0
    recs = list(vcfio.VcfReader(str(out)))
    # 3 input records -> 2 clusters (the overlapping small DELs merge)
    assert len(recs) == 2


def test_split_cram(tmp_path):
    reads = [_read(name=f"r{i}", pos=100 + i) for i in range(10)]
    src = _mini_bam(tmp_path, reads, "all.bam")
    tmpl = str(tmp_path / "shard_%02d.bam")
    assert TOOL_REGISTRY["SplitCRAM"](
        ["-I", src, "-O", tmpl, "--shard-records", "4"]) == 0
    counts = []
    for i in range(3):
        counts.append(sum(1 for _ in bamio.BamReader(tmpl % i)))
    assert counts == [4, 4, 2]


def test_methylation_type_caller(tmp_path):
    # ref: ..C at idx5 (CG context), G at idx6..
    fa = tmp_path / "m.fa"
    fa.write_text(">chrM\n" + "AAAAACGAAAA" + "A" * 100 + "\n")
    # forward read with converted T at idx5; reverse read with unconverted G at idx6
    fwd = _read(name="f", pos=0, n=11)
    fwd.bases = np.frombuffer(b"AAAAATGAAAA", np.uint8).copy()
    rev = _read(name="r", pos=0, n=11)
    rev.flag = 0x10
    rev.bases = np.frombuffer(b"AAAAACGAAAA", np.uint8).copy()
    bam = _mini_bam(tmp_path, [fwd, rev], "meth.bam")
    out = tmp_path / "meth.vcf"
    assert TOOL_REGISTRY["MethylationTypeCaller"](
        ["-I", bam, "-R", str(fa), "-O", str(out), "-L", "chrM:1-11"]) == 0
    recs = {v.pos: v for v in vcfio.VcfReader(str(out))}
    c_site = recs[5]
    assert c_site.ref == "C" and c_site.alts == ("T",)
    assert c_site.info["CONVERTED_BASE_COV"] == "1"
    assert c_site.info["UNCONVERTED_BASE_COV"] == "0"
    assert c_site.info["REFERENCE_CONTEXT"] == "CG"
    g_site = recs[6]
    assert g_site.ref == "G" and g_site.alts == ("A",)
    assert g_site.info["UNCONVERTED_BASE_COV"] == "1"
    assert g_site.info["CONVERTED_BASE_COV"] == "0"
    assert g_site.info["REFERENCE_CONTEXT"] == "CG"  # revcomp of CG


def test_evaluate_info_field_concordance(tmp_path):
    def write(name, qd):
        p = tmp_path / name
        p.write_text("##fileformat=VCFv4.2\n"
                     "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                     f"chr1\t100\t.\tA\tG\t50\tPASS\tQD={qd}\n")
        return str(p)

    e = write("e.vcf", "12.5")
    t = write("t.vcf", "12.0")
    out = tmp_path / "c.tsv"
    assert TOOL_REGISTRY["EvaluateInfoFieldConcordance"](
        ["--eval", e, "--truth", t, "--eval-info-key", "QD",
         "--truth-info-key", "QD", "-O", str(out)]) == 0
    rows = out.read_text().strip().splitlines()
    snp = rows[1].split("\t")
    assert snp[0] == "SNP" and snp[1] == "1" and abs(float(snp[2]) - 0.5) < 1e-9


def test_count_false_positives(tmp_path):
    v = tmp_path / "v.vcf"
    v.write_text("##fileformat=VCFv4.2\n"
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                 "chr1\t100\t.\tA\tG\t50\tPASS\t.\n"       # FP SNP
                 "chr1\t200\t.\tAT\tA\t50\tPASS\t.\n"      # FP indel
                 "chr1\t300\t.\tC\tT\t50\tartifact\t.\n"   # filtered -> skip
                 "chr1\t9999\t.\tC\tT\t50\tPASS\t.\n")     # outside territory
    bed = tmp_path / "c.bed"
    bed.write_text("chr1\t0\t1000\n")
    out = tmp_path / "fp.tsv"
    assert TOOL_REGISTRY["CountFalsePositives"](
        ["-V", str(v), "-L", str(bed), "-O", str(out)]) == 0
    rows = [l.split("\t") for l in out.read_text().strip().splitlines()[1:]]
    assert rows[0][:2] == ["SNP", "1"] and rows[1][:2] == ["INDEL", "1"]


def test_check_reference_compatibility(tmp_path, capsys):
    rc = TOOL_REGISTRY["CheckReferenceCompatibility"](
        ["-refcomp", FASTA, "-I", BAM])
    assert rc == 0
    assert "COMPATIBLE" in capsys.readouterr().out
    other = tmp_path / "o.fa"
    other.write_text(">chrZ\nACGT\n")
    rc = TOOL_REGISTRY["CheckReferenceCompatibility"](
        ["-refcomp", str(other), "-I", BAM])
    assert rc == 1


def test_print_read_counts(tmp_path):
    rd = tmp_path / "m.rd.txt"
    rd.write_text("#Chr\tStart\tEnd\tS1\tS2\n"
                  "chr1\t0\t100\t5\t7\n"
                  "chr1\t100\t200\t3\t1\n")
    prefix = str(tmp_path / "pc_")
    assert TOOL_REGISTRY["PrintReadCounts"](
        ["-F", str(rd), "--output-prefix", prefix]) == 0
    s1 = (tmp_path / "pc_S1.counts.tsv").read_text().splitlines()
    assert s1[1] == "chr1\t1\t100\t5" and s1[2] == "chr1\t101\t200\t3"
    s2 = (tmp_path / "pc_S2.counts.tsv").read_text().splitlines()
    assert s2[1].endswith("\t7")


def test_downsample_by_duplicate_set(tmp_path):
    reads = []
    for mi in range(20):
        for dup in range(3):
            r = _read(name=f"m{mi}_{dup}", pos=100 + mi)
            r.tags["MI"] = f"Z{mi}"
            reads.append(r)
    src = _mini_bam(tmp_path, reads, "umi.bam")
    out = tmp_path / "ds.bam"
    assert TOOL_REGISTRY["DownsampleByDuplicateSet"](
        ["-I", src, "-O", str(out), "--fraction-to-keep", "0.5"]) == 0
    got = list(bamio.BamReader(str(out)))
    # whole molecules kept: read count divisible by 3
    assert len(got) % 3 == 0 and 0 < len(got) < 60
    kept_mis = {r.tags["MI"] for r in got}
    assert all(sum(1 for r in got if r.tags["MI"] == mi) == 3 for mi in kept_mis)


def test_tag_germline_events(tmp_path):
    tumor = tmp_path / "t.seg"
    tumor.write_text("CONTIG\tSTART\tEND\tCALL\n"
                     "chr1\t1000\t5000\t+\n"
                     "chr1\t10000\t20000\t-\n"
                     "chr1\t30000\t40000\t0\n")
    normal = tmp_path / "n.seg"
    normal.write_text("CONTIG\tSTART\tEND\tCALL\n"
                      "chr1\t1200\t5100\t+\n"       # within 1000 of tumor seg 1
                      "chr1\t50000\t60000\t-\n")
    out = tmp_path / "o.seg"
    assert TOOL_REGISTRY["TagGermlineEvents"](
        ["-S", str(tumor), "--called-matched-normal-seg-file", str(normal),
         "-O", str(out)]) == 0
    rows = [l.split("\t") for l in out.read_text().strip().splitlines()[1:]]
    assert [r[-1] for r in rows] == ["1", "0", "0"]


def test_annotate_vcf_with_expected_allele_fraction(tmp_path):
    v = tmp_path / "v.vcf"
    v.write_text("##fileformat=VCFv4.2\n"
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
                 "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT\t0/1\t1/1\n")
    mix = tmp_path / "mix.table"
    mix.write_text("SAMPLE\tMIXING_FRACTION\nS1\t0.4\nS2\t0.6\n")
    out = tmp_path / "o.vcf"
    assert TOOL_REGISTRY["AnnotateVcfWithExpectedAlleleFraction"](
        ["-V", str(v), "-O", str(out), "--mixing-fractions", str(mix)]) == 0
    rec = next(iter(vcfio.VcfReader(str(out))))
    # 0.4*0.5 + 0.6*1.0 = 0.8
    assert abs(float(rec.info["AF_EXP"]) - 0.8) < 1e-9


def test_merge_annotated_regions(tmp_path):
    seg = tmp_path / "s.seg"
    seg.write_text("CONTIG\tSTART\tEND\tCALL\n"
                   "chr1\t1\t100\t+\n"
                   "chr1\t101\t200\t+\n"      # touching, same ann -> merge
                   "chr1\t201\t300\t-\n"      # different ann -> separate
                   "chr2\t1\t50\t+\n")
    out = tmp_path / "m.seg"
    assert TOOL_REGISTRY["MergeAnnotatedRegions"](
        ["-S", str(seg), "-O", str(out)]) == 0
    rows = [l.split("\t") for l in out.read_text().strip().splitlines()[1:]]
    assert rows[0] == ["chr1", "1", "200", "+"]
    assert rows[1] == ["chr1", "201", "300", "-"]
    assert rows[2][0] == "chr2"


def test_combine_segment_breakpoints(tmp_path):
    a = tmp_path / "a.seg"
    a.write_text("CONTIG\tSTART\tEND\tMEAN_LOG2_COPY_RATIO\n"
                 "chr1\t100\t500\t0.5\n")
    b = tmp_path / "b.seg"
    b.write_text("CONTIG\tSTART\tEND\tCALL\n"
                 "chr1\t300\t800\t+\n")
    out = tmp_path / "c.seg"
    assert TOOL_REGISTRY["CombineSegmentBreakpoints"](
        ["-S", str(a), "-S", str(b),
         "--columns-of-interest", "MEAN_LOG2_COPY_RATIO",
         "--columns-of-interest", "CALL", "-O", str(out)]) == 0
    rows = [l.split("\t") for l in out.read_text().strip().splitlines()]
    assert rows[0] == ["CONTIG", "START", "END", "MEAN_LOG2_COPY_RATIO", "CALL"]
    # 100-299 (a only), 300-500 (both), 501-800 (b only)
    assert rows[1] == ["chr1", "100", "299", "0.5", ""]
    assert rows[2] == ["chr1", "300", "500", "0.5", "+"]
    assert rows[3] == ["chr1", "501", "800", "", "+"]


def test_funcotate_segments(tmp_path):
    gtf = tmp_path / "g.gtf"
    gtf.write_text(
        'chr1\tHAVANA\ttranscript\t150\t400\t.\t+\t.\tgene_name "TP53"; transcript_id "T1"; tag "basic";\n'
        'chr1\tHAVANA\texon\t150\t400\t.\t+\t.\tgene_name "TP53"; transcript_id "T1";\n'
        'chr1\tHAVANA\ttranscript\t600\t900\t.\t-\t.\tgene_name "EGFR"; transcript_id "T2"; tag "basic";\n'
        'chr1\tHAVANA\texon\t600\t900\t.\t-\t.\tgene_name "EGFR"; transcript_id "T2";\n')
    seg = tmp_path / "s.seg"
    seg.write_text("CONTIG\tSTART\tEND\tCALL\n"
                   "chr1\t100\t700\t+\n"
                   "chr1\t1000\t2000\t0\n")
    out = tmp_path / "f.seg"
    assert TOOL_REGISTRY["FuncotateSegments"](
        ["-S", str(seg), "--gtf", str(gtf), "-O", str(out)]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines() if l]
    hdr = rows[0]
    gi = hdr.index("genes")
    assert rows[1][gi] == "TP53,EGFR"
    assert rows[2][gi] == ""


def test_check_pileup(tmp_path):
    reads = [_read(name=f"p{i}", pos=100) for i in range(5)]
    src = _mini_bam(tmp_path, reads, "cp.bam")
    pl = tmp_path / "mp.txt"
    # samtools mpileup: 1-based positions; depth 5 at 101..110
    pl.write_text("".join(f"chrM\t{101 + i}\tA\t5\t.....\tIIIII\n" for i in range(10)))
    assert TOOL_REGISTRY["CheckPileup"](
        ["-I", src, "-R", FASTA, "--pileup", str(pl)]) == 0
    pl.write_text("chrM\t101\tA\t7\t.......\tIIIIIII\n")
    with pytest.raises(UserError):
        TOOL_REGISTRY["CheckPileup"](["-I", src, "-R", FASTA, "--pileup", str(pl)])


def test_post_process_reads_for_rsem(tmp_path):
    r1 = _read(name="q", pos=100)
    r1.flag = 0x1 | 0x2 | 0x40
    r2 = _read(name="q", pos=300)
    r2.flag = 0x1 | 0x2 | 0x80
    lone = _read(name="solo", pos=200)
    lone.flag = 0x1 | 0x2 | 0x40  # mate missing from file
    improper = _read(name="imp", pos=400)
    improper.flag = 0x1  # not properly paired
    src = _mini_bam(tmp_path, [r2, improper, r1, lone], "rsem.bam")
    out = tmp_path / "rsem_out.bam"
    assert TOOL_REGISTRY["PostProcessReadsForRSEM"](["-I", src, "-O", str(out)]) == 0
    got = [(r.name, bool(r.flag & 0x40)) for r in bamio.BamReader(str(out))]
    assert got == [("q", True), ("q", False)]


def test_calculate_average_combined_annotations(tmp_path):
    v = tmp_path / "v.vcf"
    v.write_text("##fileformat=VCFv4.2\n"
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3\n"
                 "chr1\t100\t.\tA\tG\t50\tPASS\tRAW_GT_COUNT=6.0\tGT\t0/1\t1/1\t0/0\n")
    out = tmp_path / "o.vcf"
    assert TOOL_REGISTRY["CalculateAverageCombinedAnnotations"](
        ["-V", str(v), "-O", str(out), "-A", "RAW_GT_COUNT"]) == 0
    rec = next(iter(vcfio.VcfReader(str(out))))
    # two non-ref samples -> 6.0 / 2 = 3
    assert float(rec.info["RAW_GT_COUNT_AVERAGE"]) == 3.0


def test_reference_block_concordance(tmp_path):
    def gvcf(name, blocks):
        p = tmp_path / name
        with open(p, "w") as fh:
            fh.write("##fileformat=VCFv4.2\n"
                     "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
            for pos, end, gq in blocks:
                fh.write(f"chrM\t{pos}\t.\tA\t<NON_REF>\t.\t.\tEND={end}\t"
                         f"GT:GQ\t0/0:{gq}\n")
        return str(p)

    truth = gvcf("t.g.vcf", [(1, 100, 99), (101, 200, 50)])
    ev = gvcf("e.g.vcf", [(1, 150, 99), (151, 200, 40)])
    th = tmp_path / "th.tsv"
    eh = tmp_path / "eh.tsv"
    ch = tmp_path / "cc.tsv"
    assert TOOL_REGISTRY["ReferenceBlockConcordance"](
        ["--eval", ev, "--truth", truth,
         "--truth-block-histogram", str(th),
         "--eval-block-histogram", str(eh),
         "--confidence-concordance-histogram", str(ch)]) == 0
    assert "99,100\t1" in th.read_text()
    cc = dict(l.split("\t") for l in ch.read_text().splitlines()[1:])
    assert cc["99,99"] == "100"   # truth block1 x eval block1 overlap
    assert cc["50,99"] == "50"    # truth block2 x eval block1
    assert cc["50,40"] == "50"


def test_convert_counts_to_depth_file(tmp_path):
    c = tmp_path / "c.counts.tsv"
    c.write_text("CONTIG\tSTART\tEND\tCOUNT\nchr1\t1\t100\t5\nchr1\t101\t200\t3\n")
    out = tmp_path / "o.rd.txt"
    assert TOOL_REGISTRY["ConvertCountsToDepthFile"](
        ["-F", str(c), "-O", str(out), "--sample-name", "S9"]) == 0
    rows = out.read_text().splitlines()
    assert rows[0] == "#Chr\tStart\tEnd\tS9"
    assert rows[1] == "chr1\t0\t100\t5"
    # round-trips through PrintReadCounts
    prefix = str(tmp_path / "rt_")
    assert TOOL_REGISTRY["PrintReadCounts"](
        ["-F", str(out), "--output-prefix", prefix]) == 0
    back = (tmp_path / "rt_S9.counts.tsv").read_text().splitlines()
    assert back[1] == "chr1\t1\t100\t5"
