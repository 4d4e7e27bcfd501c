"""Round-4 tool batch: validation, funcotation filtering, diagnostics,
taxonomy building, index images."""
import gzip
import os
import tarfile

import numpy as np
import pytest

from gatk_tpu.cli import TOOL_REGISTRY
from gatk_tpu.tools.validation_tools import (beta_binomial_cdf,
                                             binomial_inverse_cdf,
                                             calculate_min_count_for_signal,
                                             calculate_power)


def test_power_calculation_utils():
    """PowerCalculationUtils.java math."""
    # binomial inverse CDF: P(X<=k) >= 0.99 for n=100, p=0.01 -> small k
    k = binomial_inverse_cdf(100, 0.01, 0.99)
    assert 2 <= k <= 5
    assert calculate_min_count_for_signal(0, 0.0) == 2  # floor of 2
    # beta-binomial sanity: CDF monotone, total mass 1
    assert beta_binomial_cdf(10, 2, 3, 10) == pytest.approx(1.0, abs=1e-9)
    assert beta_binomial_cdf(3, 2, 3, 10) < beta_binomial_cdf(6, 2, 3, 10)
    # strong discovery signal + deep validation -> high power
    p = calculate_power(100, 30, 60, 5)
    assert p > 0.95


def test_merge_mutect2_calls_with_mc3(tmp_path):
    truth = tmp_path / "mc3.vcf"
    truth.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tG\t.\tPASS\tCENTERS=MUSE;NREF=20;NALT=10\n"
        "chr1\t200\t.\tC\tT\t.\tPASS\tNREF=30;NALT=5\n")
    ev = tmp_path / "m2.vcf"
    ev.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tTUMOR\n"
        "chr1\t100\t.\tA\tG\t50\tPASS\t.\tGT:AD\t0/1:18,12\n"
        "chr1\t300\t.\tG\tC\t60\tPASS\t.\tGT:AD\t0/1:25,8\n")
    out = str(tmp_path / "merged.vcf")
    rc = TOOL_REGISTRY["MergeMutect2CallsWithMC3"](
        ["-eval", str(ev), "--truth", str(truth), "-O", out])
    assert rc == 0
    recs = {int(l.split("\t")[1]): l.split("\t") for l in open(out)
            if not l.startswith("#")}
    assert set(recs) == {100, 200, 300}
    assert "M2" in recs[100][7]          # TP: M2 added to CENTERS
    assert "MUSE" in recs[100][7]
    assert "CENTERS=M2" in recs[300][7]  # M2-only call
    assert "AD" in recs[100][8]


def test_filter_funcotations(tmp_path):
    fields = "|".join(["hugoSymbol", "ncbiBuild", "chromosome", "start", "end",
                       "variantClassification", "secondaryVariantClassification",
                       "variantType", "refAllele", "altAllele",
                       "annotationTranscript", "transcriptStrand", "transcriptExon",
                       "cDnaChange", "codonChange", "proteinChange",
                       "ACMGLMMLof_LOF_Mechanism", "LMMKnown_LMM_FLAGGED"])
    def func(cls, lof="NO", lmm="false", gene="BRCA1"):
        vals = [gene, "hg38", "chr1", "1", "1", cls] + [""] * 10
        vals[16 - 6 + 6:] = []  # keep 16 core then extras
        vals = [gene, "hg38", "chr1", "1", "1", cls, "", "SNP", "A", "G",
                "tx1", "+", "1", "", "", "", lof, lmm]
        return "[" + "|".join(vals) + "]"
    vcf_in = tmp_path / "func.vcf"
    vcf_in.write_text(
        "##fileformat=VCFv4.2\n"
        f'##INFO=<ID=FUNCOTATION,Number=A,Type=String,Description="Functional annotation from the Funcotator tool.  Funcotation fields are: {fields}">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        f"chr1\t100\t.\tA\tG\t50\tPASS\tFUNCOTATION={func('NONSENSE', lof='YES')}\tGT\t0/1\n"
        f"chr1\t200\t.\tC\tT\t50\tPASS\tFUNCOTATION={func('MISSENSE')}\tGT\t0/1\n"
        f"chr1\t300\t.\tG\tA\t50\tPASS\tFUNCOTATION={func('MISSENSE', lmm='true')}\tGT\t0/1\n")
    out = str(tmp_path / "filtered.vcf")
    rc = TOOL_REGISTRY["FilterFuncotations"](
        ["-V", str(vcf_in), "-O", out, "--ref-version", "hg38"])
    assert rc == 0
    recs = {int(l.split("\t")[1]): l.split("\t") for l in open(out)
            if not l.startswith("#")}
    assert "CLINSIG=LOF" in recs[100][7] and recs[100][6] == "PASS"
    assert recs[200][6] == "NOT_CLINSIG"
    assert "CLINSIG=LMM" in recs[300][7]


def test_print_file_diagnostics(tmp_path):
    vcf_in = tmp_path / "x.vcf"
    vcf_in.write_text("##fileformat=VCFv4.2\n##contig=<ID=chr1>\n"
                      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    out = str(tmp_path / "diag.txt")
    rc = TOOL_REGISTRY["PrintFileDiagnostics"](["-I", str(vcf_in), "-O", out])
    assert rc == 0
    text = open(out).read()
    assert "VCF file" in text and "header lines: 2" in text


def test_bwa_mem_index_image_creator_and_reuse(tmp_path):
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    fa = tmp_path / "r.fa"
    fa.write_text(f">chr1\n{seq}\n")
    img = str(tmp_path / "r.fa.img")
    rc = TOOL_REGISTRY["BwaMemIndexImageCreator"](["-I", str(fa), "-O", img])
    assert rc == 0
    z = np.load(img)
    assert list(z["names"]) == ["chr1"]
    assert int(z["k"]) == 21
    assert len(z["ref"]) == 500


def test_pathseq_build_reference_taxonomy(tmp_path):
    rng = np.random.default_rng(5)
    s1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 800))
    s2 = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    fa = tmp_path / "microbes.fa"
    fa.write_text(f">NC_001.1\n{s1}\n>NC_002.1\n{s2}\n")
    catalog = tmp_path / "refseq.catalog.gz"
    with gzip.open(catalog, "wt") as fh:
        fh.write("562\tEscherichia coli\tNC_001.1\n")
        fh.write("10710\tLambda virus\tNC_002.1\n")
    # taxdump dir with nodes.dmp/names.dmp
    dump = tmp_path / "taxdump"
    dump.mkdir()
    (dump / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "2\t|\t1\t|\tsuperkingdom\t|\n"
        "562\t|\t2\t|\tspecies\t|\n"
        "10239\t|\t1\t|\tsuperkingdom\t|\n"
        "10710\t|\t10239\t|\tspecies\t|\n")
    (dump / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n"
        "562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n"
        "10239\t|\tViruses\t|\t\t|\tscientific name\t|\n"
        "10710\t|\tLambda virus\t|\t\t|\tscientific name\t|\n")
    out = str(tmp_path / "taxonomy.db")
    rc = TOOL_REGISTRY["PathSeqBuildReferenceTaxonomy"](
        ["-R", str(fa), "-O", out, "--refseq-catalog", str(catalog),
         "--tax-dump", str(dump), "--min-non-virus-contig-length", "500"])
    assert rc == 0
    from gatk_tpu.tools.pathseq_tools import read_taxonomy
    nodes, acc = read_taxonomy(out)
    assert 562 in nodes and nodes[562]["length"] == 800
    assert acc["NC_001.1"] == 562
    # short virus contig kept (min length applies to non-virus only)
    assert 10710 in nodes and nodes[10710]["length"] == 300
    # ancestors present
    assert 2 in nodes and 1 in nodes


def test_gather_normal_artifact_data(tmp_path):
    t1 = tmp_path / "a.tsv"
    t1.write_text("normal_alt\tnormal_dp\ttumor_alt\ttumor_dp\tdownsampling\ttype\n"
                  "1\t30\t0\t25\t0.05\tSNV\n")
    t2 = tmp_path / "b.tsv"
    t2.write_text("normal_alt\tnormal_dp\ttumor_alt\ttumor_dp\tdownsampling\ttype\n"
                  "2\t40\t1\t35\t0.10\tSNV\n")
    out = str(tmp_path / "g.tsv")
    rc = TOOL_REGISTRY["GatherNormalArtifactData"](
        ["-I", str(t1), "-I", str(t2), "-O", out])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 3 and lines[0].startswith("normal_alt")


def test_gene_expression_evaluation(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    gff = tmp_path / "genes.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "chr1\t.\tgene\t101\t500\t.\t+\t.\tID=gene1;Name=GENE1\n"
        "chr1\t.\tmRNA\t101\t500\t.\t+\t.\tID=tx1;Parent=gene1\n"
        "chr1\t.\texon\t101\t200\t.\t+\t.\tID=ex1;Parent=tx1\n"
        "chr1\t.\texon\t401\t500\t.\t+\t.\tID=ex2;Parent=tx1\n"
        "chr1\t.\tgene\t1001\t1400\t.\t-\t.\tID=gene2;Name=GENE2\n"
        "chr1\t.\texon\t1001\t1400\t.\t-\t.\tID=ex3;Parent=gene2\n")
    bam_path = str(tmp_path / "rna.bam")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 5000, 0)],
                             read_groups=[{"ID": "rg1", "SM": "s1"}])
    w = bamio.BamWriter(bam_path, header)

    def _r(name, pos, rev=False):
        return Read(name=name, flag=0x10 if rev else 0, ref_id=0, pos=pos,
                    mapq=60, cigar_ops=np.array([0], np.uint8),
                    cigar_lens=np.array([50], np.int32),
                    bases=np.full(50, ord("A"), np.uint8),
                    quals=np.full(50, 30, np.uint8))
    # 3 forward fragments on gene1 (sense), 1 reverse on gene1 (antisense),
    # 2 reverse fragments on gene2 (sense for the - gene)
    reads = [_r("f1", 120), _r("f2", 130), _r("f3", 440), _r("a1", 150, rev=True),
             _r("g1", 1100, rev=True), _r("g2", 1200, rev=True)]
    for r in sorted(reads, key=lambda x: x.pos):
        w.write(r)
    w.close()
    out = str(tmp_path / "expr.tsv")
    rc = TOOL_REGISTRY["GeneExpressionEvaluation"](
        ["-I", bam_path, "-G", str(gff), "-O", out])
    assert rc == 0
    rows = {}
    for line in open(out).read().splitlines()[1:]:
        f = line.split("\t")
        rows[(f[0], f[5])] = float(f[6])
    assert rows[("GENE1", "sense")] == pytest.approx(3.0, abs=0.01)
    assert rows[("GENE1", "antisense")] == pytest.approx(1.0, abs=0.01)
    assert rows[("GENE2", "sense")] == pytest.approx(2.0, abs=0.01)
    assert rows[("GENE2", "antisense")] == 0.0


def test_add_flow_base_quality(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    bam_path = str(tmp_path / "flow.bam")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 10000, 0)],
                             read_groups=[{"ID": "rg1", "SM": "s1", "FO": "TGCATGCA"}])
    w = bamio.BamWriter(bam_path, header)
    seq = "TTGGCAATG"
    w.write(Read(name="r1", flag=0, ref_id=0, pos=100, mapq=60,
                 cigar_ops=np.array([0], np.uint8),
                 cigar_lens=np.array([len(seq)], np.int32),
                 bases=np.frombuffer(seq.encode(), np.uint8).copy(),
                 quals=np.full(len(seq), 30, np.uint8)))
    w.close()
    out = str(tmp_path / "xq.bam")
    rc = TOOL_REGISTRY["AddFlowBaseQuality"](["-I", bam_path, "-O", out])
    assert rc == 0
    from gatk_tpu.io import bam as bamio2
    reads = list(bamio2.BamReader(out))
    assert len(reads) == 1
    xq = (reads[0].tags or {}).get("XQ")
    assert xq is not None and len(xq) == len(seq)
    quals = [ord(c) - 33 for c in xq]
    assert all(0 <= q <= 93 for q in quals)
    # interior bases of an hmer carry no boundary error -> max quality
    # (TT hmer: first/last get boundary probs; singleton bases get sided probs)
    assert max(quals) == 93 or max(quals) > min(quals)


def _ctg_read(name, ref_id, pos, cigar, rev=False, mapq=60, seq_len=None):
    from gatk_tpu.io.reads import Read
    ops = {"M": 0, "I": 1, "D": 2, "S": 4, "H": 5}
    import re
    parsed = [(int(n), ops[c]) for n, c in re.findall(r"(\d+)([MIDSH])", cigar)]
    read_len = sum(n for n, o in parsed if o in (0, 1, 4))
    return Read(name=name, flag=(0x10 if rev else 0) | 0x800, ref_id=ref_id,
                pos=pos, mapq=mapq,
                cigar_ops=np.array([o for _, o in parsed], np.uint8),
                cigar_lens=np.array([n for n, _ in parsed], np.int32),
                bases=np.full(read_len, ord("A"), np.uint8),
                quals=np.full(read_len, 30, np.uint8))


def test_structural_variant_discoverer(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio

    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 100000, 0),
                                        samio.SequenceRecord("chr2", 100000, 1)],
                             read_groups=[{"ID": "rg", "SM": "s1"}])
    bam_path = str(tmp_path / "contigs.bam")
    w = bamio.BamWriter(bam_path, header)
    # DEL contig: 200bp contig; first 100bp at 1000, last 100bp at 1600 (500bp del)
    w.write(_ctg_read("ctg_del", 0, 1000, "100M100S"))
    w.write(_ctg_read("ctg_del", 0, 1600, "100S100M"))
    # INS contig: 300bp contig; 100bp at 2000, 100bp at 2100, middle 100bp unaligned
    w.write(_ctg_read("ctg_ins", 0, 2000, "100M200S"))
    w.write(_ctg_read("ctg_ins", 0, 2100, "200S100M"))
    # INV contig: strand flip
    w.write(_ctg_read("ctg_inv", 0, 3000, "100M100S"))
    w.write(_ctg_read("ctg_inv", 0, 3300, "100M100S", rev=True))
    # BND contig: chr1 -> chr2
    w.write(_ctg_read("ctg_bnd", 0, 5000, "100M100S"))
    w.write(_ctg_read("ctg_bnd", 1, 7000, "100S100M"))
    w.close()

    out = str(tmp_path / "sv.vcf")
    rc = TOOL_REGISTRY["StructuralVariantDiscoverer"](
        ["-I", bam_path, "-O", out])
    assert rc == 0
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    by_type = {}
    for r in recs:
        info = dict(kv.split("=", 1) for kv in r[7].split(";") if "=" in kv)
        by_type.setdefault(info["SVTYPE"], []).append((r, info))
    assert "DEL" in by_type and "INS" in by_type and "INV" in by_type and "BND" in by_type
    (r, info), = by_type["DEL"]
    assert int(r[1]) == 1100  # 1-based breakpoint at end of first segment
    assert int(info["SVLEN"]) == -500
    assert info["CTGS"] == "ctg_del"
    (r, info), = by_type["INS"]
    assert int(info["SVLEN"]) == 100
    (r, info), = by_type["INV"]
    assert int(info["END"]) - int(r[1]) >= 50


def test_haplotype_based_variant_recaller(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    fa = tmp_path / "r.fa"
    fa.write_text(f">chr1\n{seq}\n")
    var_pos = 200  # 0-based; make alt haplotype with G at this pos
    ref_base = seq[var_pos]
    alt_base = "G" if ref_base != "G" else "C"

    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 400, 0)],
                             read_groups=[{"ID": "rg", "SM": "s1"}])
    # haplotypes BAM: ref haplotype + alt haplotype spanning 150..250
    hap_bam = str(tmp_path / "haps.bam")
    w = bamio.BamWriter(hap_bam, header)
    hap_ref = seq[150:250]
    hap_alt = hap_ref[:50] + alt_base + hap_ref[51:]
    for i, h in enumerate((hap_ref, hap_alt)):
        w.write(Read(name=f"hap{i}", flag=0, ref_id=0, pos=150, mapq=60,
                     cigar_ops=np.array([0], np.uint8),
                     cigar_lens=np.array([100], np.int32),
                     bases=np.frombuffer(h.encode(), np.uint8).copy(),
                     quals=np.full(100, 40, np.uint8)))
    w.close()
    # reads BAM: 4 ref reads + 4 alt reads over the variant
    reads_bam = str(tmp_path / "reads.bam")
    w = bamio.BamWriter(reads_bam, header)
    for i in range(8):
        src = hap_ref if i < 4 else hap_alt
        start = 20 + 2 * i
        w.write(Read(name=f"r{i}", flag=0, ref_id=0, pos=150 + start, mapq=60,
                     cigar_ops=np.array([0], np.uint8),
                     cigar_lens=np.array([40], np.int32),
                     bases=np.frombuffer(src[start:start + 40].encode(), np.uint8).copy(),
                     quals=np.full(40, 35, np.uint8)))
    w.close()
    vcf_path = tmp_path / "alleles.vcf"
    vcf_path.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        f"chr1\t{var_pos + 1}\t.\t{ref_base}\t{alt_base}\t.\tPASS\t.\n")
    out = str(tmp_path / "matrix.csv")
    rc = TOOL_REGISTRY["HaplotypeBasedVariantRecaller"](
        ["--alleles-file-vcf", str(vcf_path), "--haplotypes-file-bam", hap_bam,
         "--matrix-file-csv", out, "-I", reads_bam, "-R", str(fa)])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert lines[0].startswith(f"#chr1:{var_pos + 1}")
    assert ref_base in lines[0].split() and alt_base in lines[0].split()
    data = [l.split() for l in lines[1:] if l]
    assert len(data) == 8
    # ref reads favor the ref allele column, alt reads the alt column
    for row in data:
        name, lik_ref, lik_alt = row[0], float(row[-2]), float(row[-1])
        if int(name[1:]) < 4:
            assert lik_ref > lik_alt, row
        else:
            assert lik_alt > lik_ref, row


def test_analyze_saturation_mutagenesis(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    # amplicon: 60bp with ORF at 16..45 (1-based 16-45, 10 codons)
    seq = "AAAAACCCCCGGGGG" + "ATGGCTGCAGCTGCAGCTGCAGCTGCATAA" + "TTTTTGGGGGAAAAA"
    fa = tmp_path / "amp.fa"
    fa.write_text(f">amp\n{seq}\n")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("amp", len(seq), 0)])
    bam_path = str(tmp_path / "sm.bam")
    w = bamio.BamWriter(bam_path, header)

    def _read(name, mutate_at=None, alt="T"):
        b = bytearray(seq.encode())
        if mutate_at is not None:
            b[mutate_at] = ord(alt)
        return Read(name=name, flag=0, ref_id=0, pos=0, mapq=60,
                    cigar_ops=np.array([0], np.uint8),
                    cigar_lens=np.array([len(seq)], np.int32),
                    bases=np.frombuffer(bytes(b), np.uint8).copy(),
                    quals=np.full(len(seq), 38, np.uint8))
    # 5 reads with codon-2 GCT>GTT (missense A>V at codon 2), 3 wild type
    for i in range(5):
        w.write(_read(f"v{i}", mutate_at=19, alt="T"))  # pos 19: codon2 middle
    for i in range(3):
        w.write(_read(f"w{i}"))
    w.close()
    prefix = str(tmp_path / "out")
    rc = TOOL_REGISTRY["AnalyzeSaturationMutagenesis"](
        ["-I", bam_path, "-R", str(fa), "-O", prefix, "--orf", "16-45"])
    assert rc == 0
    vc = open(prefix + ".variantCounts").read().strip().split("\t")
    assert vc[0] == "5"              # observation count
    assert vc[3] == "1"              # one SNV
    assert "20:C>T" in vc[4]
    assert vc[5] == "1"              # one codon variation
    assert "2:GCT>GTT" in vc[6]
    assert "M:A>V" in vc[7]          # missense Ala -> Val
    rcounts = open(prefix + ".readCounts").read()
    assert "Total Reads:\t8" in rcounts
    assert ">wild_type:\t3" in rcounts
    cov = open(prefix + ".refCoverage").read().splitlines()
    assert cov[1] == "1\t8"
    codons = open(prefix + ".codonCounts").read().splitlines()
    header_cols = codons[0].split("\t")
    gtt = header_cols.index("GTT")
    assert codons[2].split("\t")[gtt] == "5"  # codon 2 row


def test_spark_compat_aliases(tmp_path):
    from gatk_tpu.cli import TOOL_REGISTRY
    assert "MarkDuplicatesSpark" in TOOL_REGISTRY
    assert "GatherVcfsCloud" in TOOL_REGISTRY
    # alias strips spark flags and routes to the single-node implementation
    vcf_a = tmp_path / "a.vcf"
    vcf_a.write_text("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                     "chr1\t100\t.\tA\tG\t50\tPASS\t.\n")
    out = str(tmp_path / "g.vcf")
    rc = TOOL_REGISTRY["GatherVcfsCloud"](
        ["-I", str(vcf_a), "-O", out, "--spark-master", "local[2]"])
    assert rc == 0
    assert "chr1\t100" in open(out).read()


def test_merge_annotated_regions_by_annotation(tmp_path):
    seg = tmp_path / "segs.tsv"
    seg.write_text("CONTIG\tSTART\tEND\tCall\tScore\n"
                   "chr1\t100\t200\tAMP\t5\n"
                   "chr1\t250\t400\tAMP\t7\n"
                   "chr1\t450\t600\tDEL\t2\n"
                   "chr2\t100\t200\tAMP\t5\n")
    out = str(tmp_path / "m.tsv")
    rc = TOOL_REGISTRY["MergeAnnotatedRegionsByAnnotation"](
        ["--segments", str(seg), "--annotations-to-match", "Call", "-O", out])
    assert rc == 0
    rows = [l.split("\t") for l in open(out).read().splitlines()[1:]]
    assert len(rows) == 3  # first two AMP rows merged; DEL and chr2 separate
    assert rows[0][2] == "400"
    assert "5__7" in rows[0][4]


def test_ground_truth_scorer(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(17)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    fa = tmp_path / "r.fa"
    fa.write_text(f">chr1\n{seq}\n")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 300, 0)])
    bam_path = str(tmp_path / "gt.bam")
    w = bamio.BamWriter(bam_path, header)
    perfect = seq[50:150]
    noisy = bytearray(perfect.encode())
    noisy[10] = ord("A") if noisy[10] != ord("A") else ord("C")
    for name, s in (("perfect", perfect.encode()), ("noisy", bytes(noisy))):
        w.write(Read(name=name, flag=0, ref_id=0, pos=50, mapq=60,
                     cigar_ops=np.array([0], np.uint8),
                     cigar_lens=np.array([100], np.int32),
                     bases=np.frombuffer(s, np.uint8).copy(),
                     quals=np.full(100, 30, np.uint8)))
    w.close()
    out = str(tmp_path / "scores.csv")
    rep = str(tmp_path / "report.tsv")
    rc = TOOL_REGISTRY["GroundTruthScorer"](
        ["-I", bam_path, "-R", str(fa), "--output-csv", out, "--report-file", rep])
    assert rc == 0
    rows = {l.split(",")[0]: l.split(",") for l in open(out).read().splitlines()[1:]}
    assert float(rows["perfect"][5]) == 0.0
    assert float(rows["noisy"][5]) < 0.0
    assert "DeclaredQual" in open(rep).read()


def test_cram_issue_8768_detector(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(23)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    fa = tmp_path / "r.fa"
    fa.write_text(f">chr1\n{seq}\n")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 500, 0)])
    bam_path = str(tmp_path / "ok.bam")
    w = bamio.BamWriter(bam_path, header)
    for i in range(5):
        start = 20 * i
        w.write(Read(name=f"r{i}", flag=0, ref_id=0, pos=start, mapq=60,
                     cigar_ops=np.array([0], np.uint8),
                     cigar_lens=np.array([100], np.int32),
                     bases=np.frombuffer(seq[start:start + 100].encode(), np.uint8).copy(),
                     quals=np.full(100, 30, np.uint8)))
    w.close()
    out = str(tmp_path / "diag.txt")
    rc = TOOL_REGISTRY["CRAMIssue8768Detector"](
        ["-I", bam_path, "-R", str(fa), "-O", out,
         "--output-tsv", str(tmp_path / "d.tsv")])
    assert rc == 0
    assert "OK" in open(out).read()


def test_add_flow_snv_quality(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    bam_path = str(tmp_path / "flow2.bam")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 10000, 0)],
                             read_groups=[{"ID": "rg1", "SM": "s1", "FO": "TGCATGCA"}])
    w = bamio.BamWriter(bam_path, header)
    seq = "TTGGCAATGC"
    w.write(Read(name="r1", flag=0, ref_id=0, pos=100, mapq=60,
                 cigar_ops=np.array([0], np.uint8),
                 cigar_lens=np.array([len(seq)], np.int32),
                 bases=np.frombuffer(seq.encode(), np.uint8).copy(),
                 quals=np.full(len(seq), 30, np.uint8)))
    w.close()
    out = str(tmp_path / "snvq.bam")
    rc = TOOL_REGISTRY["AddFlowSNVQuality"](["-I", bam_path, "-O", out])
    assert rc == 0
    from gatk_tpu.io import bam as bamio2
    reads = list(bamio2.BamReader(out))
    tags = reads[0].tags or {}
    # qa/qc/qg/qt attributes present, fastq-encoded, one char per base
    for c in "tgca":
        assert f"q{c}" in tags and len(tags[f"q{c}"]) == len(seq)
    # the called base's column carries low error prob (high qual); at each
    # position exactly one of the four is the called base
    for ofs, base in enumerate(seq.lower()):
        called_q = ord(tags[f"q{base}"][ofs]) - 33
        others = [ord(tags[f"q{c}"][ofs]) - 33 for c in "tgca" if c != base]
        assert called_q <= min(others) + 60  # called prob ~1 -> low phred of 1-p...
    # quals replaced by SNV-derived values
    assert not np.all(reads[0].quals == 30)


def test_ground_truth_reads_builder(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(29)
    base_seq = list("ACGT" [i] for i in rng.integers(0, 4, 300))
    mat_seq = "".join(base_seq)
    pat_list = list(base_seq)
    pat_list[150] = "G" if pat_list[150] != "G" else "C"  # paternal-only SNP
    pat_seq = "".join(pat_list)
    (tmp_path / "mat.fa").write_text(f">chr1\n{mat_seq}\n")
    (tmp_path / "pat.fa").write_text(f">chr1\n{pat_seq}\n")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 300, 0)])
    bam_path = str(tmp_path / "gt.bam")
    w = bamio.BamWriter(bam_path, header)
    # read carrying the paternal allele
    w.write(Read(name="r_pat", flag=0, ref_id=0, pos=120, mapq=60,
                 cigar_ops=np.array([0], np.uint8),
                 cigar_lens=np.array([60], np.int32),
                 bases=np.frombuffer(pat_seq[120:180].encode(), np.uint8).copy(),
                 quals=np.full(60, 35, np.uint8)))
    # read carrying the maternal allele
    w.write(Read(name="r_mat", flag=0, ref_id=0, pos=120, mapq=60,
                 cigar_ops=np.array([0], np.uint8),
                 cigar_lens=np.array([60], np.int32),
                 bases=np.frombuffer(mat_seq[120:180].encode(), np.uint8).copy(),
                 quals=np.full(60, 35, np.uint8)))
    w.close()
    out = str(tmp_path / "gt.csv")
    rc = TOOL_REGISTRY["GroundTruthReadsBuilder"](
        ["-I", bam_path, "--maternal-ref", str(tmp_path / "mat.fa"),
         "--paternal-ref", str(tmp_path / "pat.fa"), "--output-csv", out])
    assert rc == 0
    rows = {l.split(",")[0]: l.split(",") for l in open(out).read().splitlines()[1:]}
    assert rows["r_pat"][6] == "paternal"
    assert rows["r_mat"][6] == "maternal"
    assert rows["r_pat"][2].endswith("N" * 8)  # haplotype padding


def _mk_metrics_bam(tmp_path, with_pairs=False):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(31)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    fa = tmp_path / "m.fa"
    fa.write_text(f">chr1\n{seq}\n")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 400, 0)])
    bam_path = str(tmp_path / "m.bam")
    w = bamio.BamWriter(bam_path, header)
    reads = []
    for i in range(10):
        start = 10 + 30 * i
        flag = 0
        if with_pairs:
            flag = 0x1 | 0x40 if i % 2 == 0 else 0x1 | 0x80
        reads.append(Read(name=f"p{i // 2}" if with_pairs else f"r{i}",
                          flag=flag, ref_id=0, pos=start, mapq=60,
                          cigar_ops=np.array([0], np.uint8),
                          cigar_lens=np.array([50], np.int32),
                          bases=np.frombuffer(seq[start:start + 50].encode(), np.uint8).copy(),
                          quals=np.full(50, 30, np.uint8)))
    for r in sorted(reads, key=lambda x: x.pos):
        w.write(r)
    w.close()
    return bam_path, str(fa)


def test_picard_metrics_tranche(tmp_path):
    bam_path, fa = _mk_metrics_bam(tmp_path)
    out = str(tmp_path / "bd.metrics")
    assert TOOL_REGISTRY["CollectBaseDistributionByCycle"](
        ["-I", bam_path, "-O", out]) == 0
    text = open(out).read()
    assert "PCT_A" in text and "BaseDistributionByCycleMetrics" in text

    out2 = str(tmp_path / "gc.metrics")
    sum2 = str(tmp_path / "gc.summary")
    assert TOOL_REGISTRY["CollectGcBiasMetrics"](
        ["-I", bam_path, "-R", fa, "-O", out2, "-S", sum2]) == 0
    assert "NORMALIZED_COVERAGE" in open(out2).read()
    assert "AT_DROPOUT" in open(sum2).read()

    out3 = str(tmp_path / "oxog.metrics")
    assert TOOL_REGISTRY["CollectOxoGMetrics"](
        ["-I", bam_path, "-R", fa, "-O", out3]) == 0
    assert "OXIDATION_Q" in open(out3).read()

    out5 = str(tmp_path / "si.interval_list")
    assert TOOL_REGISTRY["ScatterIntervalsByNs"](["-R", fa, "-O", out5]) == 0
    lines = [l for l in open(out5) if not l.startswith("@")]
    assert lines == ["chr1\t1\t400\t+\tACGT\n"]

    out6 = str(tmp_path / "gathered.bam")
    assert TOOL_REGISTRY["GatherBamFiles"](
        ["-I", bam_path, "-I", bam_path, "-O", out6]) == 0
    from gatk_tpu.io import bam as bamio
    assert sum(1 for _ in bamio.BamReader(out6)) == 20


def test_library_complexity_and_multiple_metrics(tmp_path):
    bam_path, fa = _mk_metrics_bam(tmp_path, with_pairs=True)
    out = str(tmp_path / "lc.metrics")
    assert TOOL_REGISTRY["EstimateLibraryComplexity"](
        ["-I", bam_path, "-O", out]) == 0
    assert "ESTIMATED_LIBRARY_SIZE" in open(out).read()

    base = str(tmp_path / "multi")
    assert TOOL_REGISTRY["CollectMultipleMetrics"](
        ["-I", bam_path, "-O", base]) == 0
    import os
    assert os.path.exists(base + ".quality_by_cycle_metrics")
    assert os.path.exists(base + ".base_distribution_by_cycle_metrics")


def test_hs_metrics_and_crosscheck(tmp_path):
    bam_path, fa = _mk_metrics_bam(tmp_path)
    targets = tmp_path / "t.interval_list"
    targets.write_text("@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:400\n"
                       "chr1\t51\t150\t+\tt1\n")
    out = str(tmp_path / "hs.metrics")
    assert TOOL_REGISTRY["CollectHsMetrics"](
        ["-I", bam_path, "-O", out, "--TARGET_INTERVALS", str(targets)]) == 0
    text = open(out).read()
    assert "MEAN_TARGET_COVERAGE" in text and "FOLD_80_BASE_PENALTY" in text

    out2 = str(tmp_path / "pcr.metrics")
    assert TOOL_REGISTRY["CollectTargetedPcrMetrics"](
        ["-I", bam_path, "-O", out2, "--TARGET_INTERVALS", str(targets),
         "--AMPLICON_INTERVALS", str(targets)]) == 0
    assert "TargetedPcrMetrics" in open(out2).read()

    out3 = str(tmp_path / "artifacts")
    assert TOOL_REGISTRY["CollectSequencingArtifactMetrics"](
        ["-I", bam_path, "-R", fa, "-O", out3]) == 0
    assert "QSCORE" in open(out3 + ".pre_adapter_detail_metrics").read()

    # crosscheck: same BAM against itself must be an EXPECTED_MATCH
    # (use a deeper BAM so fingerprint sites have genotyping depth)
    from gatk_tpu.io import bam as bamio3, sam as samio3
    from gatk_tpu.io.reads import Read as Read3
    ref_seq0 = open(fa).read().splitlines()[1]
    deep = str(tmp_path / "deep.bam")
    w3 = bamio3.BamWriter(deep, samio3.SamHeader(
        sequences=[samio3.SequenceRecord("chr1", 400, 0)]))
    for i in range(35):
        start = 10 * i
        w3.write(Read3(name=f"d{i}", flag=0, ref_id=0, pos=start, mapq=60,
                       cigar_ops=np.array([0], np.uint8),
                       cigar_lens=np.array([50], np.int32),
                       bases=np.frombuffer(ref_seq0[start:start + 50].encode(),
                                           np.uint8).copy(),
                       quals=np.full(50, 30, np.uint8)))
    w3.close()
    bam_path = deep
    hmap = tmp_path / "hmap.vcf"
    ref_seq = open(fa).read().splitlines()[1]
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    for pos in range(55, 235, 15):
        rb = ref_seq[pos - 1]
        alt = "A" if rb != "A" else "G"
        lines.append(f"chr1\t{pos}\t.\t{rb}\t{alt}\t.\tPASS\t.")
    hmap.write_text("\n".join(lines) + "\n")
    out4 = str(tmp_path / "crosscheck.metrics")
    rc = TOOL_REGISTRY["CrosscheckFingerprints"](
        ["-I", bam_path, "-I", bam_path, "-H", str(hmap), "-O", out4])
    assert rc == 0
    assert "EXPECTED_MATCH" in open(out4).read()


def test_sv_discovery_pipeline_end_to_end(tmp_path):
    """Full BAM -> SV VCF chain (StructuralVariationDiscoveryPipelineSpark
    equivalent): junction-spanning softclipped reads -> evidence cluster ->
    local assembly -> contig realignment -> DEL call."""
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(37)
    ref_seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    fa = tmp_path / "sv.fa"
    fa.write_text(f">chr1\n{ref_seq}\n")
    del_start, del_len = 1500, 400  # deletion of ref[1500:1900]
    alt = ref_seq[:del_start] + ref_seq[del_start + del_len:]

    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 3000, 0)],
                             read_groups=[{"ID": "rg", "SM": "s1"}])
    bam_path = str(tmp_path / "sv.bam")
    w = bamio.BamWriter(bam_path, header)
    reads = []
    # junction-spanning reads from the ALT genome: aligned as M up to the
    # junction with the remainder softclipped (what an aligner produces)
    for i in range(8):
        start_alt = del_start - 120 + 10 * i  # read covers the junction
        seq = alt[start_alt : start_alt + 160]
        m = del_start - start_alt  # bases before the junction
        reads.append(Read(
            name=f"j{i}", flag=0, ref_id=0, pos=start_alt, mapq=60,
            cigar_ops=np.array([0, 4], np.uint8),
            cigar_lens=np.array([m, 160 - m], np.int32),
            bases=np.frombuffer(seq.encode(), np.uint8).copy(),
            quals=np.full(160, 35, np.uint8)))
    # plain flanking reads for assembly context
    for i in range(12):
        start_alt = del_start - 400 + 30 * i
        seq = alt[start_alt : start_alt + 120]
        pos = start_alt if start_alt + 120 <= del_start else start_alt
        reads.append(Read(
            name=f"f{i}", flag=0, ref_id=0, pos=pos, mapq=60,
            cigar_ops=np.array([0], np.uint8),
            cigar_lens=np.array([120], np.int32),
            bases=np.frombuffer(seq.encode(), np.uint8).copy(),
            quals=np.full(120, 35, np.uint8)))
    for r in sorted(reads, key=lambda x: x.pos):
        w.write(r)
    w.close()

    out = str(tmp_path / "sv.vcf")
    rc = TOOL_REGISTRY["StructuralVariationDiscoveryPipelineSpark"](
        ["-I", bam_path, "-R", str(fa), "-O", out])
    assert rc == 0
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    dels = [r for r in recs if "SVTYPE=DEL" in r[7]]
    assert dels, f"no DEL found: {[(r[1], r[7]) for r in recs]}"
    info = dict(kv.split("=", 1) for kv in dels[0][7].split(";") if "=" in kv)
    # breakpoint within a few bp of the true junction, length ~= 400
    assert abs(int(dels[0][1]) - del_start) <= 20
    assert abs(abs(int(info["SVLEN"])) - del_len) <= 20


def test_find_breakpoint_evidence(tmp_path):
    """FindBreakpointEvidenceSpark writes evidence TSV + contig BAM."""
    # reuse the deletion scenario from the pipeline test
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(37)
    ref_seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    fa = tmp_path / "sv.fa"
    fa.write_text(f">chr1\n{ref_seq}\n")
    del_start, del_len = 1500, 400
    alt = ref_seq[:del_start] + ref_seq[del_start + del_len:]
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 3000, 0)])
    bam_path = str(tmp_path / "sv.bam")
    w = bamio.BamWriter(bam_path, header)
    reads = []
    for i in range(8):
        start_alt = del_start - 120 + 10 * i
        seq = alt[start_alt : start_alt + 160]
        m = del_start - start_alt
        reads.append(Read(name=f"j{i}", flag=0, ref_id=0, pos=start_alt, mapq=60,
                          cigar_ops=np.array([0, 4], np.uint8),
                          cigar_lens=np.array([m, 160 - m], np.int32),
                          bases=np.frombuffer(seq.encode(), np.uint8).copy(),
                          quals=np.full(160, 35, np.uint8)))
    for r in sorted(reads, key=lambda x: x.pos):
        w.write(r)
    w.close()
    out_bam = str(tmp_path / "contigs.bam")
    tsv = str(tmp_path / "evidence.tsv")
    rc = TOOL_REGISTRY["FindBreakpointEvidenceSpark"](
        ["-I", bam_path, "-R", str(fa), "-O", out_bam,
         "--target-link-file", tsv])
    assert rc == 0
    assert "evidence_cluster" in open(tsv).read()
    from gatk_tpu.io import bam as bamio2
    contigs = list(bamio2.BamReader(out_bam))
    assert contigs, "no assembled contig alignments written"
    assert all(c.name.startswith("asm") for c in contigs)


def test_sv_utility_tools(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(41)
    # reference with a 60bp repeat copied 5x (bad kmers at k=31)
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    ref_seq = ("".join("ACGT"[i] for i in rng.integers(0, 4, 200))
               + unit * 5 + "".join("ACGT"[i] for i in rng.integers(0, 4, 200)))
    fa = tmp_path / "r.fa"
    fa.write_text(f">chr1\n{ref_seq}\n")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", len(ref_seq), 0)])
    bam_path = str(tmp_path / "r.bam")
    w = bamio.BamWriter(bam_path, header)
    for i, (name, pos, cigar, tags) in enumerate([
            ("a", 100, [(0, 60), (4, 40)], {}),
            ("b", 150, [(0, 100)], {"SA": "chr1,400,+,50S50M,60,0;"}),
            ("c", 200, [(0, 100)], {})]):
        r = Read(name=name, flag=0x1 | (0x20 if name == "c" else 0), ref_id=0,
                 pos=pos, mapq=60,
                 cigar_ops=np.array([o for o, _ in cigar], np.uint8),
                 cigar_lens=np.array([l for _, l in cigar], np.int32),
                 bases=np.full(100, ord("A"), np.uint8),
                 quals=np.full(100, 30, np.uint8),
                 mate_ref_id=0, mate_pos=50000 if name == "c" else pos + 200,
                 tlen=50000 if name == "c" else 300)
        r.tags = tags
        w.write(r)
    w.close()

    ev = str(tmp_path / "ev.tsv")
    assert TOOL_REGISTRY["ExtractSVEvidenceSpark"](
        ["-I", bam_path, "-O", ev]) == 0
    text = open(ev).read()
    assert "SplitRead" in text and "SplitAlignment" in text and "DiscordantPair" in text

    names = tmp_path / "names.txt"
    names.write_text("a\nc\n")
    out_bam = str(tmp_path / "sub.bam")
    assert TOOL_REGISTRY["ExtractOriginalAlignmentRecordsByNameSpark"](
        ["-I", bam_path, "-O", out_bam, "--read-name-file", str(names)]) == 0
    assert {r.name for r in bamio.BamReader(out_bam)} == {"a", "c"}

    bad = str(tmp_path / "bad.txt")
    assert TOOL_REGISTRY["FindBadGenomicKmersSpark"](
        ["-R", str(fa), "-O", bad, "--kmer-size", "31", "--max-kmer-freq", "3"]) == 0
    bad_kmers = open(bad).read().split()
    assert bad_kmers, "repeat kmers not detected"
    assert all(len(k) == 31 for k in bad_kmers)

    meta = str(tmp_path / "meta.txt")
    assert TOOL_REGISTRY["CalcMetadataSpark"](
        ["-I", bam_path, "-O", meta]) == 0
    assert "coverage" in open(meta).read()


def test_bwa_spark_and_compare_duplicates(tmp_path):
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(43)
    ref_seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 600))
    fa = tmp_path / "r.fa"
    fa.write_text(f">chr1\n{ref_seq}\n")
    # unaligned-style input BAM (reads drawn from the reference)
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 600, 0)])
    in_bam = str(tmp_path / "u.bam")
    w = bamio.BamWriter(in_bam, header)
    starts = [50, 120, 200, 350]
    for i, s in enumerate(starts):
        w.write(Read(name=f"r{i}", flag=0, ref_id=0, pos=0, mapq=0,
                     cigar_ops=np.array([0], np.uint8),
                     cigar_lens=np.array([80], np.int32),
                     bases=np.frombuffer(ref_seq[s:s + 80].encode(), np.uint8).copy(),
                     quals=np.full(80, 30, np.uint8)))
    w.close()
    out_bam = str(tmp_path / "aln.bam")
    assert TOOL_REGISTRY["BwaSpark"](
        ["-I", in_bam, "-R", str(fa), "-O", out_bam]) == 0
    aligned = {r.name: int(r.pos) for r in bamio.BamReader(out_bam)}
    for i, s in enumerate(starts):
        assert aligned[f"r{i}"] == s, (i, aligned)

    # CompareDuplicatesSpark: same file agrees with itself
    assert TOOL_REGISTRY["CompareDuplicatesSpark"](
        ["-I", out_bam, "-I2", out_bam]) == 0


def test_example_walkers(tmp_path):
    vcf_in = tmp_path / "v.vcf"
    vcf_in.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tG\t50\tPASS\t.\n"
        "chr1\t200\t.\tC\tT\t90\tPASS\t.\n")
    out = str(tmp_path / "vw.txt")
    assert TOOL_REGISTRY["ExampleVariantWalker"](
        ["-V", str(vcf_in), "-O", out]) == 0
    assert "chr1:100" in open(out).read()
    out2 = str(tmp_path / "2p.txt")
    assert TOOL_REGISTRY["ExampleTwoPassVariantWalker"](
        ["-V", str(vcf_in), "-O", out2]) == 0
    assert "z=" in open(out2).read()
    out3 = str(tmp_path / "pv.vcf")
    assert TOOL_REGISTRY["PrintVariantsSpark"](
        ["-V", str(vcf_in), "-O", out3, "--spark-master", "local[1]"]) == 0
    assert "chr1\t200" in open(out3).read()


def test_more_example_walkers(tmp_path):
    vcf_a = tmp_path / "a.vcf"
    vcf_a.write_text("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                     "chr1\t100\t.\tA\tG\t50\tPASS\t.\n")
    vcf_b = tmp_path / "b.vcf"
    vcf_b.write_text("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                     "chr1\t50\t.\tC\tT\t60\tPASS\t.\n")
    out = str(tmp_path / "mf.txt")
    assert TOOL_REGISTRY["ExampleMultiFeatureWalker"](
        ["-F", str(vcf_a), "-F", str(vcf_b), "-O", out]) == 0
    lines = open(out).read().splitlines()
    assert lines[0].startswith("chr1:50")  # merged coordinate order
    assert "2 features" in lines[-1]

    bam_path, _fa = _mk_metrics_bam(tmp_path)
    out2 = str(tmp_path / "pr.txt")
    assert TOOL_REGISTRY["ExamplePartialReadWalker"](
        ["-I", bam_path, "-O", out2, "--stop-on-read-count", "3"]) == 0
    assert "stopped after 3 reads" in open(out2).read()
