"""SVAnnotate + SVCluster tests using the reference's unittest GTF and
hand-constructed SV records (SVAnnotateUnitTest scenarios)."""
import subprocess
import sys

from conftest import reference_path
from gatk_tpu.funcotator.gencode import load_gtf
from gatk_tpu.tools import sv_tools as svt

GTF = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/walkers/sv/SVAnnotate/unittest.gtf")


def _emma1():
    """EMMA1: + strand, transcript chr1:100-1000, exons (100,200),(300,400),
    (500,600),(700,800),(900,1000); CDS within."""
    ts = load_gtf(GTF)
    return next(t for t in ts.values() if t.gene_name == "EMMA1")


def test_annotate_deletion():
    t = _emma1()
    # DEL over the TSS -> LOF
    assert svt.annotate_sv_transcript(50, 150, "DEL", t) == svt.LOF
    # DEL fully intronic
    assert svt.annotate_sv_transcript(210, 290, "DEL", t) == svt.INTRONIC


def test_annotate_duplication():
    t = _emma1()
    # DUP spanning the whole transcript -> COPY_GAIN
    assert svt.annotate_sv_transcript(50, 1100, "DUP", t) == svt.COPY_GAIN
    # DUP over the TSS but not spanning -> TSS_DUP
    assert svt.annotate_sv_transcript(50, 150, "DUP", t) == svt.TSS_DUP
    # DUP with one end inside, one past the end -> DUP_PARTIAL
    assert svt.annotate_sv_transcript(950, 1100, "DUP", t) == svt.DUP_PARTIAL
    # DUP spanning an internal CDS exon with intronic breakpoints -> INT_EXON_DUP
    assert svt.annotate_sv_transcript(290, 410, "DUP", t) == svt.INT_EXON_DUP
    # DUP with one breakpoint inside a CDS -> PARTIAL_EXON_DUP
    assert svt.annotate_sv_transcript(350, 450, "DUP", t) == svt.PARTIAL_EXON_DUP
    # CNV reclassifies exon-overlap consequences
    assert svt.annotate_sv_transcript(290, 410, "CNV", t) == svt.MSV_EXON_OVERLAP


def test_annotate_inversion_and_bnd():
    t = _emma1()
    assert svt.annotate_sv_transcript(50, 1100, "INV", t) == svt.INV_SPAN
    # breakend in a CDS exon is BREAKEND_EXONIC, not LOF
    assert svt.annotate_sv_transcript(350, 350, "BND", t) == svt.BREAKEND_EXON
    assert svt.annotate_sv_transcript(250, 250, "BND", t) == svt.INTRONIC
    # translocation breaking the gene -> LOF
    assert svt.annotate_sv_transcript(350, 350, "CTX", t) == svt.LOF


def _write_sv_vcf(path, rows):
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=SVTYPE,Number=1,Type=String,Description="t">\n')
        fh.write('##INFO=<ID=END,Number=1,Type=Integer,Description="e">\n')
        fh.write('##INFO=<ID=ALGORITHMS,Number=.,Type=String,Description="a">\n')
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")


def test_sv_annotate_cli(tmp_path):
    vcf = str(tmp_path / "sv.vcf")
    _write_sv_vcf(vcf, [
        ("chr1", 50, "del1", "N", "<DEL>", 99, ".", "SVTYPE=DEL;END=150", "GT", "0/1"),
        ("chr1", 5000, "del2", "N", "<DEL>", 99, ".", "SVTYPE=DEL;END=5100", "GT", "0/1"),
    ])
    out = str(tmp_path / "out.vcf")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "SVAnnotate",
                        "-V", vcf, "--protein-coding-gtf", GTF, "-O", out],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in open(out) if not ln.startswith("#")]
    assert "PREDICTED_LOF=EMMA1" in lines[0]
    assert "PREDICTED_INTERGENIC" in lines[1] and "PREDICTED_NEAREST_TSS=" in lines[1]


def test_sv_cluster(tmp_path):
    a = str(tmp_path / "a.vcf")
    b = str(tmp_path / "b.vcf")
    _write_sv_vcf(a, [
        ("chr1", 1000, "a_del", "N", "<DEL>", 99, ".",
         "SVTYPE=DEL;END=5000;ALGORITHMS=pesr", "GT", "0/1"),
        ("chr1", 50000, "a_dup", "N", "<DUP>", 99, ".",
         "SVTYPE=DUP;END=60000;ALGORITHMS=pesr", "GT", "0/1"),
    ])
    _write_sv_vcf(b, [
        ("chr1", 1100, "b_del", "N", "<DEL>", 99, ".",
         "SVTYPE=DEL;END=5080;ALGORITHMS=pesr", "GT", "1/1"),
        ("chr1", 90000, "b_inv", "N", "<INV>", 99, ".",
         "SVTYPE=INV;END=95000;ALGORITHMS=pesr", "GT", "0/1"),
    ])
    out = str(tmp_path / "clustered.vcf")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "SVCluster",
                        "-V", a, "-V", b, "-O", out],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = [ln.split("\t") for ln in open(out) if not ln.startswith("#")]
    # the two DELs cluster (same type, close breakpoints, high overlap);
    # DUP and INV stay separate
    assert len(lines) == 3
    types = sorted(ln[4] for ln in lines)
    assert types == ["<DEL>", "<DUP>", "<INV>"]
    del_line = next(ln for ln in lines if ln[4] == "<DEL>")
    assert "a_del" in del_line[7] and "b_del" in del_line[7]


def test_collect_and_print_sv_evidence(tmp_path):
    """SR clip positions/directions, PE discordant pairs, codec round-trip."""
    import gzip

    import numpy as np

    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 10000, 0),
                                        samio.SequenceRecord("chr2", 10000, 1)])

    def mk(name, pos, cigar, flag=0x1 | 0x40, mate_ref=0, mate_pos=None, tags=None):
        ops, lens = [], []
        for ln, op in cigar:
            ops.append(op)
            lens.append(ln)
        n = sum(l for l, o in zip(lens, ops) if o in (0, 1, 4))
        return Read(name=name, flag=flag, ref_id=0, pos=pos, mapq=60,
                    cigar_ops=np.array(ops, np.uint8), cigar_lens=np.array(lens, np.int32),
                    bases=np.full(n, ord("A"), np.uint8), quals=np.full(n, 30, np.uint8),
                    mate_ref_id=mate_ref, mate_pos=mate_pos if mate_pos is not None else pos + 300,
                    tags=tags or {"RG": "rg1"})

    reads = [
        # two right-clipped reads at the same breakpoint (pos 100 + 50M -> 150)
        mk("a", 100, [(50, 0), (25, 4)], flag=0x1 | 0x2),
        mk("b", 100, [(50, 0), (25, 4)], flag=0x1 | 0x2),
        # one left-clipped read at 200
        mk("c", 200, [(25, 4), (50, 0)], flag=0x1 | 0x2),
        # discordant pair: not properly paired, mate on chr2
        mk("d", 300, [(75, 0)], flag=0x1, mate_ref=1, mate_pos=5000),
    ]
    bam = tmp_path / "in.bam"
    hdr = samio.SamHeader(sequences=header.sequences,
                          read_groups=[{"ID": "rg1", "SM": "S1"}])
    w = bamio.BamWriter(str(bam), hdr)
    for r in sorted(reads, key=lambda x: x.pos):
        w.write(r)
    w.close()

    sr = tmp_path / "out.sr.txt.gz"
    pe = tmp_path / "out.pe.txt.gz"
    TOOL_REGISTRY["CollectSVEvidence"]([
        "-I", str(bam), "--sr-file", str(sr), "--pe-file", str(pe)])
    sr_rows = [l.split("\t") for l in gzip.open(sr, "rt").read().splitlines()]
    assert ["chr1", "150", "right", "2", "S1"] in sr_rows
    assert ["chr1", "200", "left", "1", "S1"] in sr_rows
    pe_rows = [l.split("\t") for l in gzip.open(pe, "rt").read().splitlines()]
    assert pe_rows == [["chr1", "300", "+", "chr2", "5000", "+", "S1"]]

    out = tmp_path / "subset.sr.txt"
    TOOL_REGISTRY["PrintSVEvidence"]([
        "-F", str(sr), "-O", str(out), "-L", "chr1:140-160"])
    assert [l.split("\t") for l in out.read_text().splitlines()] == \
        [["chr1", "150", "right", "2", "S1"]]


# ---------------------------------------------------------------------------
# SVConcordance + JointGermlineCNVSegmentation
# ---------------------------------------------------------------------------


def _write_svc_vcf(path, samples, rows):
    """rows: (contig, pos1, id, svtype, end, [gt dict per sample])"""
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=END,Number=1,Type=Integer,Description="x">\n')
        fh.write('##INFO=<ID=SVTYPE,Number=1,Type=String,Description="x">\n')
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="x">\n')
        fh.write('##FORMAT=<ID=CN,Number=1,Type=Integer,Description="x">\n')
        cols = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
        if samples:
            cols += "\tFORMAT\t" + "\t".join(samples)
        fh.write(cols + "\n")
        for contig, pos1, vid, svtype, end, gts in rows:
            line = (f"{contig}\t{pos1}\t{vid}\tN\t<{svtype}>\t.\t.\t"
                    f"END={end};SVTYPE={svtype}")
            if samples:
                keys = sorted({k for g in gts for k in g})
                keys = [k for k in ("GT", "CN") if k in keys]
                line += "\t" + ":".join(keys)
                for g in gts:
                    line += "\t" + ":".join(str(g.get(k, ".")) for k in keys)
            fh.write(line + "\n")


def test_sv_concordance(tmp_path):
    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import vcf as vcfio

    ev = str(tmp_path / "eval.vcf")
    tr = str(tmp_path / "truth.vcf")
    samples = ["S1", "S2"]
    _write_svc_vcf(ev, samples, [
        # matches truth T1 (close breakends, high overlap); S1 het matches,
        # S2 het vs truth hom-var
        ("chr1", 10000, "E1", "DEL", 20000,
         [{"GT": "0/1"}, {"GT": "0/1"}]),
        # no truth match
        ("chr1", 500000, "E2", "DEL", 501000, [{"GT": "0/1"}, {"GT": "0/0"}]),
    ])
    _write_svc_vcf(tr, samples, [
        ("chr1", 10050, "T1", "DEL", 20100,
         [{"GT": "0/1"}, {"GT": "1/1"}]),
        ("chr1", 900000, "T2", "DUP", 910000, [{"GT": "0/1"}, {"GT": "0/1"}]),
    ])
    out = str(tmp_path / "conc.vcf")
    assert TOOL_REGISTRY["SVConcordance"](
        ["--eval", ev, "--truth", tr, "-O", out]) == 0
    recs = {v.id: v for v in vcfio.VcfReader(out)}
    e1 = recs["E1"]
    assert e1.info["TRUTH_VID"] == "T1"
    assert float(e1.info["TRUTH_RECIPROCAL_OVERLAP"]) > 0.98
    assert e1.info["TRUTH_DISTANCE_START"] == "50"
    assert e1.info["TRUTH_AC"] == "3" and e1.info["TRUTH_AN"] == "4"
    # S1 matches (HET==HET), S2 doesn't (HET vs HOMVAR) -> 0.5
    assert e1.info["GENOTYPE_CONCORDANCE"] == "0.500000"
    assert e1.info["HET_SENSITIVITY"] == "1.000000"  # truth het S1 recovered
    assert e1.info["HET_PPV"] == "0.500000"          # 2 eval hets, 1 correct
    assert "TRUTH_VID" not in recs["E2"].info


def test_joint_germline_cnv_segmentation(tmp_path):
    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import vcf as vcfio

    paths = []
    # sample A: two same-CN DEL segments with a small gap (defragmented into
    # one), plus a ref block
    a = str(tmp_path / "A.vcf")
    _write_svc_vcf(a, ["A"], [
        ("chr1", 1, "ref", "DEL", 9999, [{"GT": "0", "CN": 2}]),
        ("chr1", 10000, "s1", "DEL", 20000, [{"GT": "1", "CN": 1}]),
        ("chr1", 21000, "s2", "DEL", 30000, [{"GT": "1", "CN": 1}]),
    ])
    # QS defaults to 0 in our writer; patch QS in by rewriting FORMAT
    text = open(a).read().replace("GT:CN", "GT:CN:QS").replace(
        "0:2", "0:2:60").replace("1:1", "1:1:60")
    open(a, "w").write(text)
    paths += ["-V", a]
    # sample B: one DEL overlapping A's merged segment
    b = str(tmp_path / "B.vcf")
    _write_svc_vcf(b, ["B"], [
        ("chr1", 1, "ref", "DEL", 9999, [{"GT": "0", "CN": 2}]),
        ("chr1", 10500, "s1", "DEL", 29000, [{"GT": "1", "CN": 0}]),
        ("chr2", 5000, "s2", "DUP", 15000, [{"GT": "1", "CN": 4}]),
    ])
    text = open(b).read().replace("GT:CN", "GT:CN:QS").replace(
        "1:0", "1:0:80").replace("1:4", "1:4:99").replace("0:2", "0:2:60")
    open(b, "w").write(text)
    paths += ["-V", b]

    out = str(tmp_path / "joint.vcf")
    assert TOOL_REGISTRY["JointGermlineCNVSegmentation"](paths + ["-O", out]) == 0
    recs = list(vcfio.VcfReader(out))
    # one joint DEL (A defragmented 10000-30000 clustered with B 10500-29000),
    # one B-only DUP on chr2
    assert len(recs) == 2
    dele = next(r for r in recs if r.alts == ("<DEL>",))
    dup = next(r for r in recs if r.alts == ("<DUP>",))
    assert dele.info["AC"] == "2" and dele.info["AN"] == "2"
    gts = dict(zip(["A", "B"], dele.samples))
    assert gts["A"]["CN"] == "1" and gts["B"]["CN"] == "0"
    assert dup.info["AC"] == "1"
    gts = dict(zip(["A", "B"], dup.samples))
    assert gts["A"]["GT"] == "0" and gts["A"]["CN"] == "2"  # ref ploidy backfill
    assert gts["B"]["CN"] == "4"


def test_imprecise_deletion_from_read_pairs(tmp_path):
    """A deletion supported ONLY by discordant FR read pairs (no split reads,
    nothing to assemble) is called as an IMPRECISE <DEL> with CIPOS/CIEND
    (ImpreciseVariantDetector.java:20-49)."""
    import numpy as np

    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(11)
    ref_seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 12000))
    fa = tmp_path / "imp.fa"
    fa.write_text(f">chr1\n{ref_seq}\n")
    del_start, del_len = 5000, 2000  # deleted on the ALT genome

    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 12000, 0)],
                             read_groups=[{"ID": "rg", "SM": "s1"}])
    bam_path = str(tmp_path / "imp.bam")
    w = bamio.BamWriter(bam_path, header)
    reads = []
    L, frag = 100, 400

    def pair(name, pos1, pos2):
        """FR pair: forward at pos1, reverse mate at pos2 (ref coords)."""
        tlen = pos2 + L - pos1
        reads.append(Read(
            name=name, flag=0x1 | 0x2 | 0x20 | 0x40, ref_id=0, pos=pos1,
            mapq=60, cigar_ops=np.zeros(1, np.uint8),
            cigar_lens=np.array([L], np.int32),
            bases=np.frombuffer(ref_seq[pos1:pos1 + L].encode(), np.uint8).copy(),
            quals=np.full(L, 35, np.uint8), mate_ref_id=0, mate_pos=pos2,
            tlen=tlen))
        reads.append(Read(
            name=name, flag=0x1 | 0x2 | 0x10 | 0x80, ref_id=0, pos=pos2,
            mapq=60, cigar_ops=np.zeros(1, np.uint8),
            cigar_lens=np.array([L], np.int32),
            bases=np.frombuffer(ref_seq[pos2:pos2 + L].encode(), np.uint8).copy(),
            quals=np.full(L, 35, np.uint8), mate_ref_id=0, mate_pos=pos1,
            tlen=-tlen))

    # background proper pairs establishing the ~400bp fragment size
    for i in range(60):
        p = 100 + i * 60
        pair(f"bg{i}", p, p + frag - L)
    # 12 deletion-spanning pairs: forward just left of the deletion, mate just
    # right of it -> apparent fragment ~ frag + del_len
    for i in range(12):
        p = del_start - 250 + 5 * i
        pair(f"dp{i}", p, p + frag - L + del_len)
    for r in sorted(reads, key=lambda x: x.pos):
        w.write(r)
    w.close()

    out = str(tmp_path / "imp.vcf")
    rc = TOOL_REGISTRY["StructuralVariationDiscoveryPipelineSpark"](
        ["-I", bam_path, "-R", str(fa), "-O", out])
    assert rc == 0
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    imp = [r for r in recs if "IMPRECISE" in r[7]]
    assert imp, f"no imprecise DEL: {[(r[1], r[7]) for r in recs]}"
    info = dict(kv.split("=", 1) for kv in imp[0][7].split(";") if "=" in kv)
    assert "CIPOS" in info and "CIEND" in info
    assert int(info["READ_PAIR_SUPPORT"]) >= 8
    # called span roughly brackets the true deletion
    pos, end = int(imp[0][1]), int(info["END"])
    assert abs(pos - del_start) < 600 and abs(end - (del_start + del_len)) < 600


def test_external_evidence_integration(tmp_path):
    """--external-evidence intervals seed breakpoint clusters even without
    sufficient internal read evidence (ExternalEvidence,
    FindBreakpointEvidenceSpark.readExternalEvidence)."""
    import numpy as np

    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import bam as bamio, sam as samio
    from gatk_tpu.io.reads import Read

    rng = np.random.default_rng(4)
    ref_seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))
    fa = tmp_path / "r.fa"
    fa.write_text(f">chr1\n{ref_seq}\n")
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 4000, 0)],
                             read_groups=[{"ID": "rg", "SM": "s1"}])
    bam_path = str(tmp_path / "r.bam")
    w = bamio.BamWriter(bam_path, header)
    # plain well-behaved reads only: no internal breakpoint evidence
    for i in range(30):
        p = 1500 + 20 * i
        w.write(Read(name=f"r{i}", flag=0, ref_id=0, pos=p, mapq=60,
                     cigar_ops=np.zeros(1, np.uint8),
                     cigar_lens=np.array([120], np.int32),
                     bases=np.frombuffer(ref_seq[p:p + 120].encode(),
                                         np.uint8).copy(),
                     quals=np.full(120, 35, np.uint8)))
    w.close()
    ext = tmp_path / "ev.bed"
    ext.write_text("chr1\t1900\t1910\n")

    out = str(tmp_path / "contigs.bam")
    tsv = str(tmp_path / "links.tsv")
    rc = TOOL_REGISTRY["FindBreakpointEvidenceSpark"](
        ["-I", bam_path, "-R", str(fa), "-O", out,
         "--target-link-file", tsv])
    assert rc == 0
    assert "evidence_cluster" not in open(tsv).read()  # no internal evidence
    rc = TOOL_REGISTRY["FindBreakpointEvidenceSpark"](
        ["-I", bam_path, "-R", str(fa), "-O", out,
         "--target-link-file", tsv, "--external-evidence", str(ext)])
    assert rc == 0
    body = open(tsv).read()
    assert "evidence_cluster" in body and "chr1\t1906" in body
