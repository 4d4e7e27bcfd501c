"""Pluggable annotation engine + VariantAnnotator tool tests
(calling/annotations.py vs walkers/annotator/*.java)."""
import numpy as np
import pytest

from gatk_tpu.calling.annotations import (ANNOTATION_REGISTRY, STANDARD_SET,
                                          VariantAnnotatorEngine,
                                          read_offset_at)
from gatk_tpu.io.reads import Read
from gatk_tpu.io.vcf import Variant
from gatk_tpu.utils.errors import UserError

MITO = "/root/reference/src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito"


def _read(pos, base, rev=False, mapq=60, n=20, tlen=200):
    b = np.full(n, ord("A"), np.uint8)
    b[10] = ord(base)
    return Read(name=f"r{pos}{base}{rev}", flag=0x10 if rev else 0, ref_id=0,
                pos=pos, mapq=mapq, cigar_ops=np.array([0], np.uint8),
                cigar_lens=np.array([n], np.int32), bases=b,
                quals=np.full(n, 30, np.uint8), tlen=tlen)


def test_engine_standard_set_plus_extras():
    v = Variant("chr1", 110, "A", ("G",),
                samples=[{"GT": "0/1", "GQ": "50", "PL": "50,0,60"}])
    reads = [_read(100, "A"), _read(100, "G"), _read(100, "G", rev=True),
             _read(100, "A", rev=True), _read(100, "G", mapq=0)]
    eng = VariantAnnotatorEngine(
        STANDARD_SET,
        extra=("MappingQualityZero", "BaseQuality", "FragmentLength",
               "ReadPosition", "UniqueAltReadCount", "StrandBiasBySample"))
    info = eng.annotate(v, reads)
    assert info["DP"] == "5"
    assert info["MQ0"] == "1"
    assert info["AC"] == "1" and info["AN"] == "2" and info["AF"] == "0.500"
    assert info["SB_TABLE"] == "1,1,2,1"
    assert info["MBQ"] == "30,30"
    assert info["MPOS"] == "9"
    assert "FS" in info and "SOR" in info and "MQ" in info
    with pytest.raises(UserError):
        VariantAnnotatorEngine(("NoSuchAnnotation",))


def test_read_classification_snp_and_offsets():
    v = Variant("chr1", 110, "A", ("G",))
    eng = VariantAnnotatorEngine(("Coverage",))
    reads = [_read(100, "A"), _read(100, "G"), _read(200, "G")]
    # read at 200 does not cover the site
    cls = eng.classify_reads(v, reads)
    assert cls.tolist() == [0, 1, -1]
    assert read_offset_at(reads[0], 110) == 10
    assert read_offset_at(reads[2], 110) is None


def test_tandem_repeat_annotation(tmp_path):
    from gatk_tpu.io.fasta import FastaReference

    fa = tmp_path / "r.fa"
    fa.write_text(">chr1\n" + "GGGGGGGGGG" + "ACACACACAC" + "G" * 40 + "\n")
    ref = FastaReference(str(fa))
    # deletion of one AC unit at pos 9 (0-based): ref="GAC" alt="G"
    v = Variant("chr1", 9, "GAC", ("G",))
    eng = VariantAnnotatorEngine(("TandemRepeat",))
    info = eng.annotate(v, [], ref)
    assert info["RU"] == "AC"
    assert info["RPA"] == "5,4"


def test_variant_annotator_tool_on_mito(tmp_path):
    import os

    from gatk_tpu.cli import TOOL_REGISTRY
    from gatk_tpu.io import vcf as vcfio

    if not os.path.exists(f"{MITO}/NA12878.bam"):
        pytest.skip("mito data unavailable")
    src = tmp_path / "in.vcf"
    with open(src, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA12878\n")
        fh.write("chrM\t152\t.\tT\tC\t50\tPASS\t.\tGT\t0/1\n")
        fh.write("chrM\t263\t.\tA\tG\t50\tPASS\t.\tGT\t1/1\n")
    out = tmp_path / "out.vcf"
    rc = TOOL_REGISTRY["VariantAnnotator"]([
        "-V", str(src), "-I", f"{MITO}/NA12878.bam",
        "-R", f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta",
        "-O", str(out), "-A", "MappingQualityZero", "-A", "UniqueAltReadCount"])
    assert rc == 0
    recs = list(vcfio.VcfReader(str(out)))
    assert len(recs) == 2
    for r in recs:
        assert int(r.info["DP"]) > 100       # deep mito coverage
        assert "MQ" in r.info and "FS" in r.info
        assert "MQ0" in r.info and "UNIQ_ALT_READ_COUNT" in r.info
    # site 152 is a real het/hom alt: most reads support C
    assert int(recs[0].info["UNIQ_ALT_READ_COUNT"]) > 50


def test_qual_by_depth_and_excess_het():
    v = Variant("chr1", 110, "A", ("G",), qual=250.0,
                samples=[{"GT": "0/1", "AD": "10,15", "DP": "25"}])
    eng = VariantAnnotatorEngine(("QualByDepth", "ExcessHet"))
    info = eng.annotate(v, genotypes={"s1": {"GT": "0/1", "AD": "10,15", "DP": "25"},
                                      "s2": {"GT": "0/0", "DP": "30"},
                                      "s3": {"GT": "1/1", "AD": "0,20"}})
    # depth counts only variant genotypes: s1 AD 25 + s3 AD 20 = 45
    assert info["QD"] == f"{250.0/45:.2f}"
    assert "ExcessHet" in info
    # all-hom callset: het excess is maximally non-significant (phred ~ >0)
    info2 = eng.annotate(v, genotypes={f"s{i}": {"GT": "1/1", "AD": "0,20"}
                                       for i in range(4)})
    assert float(info2["ExcessHet"]) <= 0.01


def test_mmq_possd_bqhist():
    v = Variant("chr1", 110, "A", ("G",))
    reads = [_read(100, "A", mapq=60), _read(100, "G", mapq=20),
             _read(100, "G", mapq=40), _read(100, "A", mapq=50)]
    eng = VariantAnnotatorEngine(("MappingQuality", "ReadPositionSD",
                                  "BaseQualityHistogram"))
    info = eng.annotate(v, reads)
    assert info["MMQ"] == "55,30"  # median ref (50,60)=55, alt (20,40)=30
    assert info["POSSD"] == "0"    # both alt reads at distance 9: MAD 0
    # BQHIST: all quals are 30 -> one bucket with 2 ref / 2 alt
    assert info["BQHIST"] == "30,2,2"


def test_format_annotations_ad_dp_af_fad_orientation():
    v = Variant("chr1", 110, "A", ("G",))
    r1, r2 = _read(100, "G"), _read(100, "G", rev=True)
    r2.name = r1.name  # same fragment, consistent alt vote
    r3 = _read(100, "A")
    r1.flag |= 0x40  # first of pair, forward -> F1R2
    eng = VariantAnnotatorEngine(("DepthPerAlleleBySample", "DepthPerSampleHC",
                                  "AlleleFraction", "FragmentDepthPerAlleleBySample",
                                  "OrientationBiasReadCounts", "AllelePseudoDepth"))
    info, fmt = eng.annotate_split(v, [r1, r2, r3])
    assert fmt["AD"] == "1,2"
    assert fmt["DP"] == "3"
    assert fmt["AF"] == "0.667"
    assert fmt["FAD"] == "1,1"  # fragment-level: r1+r2 collapse to one alt vote
    f1r2 = [int(x) for x in fmt["F1R2"].split(",")]
    f2r1 = [int(x) for x in fmt["F2R1"].split(",")]
    assert sum(f1r2) + sum(f2r1) == 2  # two fragments pass quality gates
    assert fmt["DD"] == "1,2"


def test_pedigree_annotations():
    v = Variant("chr1", 110, "A", ("G",))
    gts = {"mom": {"GT": "0/0", "GQ": "60", "DP": "30"},
           "dad": {"GT": "0/0", "GQ": "60", "DP": "30"},
           "kid": {"GT": "0/1", "GQ": "60", "DP": "30"}}
    eng = VariantAnnotatorEngine(("PossibleDeNovo", "RawGtCount"))
    info = eng.annotate(v, genotypes=gts, trios=[("mom", "dad", "kid")])
    assert info["hiConfDeNovo"] == "kid"
    assert info["RAW_GT_COUNT"] == ".,1,0"
    # transmitted singleton: AC==2 het parent + het child
    gts2 = {"mom": {"GT": "0/1", "GQ": "60", "DP": "30"},
            "dad": {"GT": "0/0", "GQ": "60", "DP": "30"},
            "kid": {"GT": "0/1", "GQ": "60", "DP": "30"}}
    eng2 = VariantAnnotatorEngine(("TransmittedSingleton",))
    info2 = eng2.annotate(v, genotypes=gts2, trios=[("mom", "dad", "kid")])
    assert info2["transmittedSingleton"] == "mom"


def test_flow_annotations(tmp_path):
    from gatk_tpu.io.fasta import FastaReference

    fa = tmp_path / "r.fa"
    #            0         1         2         3
    #            0123456789012345678901234567890123456789
    seq =       "ACGTACGTACGTAAAAACGTACGTACGTACGTACGTACGT"
    fa.write_text(">chr1\n" + seq + "\n")
    ref = FastaReference(str(fa))
    eng = VariantAnnotatorEngine(("IndelClassify", "IndelLength", "HmerIndelLength",
                                  "HmerIndelNuc", "GcContent", "CycleSkipStatus",
                                  "VariantType", "HmerMotifs"))
    # hmer indel: insert an extra A into the AAAAA run at pos 12-16
    v = Variant("chr1", 11, "TA", ("T",))  # deletes one A of the hmer
    info = eng.annotate(v, reference=ref)
    assert info["X_IC"] == "del"
    assert info["X_IL"] == "1"
    assert info["X_HIL"] == "5" and info["X_HIN"] == "A"
    assert info["VARIANT_TYPE"] == "h-indel"
    assert "X_LM" in info and "X_RM" in info
    # SNP at pos 20 (C>G)
    v2 = Variant("chr1", 20, "C", ("G",))
    info2 = eng.annotate(v2, reference=ref)
    assert info2["X_IC"] == "NA"
    assert info2["VARIANT_TYPE"] == "snp"
    assert info2["X_CSS"] in ("cycle-skip", "possible-cycle-skip", "non-skip")
    assert float(info2["X_GCC"]) == pytest.approx(0.5, abs=0.21)


def test_assembly_complexity_and_hap_filtering():
    from gatk_tpu.calling.annotations import AnnotationContext

    class Ev:
        def __init__(self, start, ref, alt):
            self.start, self.ref, self.alt = start, ref, alt

        def __hash__(self):
            return hash((self.start, self.ref, self.alt))

        def __eq__(self, o):
            return (self.start, self.ref, self.alt) == (o.start, o.ref, o.alt)

    class Hap:
        def __init__(self, bases, events):
            self.bases, self.events = bases, events

    v = Variant("chr1", 110, "A", ("G",))
    h_ref = Hap(b"AAAA", [])
    h_alt = Hap(b"AAGA", [Ev(110, "A", "G")])
    h_alt2 = Hap(b"CAGA", [Ev(110, "A", "G"), Ev(100, "A", "C")])
    eng = VariantAnnotatorEngine(("AssemblyComplexity", "HaplotypeFilteringAnnotation"))
    ctx_kwargs = dict(haplotypes=[h_ref, h_alt, h_alt2],
                      haplotype_support=np.array([10, 6, 2]),
                      n_filtered_haplotypes=1)
    ctx = AnnotationContext(v, **ctx_kwargs)
    info = {}
    for a in eng.annotations:
        info.update(a.annotate(ctx))
    assert info["HEC"] == "16,2"  # ref+alt share empty signature (10+6), alt2=2
    assert info["HAPCOMP"] == "0"  # best alt hap == germline-adjacent (0 edits)
    assert info["HAPDOM"] == "0.750"  # 6/(6+2)
    assert info["ASSEMBLED_HAPS"] == "3" and info["FILTERED_HAPS"] == "1"


def test_annotation_groups_expand():
    eng = VariantAnnotatorEngine(("StandardHCAnnotation",))
    names = {type(a).__name__ for a in eng.annotations}
    assert "QualByDepth" in names and "Coverage" in names
    eng2 = VariantAnnotatorEngine(("StandardFlowBasedAnnotation",))
    assert len(eng2.annotations) == 8
