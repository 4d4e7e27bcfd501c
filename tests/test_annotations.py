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
