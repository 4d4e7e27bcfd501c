"""Analysis-tool tests (Concordance, LeftAlign, VariantsToTable, filters)."""
import os

import pytest

from gatk_tpu.io import vcf
from gatk_tpu.utils.testdata import reference_path

MITO = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito")
needs_ref = pytest.mark.skipif(not os.path.isdir(MITO), reason="reference data missing")


def _write_vcf(path, rows, samples=()):
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        cols = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
        if samples:
            cols += "\tFORMAT\t" + "\t".join(samples)
        fh.write(cols + "\n")
        for r in rows:
            fh.write(r + "\n")


def test_concordance_counts(tmp_path):
    from gatk_tpu.tools.analysis_tools import concordance

    ev = str(tmp_path / "eval.vcf")
    tr = str(tmp_path / "truth.vcf")
    _write_vcf(ev, ["1\t100\t.\tA\tC\t50\tPASS\t.",
                    "1\t200\t.\tG\tT\t50\tPASS\t.",
                    "1\t300\t.\tT\tTA\t50\tPASS\t."])
    _write_vcf(tr, ["1\t100\t.\tA\tC\t50\tPASS\t.",
                    "1\t400\t.\tC\tG\t50\tPASS\t."])
    out = str(tmp_path / "summary.tsv")
    concordance(["-eval", ev, "--truth", tr, "--summary", out])
    lines = open(out).read().splitlines()
    assert lines[1].split("\t")[:4] == ["SNP", "1", "1", "1"]
    assert lines[2].split("\t")[:4] == ["INDEL", "0", "1", "0"]


def test_left_align_variant():
    from gatk_tpu.tools.analysis_tools import left_align_variant

    ref_seq = "GGGCAAAAT"  # 0-based positions

    def fetch(contig, pos):
        return ref_seq[pos]

    # A-homopolymer insertion at the right edge shifts left to the anchor C
    v = vcf.Variant(contig="1", pos=7, ref="A", alts=("AA",))
    left_align_variant(v, fetch)
    assert (v.pos, v.ref, v.alts) == (3, "C", ("CA",))
    # deletion likewise
    v = vcf.Variant(contig="1", pos=6, ref="AA", alts=("A",))
    left_align_variant(v, fetch)
    assert (v.pos, v.ref, v.alts) == (3, "CA", ("C",))
    # SNP untouched
    v = vcf.Variant(contig="1", pos=5, ref="A", alts=("T",))
    left_align_variant(v, fetch)
    assert (v.pos, v.ref, v.alts) == (5, "A", ("T",))


def test_variants_to_table(tmp_path):
    from gatk_tpu.tools.analysis_tools import variants_to_table

    vin = str(tmp_path / "in.vcf")
    _write_vcf(vin, ["1\t100\t.\tA\tC\t50\tPASS\tDP=10\tGT:AF\t0/1:0.42"], samples=("S",))
    out = str(tmp_path / "t.tsv")
    variants_to_table(["-V", vin, "-F", "CHROM", "-F", "POS", "-F", "DP",
                       "-GF", "AF", "-O", out])
    lines = open(out).read().splitlines()
    assert lines[0] == "CHROM\tPOS\tDP\tS.AF"
    assert lines[1] == "1\t100\t10\t0.42"


def test_filter_expression_eval():
    from gatk_tpu.tools.variant_tools import _eval_filter_expression

    v = vcf.Variant(contig="1", pos=1, ref="A", alts=("C",), info={"QD": "1.5", "FS": "80"})
    assert _eval_filter_expression("QD < 2.0", v)
    assert not _eval_filter_expression("QD > 2.0", v)
    assert _eval_filter_expression("QD < 2.0 && FS > 60.0", v)
    assert _eval_filter_expression("QD > 2.0 || FS > 60.0", v)
