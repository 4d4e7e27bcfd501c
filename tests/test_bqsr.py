"""BQSR golden tests vs reference-bundled expected outputs (chr17 69k-70k set)."""
import gzip
import os

import numpy as np
import pytest

from gatk_tpu.io import bam
from gatk_tpu.recal import covariates as cov
from gatk_tpu.recal.report import quantize_quals
from gatk_tpu.utils.testdata import reference_path

BQSR_DIR = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/BQSR")
CHR17_REF = reference_path("src/test/resources/human_g1k_v37.chr17_1Mb.fasta")
CHR17_BAM = os.path.join(BQSR_DIR, "NA12878.chr17_69k_70k.dictFix.bam")
CHR17_DBSNP = os.path.join(BQSR_DIR, "dbsnp_132.b37.excluding_sites_after_129.chr17_69k_70k.vcf")

needs_ref = pytest.mark.skipif(not os.path.exists(CHR17_BAM), reason="reference data missing")


def test_context_key_roundtrip():
    for s in ("AC", "TTT", "ACGT"):
        assert cov.context_from_key(cov.key_from_context(s)) == s
    assert cov.key_from_context("AN") == -1


def test_context_keys_vs_scalar():
    rng = np.random.default_rng(0)
    bases = rng.choice(list(b"ACGTN"), 40, p=[0.24, 0.24, 0.24, 0.24, 0.04]).astype(np.uint8)
    keys = cov.context_keys(bases, 3)
    s = bases.tobytes().decode()
    for i in range(len(s)):
        if i < 2:
            assert keys[i] == -1
        else:
            assert keys[i] == cov.key_from_context(s[i - 2 : i + 1])


def test_cycle_keys_signs():
    # forward first-of-pair: cycles 1..n
    k = cov.cycle_keys(5, False, False, False)
    assert [cov.cycle_from_key(x) for x in k] == [1, 2, 3, 4, 5]
    # reverse second-of-pair: cycles -n..-1 ascending offset
    k = cov.cycle_keys(5, True, True, False)
    assert [cov.cycle_from_key(x) for x in k] == [-5, -4, -3, -2, -1]
    # indel cushion masks 4 bases each end
    k = cov.cycle_keys(10, False, False, True)
    assert (k[:4] == -1).all() and (k[-4:] == -1).all() and (k[4:6] >= 0).all()


def test_quantizer_identityish():
    hist = [0] * 94
    hist[30] = 1000
    hist[40] = 500
    m = quantize_quals(hist, 16)
    assert m[30] == 30 and m[40] == 40


@needs_ref
def test_base_recalibrator_matches_gatk_golden(tmp_path):
    """Byte-identical recal table vs GATK's expected.NA12878.chr17_69k_70k.txt
    (BaseRecalibratorIntegrationTest row :91, args '-indels --enable-baq')."""
    from gatk_tpu.tools.bqsr_tools import base_recalibrator

    out = str(tmp_path / "recal.txt")
    base_recalibrator([
        "-I", CHR17_BAM, "-R", CHR17_REF, "--known-sites", CHR17_DBSNP,
        "--enable-baq", "-O", out,
    ])
    with open(out) as fh, open(os.path.join(BQSR_DIR, "expected.NA12878.chr17_69k_70k.txt")) as eh:
        assert fh.read() == eh.read()


@needs_ref
def test_apply_bqsr_matches_gatk_golden(tmp_path):
    """Recalibrated quals identical to expected...recalibrated.DIQ.bam
    (ApplyBQSRIntegrationTest row :76)."""
    from gatk_tpu.tools.bqsr_tools import apply_bqsr

    table = str(tmp_path / "t.table")
    with gzip.open(os.path.join(BQSR_DIR, "HiSeq.20mb.1RG.table.gz"), "rt") as fh:
        open(table, "w").write(fh.read())
    out = str(tmp_path / "out.bam")
    apply_bqsr([
        "-I", os.path.join(BQSR_DIR, "HiSeq.1mb.1RG.2k_lines.alternate.bam"),
        "--bqsr-recal-file", table, "-O", out,
    ])
    exp = list(bam.BamReader(os.path.join(
        BQSR_DIR, "expected.HiSeq.1mb.1RG.2k_lines.alternate.recalibrated.DIQ.bam")))
    got = list(bam.BamReader(out))
    assert len(exp) == len(got)
    for e, g in zip(exp, got):
        assert e.name == g.name
        assert np.array_equal(e.quals, g.quals), e.name


MD_DIR = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/walkers/MarkDuplicatesGATK")
needs_md = pytest.mark.skipif(not os.path.isdir(MD_DIR), reason="reference data missing")


def _dup_flags(path):
    from gatk_tpu.io import sam

    return {
        (r.name, r.flag & ~sam.DUPLICATE, r.pos): bool(r.flag & sam.DUPLICATE)
        for r in bam.BamReader(path)
    }


@needs_md
@pytest.mark.parametrize("name,expected", [
    ("example.chr1.1-1K.unmarkedDups", "example.chr1.1-1K.markedDups"),
    ("mdOrderBug", "expected.mdOrderBug"),
    ("mdOrderBug2", "expected.mdOrderBug2"),
])
def test_mark_duplicates_matches_gatk(tmp_path, name, expected):
    """Duplicate flags identical to MarkDuplicatesSpark's expected outputs
    (MarkDuplicatesSparkUnitTest :27-29)."""
    from gatk_tpu.tools.bqsr_tools import mark_duplicates_tool

    out = str(tmp_path / "md.bam")
    mark_duplicates_tool(["-I", os.path.join(MD_DIR, name + ".bam"), "-O", out])
    exp = _dup_flags(os.path.join(MD_DIR, expected + ".bam"))
    got = _dup_flags(out)
    assert exp == got


def test_gather_bqsr_reports_golden(tmp_path):
    """GatherBQSRReports vs the reference's gatk4_combined golden: identical up
    to EmpiricalQuality MAP ties flipped by HotSpot's log10-intrinsic ulp noise
    (<0.2% of rows, +/-1 qual)."""
    import gzip
    import subprocess
    import sys

    d = reference_path("src/test/resources/org/broadinstitute/hellbender/utils/recalibration")
    out = str(tmp_path / "gathered.tbl")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "GatherBQSRReports",
                        "-I", f"{d}/gatk4_chr20.tbl.gz", "-I", f"{d}/gatk4_chr21.tbl.gz",
                        "-O", out], capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    got = open(out).read().splitlines()
    exp = gzip.open(f"{d}/gatk4_combined.tbl.gz", "rt").read().splitlines()
    assert len(got) == len(exp)
    n_diff = 0
    for g, e in zip(got, exp):
        if g == e:
            continue
        n_diff += 1
        gf, ef = g.split(), e.split()
        # only the EmpiricalQuality (or Quantized count/level) field may differ
        diffs = [i for i, (a, b) in enumerate(zip(gf, ef)) if a != b]
        assert len(diffs) <= 2, (g, e)
        for i in diffs:
            # EmpiricalQuality ties move by 1; Quantized counts shift by the
            # observations of the flipped rows (allow 10% relative)
            assert abs(float(gf[i]) - float(ef[i])) <= max(1.0, 0.1 * abs(float(ef[i]))), (g, e)
    assert n_diff <= 0.002 * len(exp), n_diff
