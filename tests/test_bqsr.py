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


def test_optical_duplicates_and_metrics():
    """Optical-duplicate detection: duplicate-set members within the pixel
    distance on the same tile are optical (OpticalDuplicateFinder); metrics
    follow picard DuplicationMetrics incl. ESTIMATED_LIBRARY_SIZE."""
    import numpy as np

    from gatk_tpu.io import sam as samio
    from gatk_tpu.io.reads import Read
    from gatk_tpu.preprocessing import markdup

    def mk_pair(name, pos1, pos2, q=30):
        ops = np.array([0], np.uint8)
        lens = np.array([10], np.int32)
        bases = np.frombuffer(b"ACGTACGTAC", np.uint8)
        quals = np.full(10, q, np.uint8)
        r1 = Read(name=name, flag=0x1 | 0x40 | 0x20, ref_id=0, pos=pos1, mapq=60,
                  cigar_ops=ops.copy(), cigar_lens=lens.copy(), bases=bases,
                  quals=quals.copy(), mate_ref_id=0, mate_pos=pos2, tlen=pos2 - pos1 + 10,
                  tags={"RG": "rg1"})
        r2 = Read(name=name, flag=0x1 | 0x80 | 0x10, ref_id=0, pos=pos2, mapq=60,
                  cigar_ops=ops.copy(), cigar_lens=lens.copy(), bases=bases,
                  quals=quals.copy(), mate_ref_id=0, mate_pos=pos1, tlen=-(pos2 - pos1 + 10),
                  tags={"RG": "rg1"})
        return [r1, r2]

    header = samio.SamHeader.parse(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:10000\n"
        "@RG\tID:rg1\tSM:S\tLB:lib1\n")
    # 4 duplicate pairs at the same coordinates:
    #  A: tile 5 at (1000, 1000)  -- best score will be tuned below
    #  B: tile 5 at (1050, 1050)  -- optical vs A (within 100px)
    #  C: tile 5 at (5000, 5000)  -- same tile, far away -> library duplicate
    #  D: tile 7 at (1000, 1000)  -- different tile -> library duplicate
    reads = []
    reads += mk_pair("M:1:FC:1:5:1000:1000", 100, 300, q=40)  # A (best)
    reads += mk_pair("M:1:FC:1:5:1050:1050", 100, 300, q=30)  # B optical
    reads += mk_pair("M:1:FC:1:5:5000:5000", 100, 300, q=30)  # C
    reads += mk_pair("M:1:FC:1:7:1000:1000", 100, 300, q=30)  # D
    # one unique pair elsewhere
    reads += mk_pair("M:1:FC:1:9:2000:2000", 2000, 2400, q=30)

    n_dup, non_dup = markdup.mark_duplicates(reads, header)
    assert n_dup == 6  # 3 duplicate pairs x 2 reads
    assert "M:1:FC:1:5:1000:1000" in non_dup

    metrics = markdup.collect_duplication_metrics(reads, header)
    m = metrics["lib1"]
    assert m["READ_PAIRS_EXAMINED"] == 5
    assert m["READ_PAIR_DUPLICATES"] == 3
    assert m["READ_PAIR_OPTICAL_DUPLICATES"] == 1  # only B is optical
    assert abs(m["PERCENT_DUPLICATION"] - 0.6) < 1e-9
    # library size from (pairs - optical)=4, unique=2: picard bisection
    assert m["ESTIMATED_LIBRARY_SIZE"] == markdup.estimate_library_size(4, 2)
    assert m["ESTIMATED_LIBRARY_SIZE"] is not None


def test_estimate_library_size_formula():
    from gatk_tpu.preprocessing import markdup

    # closed-form checks: no duplicates -> None; all duplicates -> small library
    assert markdup.estimate_library_size(100, 100) is None
    L = markdup.estimate_library_size(1000, 900)
    # solve c/x - 1 + exp(-n/x) = 0 numerically for c=900, n=1000
    import math

    x = L
    assert abs(900 / x - 1 + math.exp(-1000 / x)) < 1e-2
    # more duplication -> smaller library
    assert markdup.estimate_library_size(1000, 500) < L
