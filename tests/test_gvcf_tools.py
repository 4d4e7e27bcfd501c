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
