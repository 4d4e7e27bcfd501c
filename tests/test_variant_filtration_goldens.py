"""VariantFiltration goldens vs the reference's committed expected outputs
(VariantFiltrationIntegrationTest.java arg-for-arg; trimmed data-line
comparison like IntegrationTestSpec)."""
import os

import pytest

S = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
     "tools/walkers/filters/VariantFiltration")

pytestmark = pytest.mark.skipif(not os.path.isdir(S),
                                reason="reference resources unavailable")

V2 = f"{S}/vcfexample2.vcf"
DPF = f"{S}/filteringDepthInFormat.vcf"

CASES = [
    ("testNoAction", [V2]),
    ("testClusteredSnps", [V2, "-cluster-window-size", "10"]),
    ("testMask1", [V2, "-mask-name", "foo", "--mask", V2]),
    ("testMask2", [V2, "-mask-name", "foo", "--mask", f"{S}/vcfMask.vcf"]),
    ("testMask3",
     [V2, "-mask-name", "foo", "--mask-extension", "10", "--mask",
      f"{S}/vcfMask.vcf"]),
    ("testMask4",
     [V2, "-mask-name", "foo", "--apply-allele-specific-filters", "--mask",
      f"{S}/vcfMask.vcf"]),
    ("testMaskWithFilters1",
     [f"{S}/filtered.vcf", "-mask-name", "blacklisted_site",
      "--apply-allele-specific-filters", "--mask",
      f"{S}/blacklistedMask.bed"]),
    ("testMaskWithFilters2",
     [f"{S}/filtered.vcf", "-mask-name", "blacklisted_site",
      "--invalidate-previous-filters", "--apply-allele-specific-filters",
      "--mask", f"{S}/blacklistedMask.bed"]),
    ("testMaskReversed",
     [V2, "-mask-name", "outsideGoodSites", "-filter-not-in-mask",
      "--mask", f"{S}/goodMask.bed"]),
    ("testFilter1",
     [V2, "-filter", "DoC < 20 || FisherStrand > 20.0", "-filter-name",
      "foo"]),
    ("testFilter2",
     [V2, "-filter", "AlleleBalance < 70.0 && FisherStrand == 1.4",
      "-filter-name", "bar"]),
    ("testFilterWithSeparateNames",
     [V2, "-filter-name", "ABF", "-filter", "AlleleBalance < 0.7",
      "-filter-name", "FSF", "-filter", "FisherStrand == 1.4"]),
    ("testInvertFilter",
     [V2, "-filter-name", "ABF", "-filter", "AlleleBalance < 0.7",
      "-filter-name", "FSF", "-filter", "FisherStrand == 1.4",
      "--invert-filter-expression"]),
    ("testInvertJexlFilter",
     [V2, "-filter-name", "ABF", "-filter", "AlleleBalance >= 0.7",
      "-filter-name", "FSF", "-filter", "FisherStrand != 1.4"]),
    ("testGenotypeFilters1",
     [V2, "-G-filter", "GQ == 0.60", "-G-filter-name", "foo"]),
    ("testGenotypeFilters2",
     [V2, "-G-filter", "isHomVar == 1", "-G-filter-name", "foo"]),
    ("testDeletions",
     [f"{S}/twoDeletions.vcf", "-filter", "QUAL < 100", "-filter-name",
      "foo"]),
    ("testUnfilteredBecomesFilteredAndPass",
     [f"{S}/unfilteredForFiltering.vcf", "-filter", "FS > 60.0",
      "-filter-name", "SNP_FS"]),
    ("testFilteringDPfromINFO",
     [DPF, "-filter", "DP < 8", "-filter-name", "lowDP"]),
    ("testFilteringDPfromFORMAT",
     [DPF, "--genotype-filter-expression", "DP < 8",
      "--genotype-filter-name", "lowDP"]),
    ("testInvertJexlGenotypeFilterExpression",
     [DPF, "--genotype-filter-expression", "DP >= 8",
      "--genotype-filter-name", "highDP"]),
    ("testSetFilteredGtoNocall",
     [DPF, "--genotype-filter-expression", "DP < 8",
      "--genotype-filter-name", "lowDP",
      "--set-filtered-genotype-to-no-call"]),
    ("testSetFilteredGtoNocallUpdateInfo",
     [f"{S}/variantFiltrationInfoField.vcf", "-G-filter", "GQ < 20",
      "-G-filter-name", "lowDP", "-G-filter", "DP < 10", "-G-filter-name",
      "lowGQ", "--set-filtered-genotype-to-no-call"]),
    ("testSetVcfFilteredGtoNocall",
     [f"{S}/filteredSamples.vcf", "--set-filtered-genotype-to-no-call"]),
]


def _lines(path):
    return [line.strip() for line in open(path)
            if not line.startswith("##")]


@pytest.mark.parametrize("case", range(len(CASES)),
                         ids=[c[0] for c in CASES])
def test_variant_filtration_golden(tmp_path, case):
    name, args = CASES[case]
    expected = f"{S}/expected/testVariantFiltration_{name}.vcf"
    if not os.path.exists(expected):
        pytest.skip(f"{expected} missing")
    from gatk_tpu.tools.variant_filtration import variant_filtration

    out = tmp_path / "out.vcf"
    variant_filtration(["-V"] + args + ["-O", str(out)])
    got, exp = _lines(str(out)), _lines(expected)
    assert len(got) == len(exp), (name, len(got), len(exp))
    for i, (g, e) in enumerate(zip(got, exp)):
        assert g == e, (name, i, g, e)
