"""VariantsToTable byte-identical goldens vs the reference's committed
expected tables (VariantsToTableIntegrationTest.java arg-for-arg)."""
import os

import pytest

D = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
     "tools/walkers/variantutils/VariantsToTable")
GG = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
      "tools/walkers/GenotypeGVCFs")
VQ = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
      "tools/VQSR/expected")

pytestmark = pytest.mark.skipif(not os.path.isdir(D),
                                reason="reference resources unavailable")

STD = ["-F", "CHROM", "-F", "POS", "-F", "ID", "-F", "REF", "-F", "ALT",
       "-F", "QUAL"]
COMPLEX = ([f"{D}/soap_gatk_annotated.noChr_lines.vcf"] + STD +
           ["-F", "FILTER", "-F", "TRANSITION", "-F", "DP", "-F", "SB",
            "-F", "set", "-F", "RankSumP", "-F", "refseq.functionalClass*"])
MULTI = ([f"{D}/multiallelic.vcf"] + STD +
         ["-F", "MULTI-ALLELIC", "-F", "AC", "-F", "AF"])

CASES = [
    # testComplexVariantsToTable
    (COMPLEX, "expected.soap_gatk_annotated.noChr_lines.table"),
    # testMultiAllelicToTable
    (MULTI, "expected.multiallelic.table"),
    # testMultiAllelicToTableSplit
    (MULTI + ["-SMA"], "expected.multiallelic.SMA.table"),
    # testNoSamples (std + TRANSITION + EVENTLENGTH, no genotype fields)
    ([f"{D}/vcfexample.noSamples.vcf"] + STD +
     ["-F", "FILTER", "-F", "TRANSITION", "-F", "EVENTLENGTH"],
     "expected.vcfexample.noSamples.table"),
    # testGenotypeFields
    ([f"{D}/vcfexample2.vcf", "-GF", "RD"], "expected.vcfexample2.GF_RD.table"),
    # testUnfilteredGenotypeFields (FT on unfiltered genotypes -> NA)
    ([f"{D}/vcfexample2.vcf", "-GF", "RD", "-GF", "FT"],
     "expected.vcfexample2.GF_RD.FT.table"),
    # testGenotypeFieldsWithInline (GT as bases, GQ)
    ([f"{D}/vcfexample2.vcf", "-GF", "RD", "-GF", "GT", "-GF", "GQ"],
     "expected.vcfexample2.GF_RD.GF_GT.GF_GT.table"),
    # testMultiallelicGenotypeFields (SMA with plain GFs repeats raw values)
    ([f"{D}/multiallelic_gt.vcf"] + STD +
     ["-F", "MULTI-ALLELIC", "-GF", "PL", "-GF", "AD", "-SMA"],
     "expected.multiallelic_gt.table"),
    # testListFields
    ([f"{D}/vcfexample.withMLE.vcf", "-GF", "PL"],
     "expected.vcfexample.withMLE.GF_PL.table"),
    # testSplitMultiallelicFields (A/R-type FORMAT annotations)
    ([f"{GG}/threeSamples.2alts.vcf", "-SMA", "-F", "CHROM", "-F", "POS",
      "-F", "REF", "-F", "ALT", "-F", "FOO", "-ASF", "TLOD",
      "-ASGF", "TLOD", "-ASGF", "AD", "-ASGF", "MMQ", "-ASGF", "BAR",
      "-raw"],
     "expected.threeSamples.2alts.MT.txt"),
    ([f"{GG}/threeSamples.2alts.vcf", "-F", "CHROM", "-F", "POS",
      "-F", "REF", "-F", "ALT", "-ASGF", "TLOD", "-ASGF", "AD",
      "-ASGF", "MMQ", "-raw"],
     "expected.threeSamples.2alts.MT.noSplit.txt"),
    # testSplitMultiallelicFields spec4: AS-indel VQSR output as input
    ([f"{VQ}/applyIndelAlleleSpecificResult.vcf", "-SMA",
      "-F", "CHROM", "-F", "POS", "-F", "REF", "-F", "ALT",
      "-ASF", "AS_BaseQRankSum", "-ASGF", "AD", "-raw",
      "-ASF", "AS_FilterStatus"],
     "expected.ASindelVQSR.txt"),
    # testMoltenOutput
    ([f"{D}/vcfexample2.vcf"] + STD + ["-F", "FILTER", "--moltenize"],
     "expected.vcfexample2.moltenize.table"),
    # testMoltenOutputWithGenotypeFields
    ([f"{D}/vcfexample2.vcf", "-GF", "RD", "--moltenize"],
     "expected.vcfexample2.GF_RD.moltenize.table"),
    # testMoltenOutputWithMultipleAlleles
    (MULTI + ["--moltenize", "-SMA"],
     "expected.multiallelic.moltenize.SMA.table"),
    # testNoFieldsSpecified (defaults to all header fields)
    ([f"{D}/VCFWithoutGenotypes_dbsnp_138.snippet.vcf"],
     "expected.noFieldsSpecifiedNoSamples.table"),
    ([f"{D}/VCFWithGenotypes_1000G.phase3.snippet.vcf"],
     "expected.noFieldsSpecifiedWithSamples.table"),
]


@pytest.mark.parametrize("case", range(len(CASES)),
                         ids=[CASES[i][1] for i in range(len(CASES))])
def test_variants_to_table_golden(tmp_path, case):
    args, expected = CASES[case]
    inp = args[0]
    if not os.path.exists(inp):
        pytest.skip(f"{inp} missing")
    from gatk_tpu.tools.analysis_tools import variants_to_table

    out = tmp_path / "out.table"
    variants_to_table(["-V"] + args + ["-O", str(out)])
    got = out.read_text().rstrip("\n").splitlines()
    exp = open(f"{D}/{expected}").read().rstrip("\n").splitlines()
    assert len(got) == len(exp), (len(got), len(exp), got[:2], exp[:2])
    for i, (g, e) in enumerate(zip(got, exp)):
        assert g == e, (expected, i, g, e)
