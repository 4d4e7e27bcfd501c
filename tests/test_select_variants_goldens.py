"""SelectVariants goldens vs the reference's committed expected outputs
(SelectVariantsIntegrationTest.java arg-for-arg). Comparison matches the
reference's own IntegrationTestSpec: per-line with whitespace trimmed; header
##-lines are skipped (our header provenance differs), #CHROM and all data
lines must match."""
import os

import pytest

S = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
     "tools/walkers/variantutils/SelectVariants")

pytestmark = pytest.mark.skipif(not os.path.isdir(S),
                                reason="reference resources unavailable")

V2, SAMPLES = f"{S}/vcfexample2.vcf", f"{S}/samples.args"  # noqa: E501
CE1 = f"{S}/complexExample1.vcf"
DISC = f"{S}/vcfexample2DiscordanceConcordance.vcf"
FILT = f"{S}/filteredSamples.vcf"
NOCALL = f"{S}/vcfexample.forNoCallFiltering.vcf"
LOSE = f"{S}/vcfexample.loseAlleleInSelection.vcf"
SPAN = f"{S}/spanning_deletion.vcf"
DA = [V2, "-DA", "FisherStrand", "-DA", "OnOffGenotype", "-DGA", "RD",
      "-sn", "NA11894"]

CASES = [
    ("SimpleSelection", [V2, "-sn", "NA11918"]),
    ("RepeatedLineSelection",
     [f"{S}/test.dup.vcf", "-sn", "A", "-sn", "B", "-sn", "C",
      "-exclude-filtered"]),
    ("ComplexSelection",
     [V2, "-sn", "NA11894", "-se", "NA069*", "-sn", SAMPLES,
      "-select", "RMSMAPQ < 170.0"]),
    ("ComplexSelectionWithNonExistingSamples",
     [V2, "--allow-nonoverlapping-command-line-samples", "-select",
      "RMSMAPQ < 170.0", "-sn", "Z", "-sn", SAMPLES]),
    ("NonExistingSelection",
     [V2, "--exclude-non-variants", "-select", "foo!=0 || RMSMAPQ < 170.0"]),
    ("SampleExclusionFromFileAndSeparateSample",
     [V2, "-xl-sn", "NA11894", "-xl-sn", SAMPLES]),
    ("SampleExclusionJustFromFile", [V2, "-xl-sn", SAMPLES]),
    ("SampleExclusionJustFromExpression", [V2, "-xl-se", "NA069*"]),
    ("SampleExclusionJustFromRegexExpression",
     [V2, "-se", "NA[0-9]{4}[^1-9]"]),
    ("InvertSelection",
     [V2, "-sn", "NA11894", "-sn", SAMPLES, "-select", "RMSMAPQ < 170.0",
      "--invertSelect"]),
    ("InvertJexlSelection",
     [V2, "-sn", "NA11894", "-sn", SAMPLES, "-select", "RMSMAPQ > 170.0"]),
    ("Discordance", [V2, "-sn", "NA11992", "-disc", DISC]),
    ("Concordance", [V2, "-sn", "NA11894", "-conc", DISC, "--lenient"]),
    ("VariantTypeSelection",
     [CE1, "--restrict-alleles-to", "MULTIALLELIC",
      "--select-type-to-include", "MIXED"]),
    ("ExcludeSelectionType", [CE1, "--select-type-to-exclude", "SNP"]),
    ("KeepSelectionID", [CE1, "-ids", "testid1"]),
    ("ExcludeSelectionID", [CE1, "-xl-ids", "testid1"]),
    ("MaxIndelLengthSelection",
     [CE1, "--select-type-to-include", "INDEL", "--max-indel-size", "2"]),
    ("MinIndelLengthSelection",
     [CE1, "--select-type-to-include", "INDEL", "--min-indel-size", "2"]),
    ("RemoveMLE", [f"{S}/vcfexample.withMLE.vcf", "-sn", "NA12892"]),
    ("KeepOriginalAC", [LOSE, "--keep-original-ac", "-sn", "NA12892"]),
    ("KeepOriginalACAndENV",
     [LOSE, "--keep-original-ac", "-sn", "NA12892", "--exclude-non-variants",
      "--remove-unused-alternates"]),
    ("KeepOriginalDP",
     [f"{S}/CEUtrioTest.vcf", "--keep-original-dp", "-sn", "NA12892"]),
    ("MultipleRecordsAtOnePosition",
     [f"{S}/selectVariants.onePosition.vcf", "-select", "KG_FREQ < 0.5"]),
    ("NoGTs", [f"{S}/vcf4.1.example.vcf"]),
    ("MendelianViolationSelection",
     [f"{S}/CEUtrioTest.vcf", "-ped", f"{S}/CEUtrio.ped",
      "--mendelian-violation", "--mendelian-violation-qual-threshold", "0"]),
    ("InvertMendelianViolationSelection",
     [f"{S}/CEUtrioTest.vcf", "--mendelian-violation",
      "--mendelian-violation-qual-threshold", "0",
      "--invert-mendelian-violation", "-ped", f"{S}/CEUtrio.ped"]),
    ("MaxFilteredGenotypesSelection", [FILT, "--max-filtered-genotypes", "1"]),
    ("MinFilteredGenotypesSelection", [FILT, "--min-filtered-genotypes", "2"]),
    ("MaxFractionFilteredGenotypesSelection",
     [FILT, "--max-fraction-filtered-genotypes", "0.4"]),
    ("MinFractionFilteredGenotypesSelection",
     [FILT, "--min-fraction-filtered-genotypes", "0.6"]),
    ("SetFilteredGtoNocall", [FILT, "--set-filtered-gt-to-nocall"]),
    ("maxNOCALLnumber1", [NOCALL, "--max-nocall-number", "1"]),
    ("maxNOCALLnumber2", [NOCALL, "--max-nocall-fraction", "0.5"]),
    ("DropAnnotations", DA[:]),
    ("DropAnnotationsSelectFisherStrand",
     DA + ["-select", "FisherStrand > 10.0"]),
    ("DropAnnotationsSelectRMSMAPQ", DA + ["-select", "RMSMAPQ > 175.0"]),
    ("DropAnnotationsSelectRD",
     DA + ["-select",
           'vc.getGenotype("NA11894").getExtendedAttribute("RD")>6']),
    ("DropAnnotationsSelectGQ",
     DA + ["-select", 'vc.getGenotype("NA11894").getGQ()==1']),
    ("RemoveSingleSpanDelAlleleNoSpanDel",
     [SPAN, "-sn", "NA1", "--remove-unused-alternates",
      "--exclude-non-variants"]),
    ("RemoveSingleSpanDelAlleleExNoVar",
     [SPAN, "-sn", "NA2", "--remove-unused-alternates"]),
    ("RemoveSingleSpanDelAllele",
     [SPAN, "-sn", "NA2", "--exclude-non-variants",
      "--remove-unused-alternates"]),
    ("MultiAllelicExcludeNonVar",
     [f"{S}/multi-allelic.bi-allelicInGIH.vcf", "-sn",
      f"{S}/GIH.samples.args", "--exclude-non-variants",
      "--remove-unused-alternates"]),
    ("AlleleTrimming",
     [f"{S}/forHardLeftAlignVariantsTest.vcf", "-sn", "NA12878",
      "--exclude-non-variants", "--remove-unused-alternates"]),
    ("Haploid",
     [f"{S}/haploid-multisample.vcf", "-sn", "HG00610", "-select", "DP > 7",
      "--remove-unused-alternates"]),
    ("Tetraploid",
     [f"{S}/tetraploid-multisample.vcf", "-sn", "NA18486", "-select",
      "DP > 57", "--remove-unused-alternates"]),
    ("TetraDiploid",
     [f"{S}/tetra-diploid.vcf", "-sn", "NA12878", "-select", "DP > 48",
      "--remove-unused-alternates"]),
    ("SimpleDiploid",
     [f"{S}/261_S01_raw_variants_gvcf.vcf", "--remove-unused-alternates"]),
    ("SACDiploid",
     [f"{S}/diploid-multisample-sac.g.vcf", "-sn", "NA12891",
      "--remove-unused-alternates"]),
    ("SimpleExpressionSelection",
     [f"{S}/filteringDepthInFormat.vcf", "-select", "DP < 7"]),
    ("VariantTypeSelectionForGVCF",
     [f"{S}/gvcfExample.g.vcf", "--select-type-to-include", "SNP",
      "--ignore-non-ref-in-types"]),
    ("onlyOutputInInterval",
     [CE1, "-L", "1:10045604-10046982", "--variant-output-filtering",
      "STARTS_IN"]),
    ("MultiAllelicAnnotationOrdering",
     [f"{S}/multi-allelic-ordering.vcf", "-sn", "SAMPLE-CC", "-sn",
      "SAMPLE-CT", "-sn", "SAMPLE-CA", "--exclude-non-variants"]),
    ("SACNonDiploid",
     [f"{S}/tetraploid-multisample-sac.g.vcf", "-sn", "NA12891",
      "--remove-unused-alternates"]),
    ("SetFilteredGtoNocallUpdateInfo",
     [f"{S}/selectVariantsInfoField.vcf", "--set-filtered-gt-to-nocall",
      "--remove-unused-alternates", "--exclude-non-variants"]),
    ("UnusedAlleleHardLeftTrim",
     [f"{S}/forHardLeftAlignVariantsTest.vcf", "--remove-unused-alternates"]),
    ("UnusedAlleleHardLeft", [f"{S}/forHardLeftAlignVariantsTest.vcf"]),
    ("UnusedAlleleCCCT",
     [f"{S}/multi-allelic-ordering.vcf", "-sn", "SAMPLE-CC", "-sn",
      "SAMPLE-CT"]),
    ("UnusedAlleleCCCTEnv",
     [f"{S}/multi-allelic-ordering.vcf", "-sn", "SAMPLE-CC", "-sn",
      "SAMPLE-CT", "--exclude-non-variants"]),
    ("UnusedAlleleCCCTTrim",
     [f"{S}/multi-allelic-ordering.vcf", "-sn", "SAMPLE-CC", "-sn",
      "SAMPLE-CT", "--remove-unused-alternates"]),
    ("UnusedAlleleCCCTTrimAltEnv",
     [f"{S}/multi-allelic-ordering.vcf", "-sn", "SAMPLE-CC", "-sn",
      "SAMPLE-CT", "--exclude-non-variants", "--remove-unused-alternates"]),
]


def _lines(path):
    out = []
    for line in open(path):
        if line.startswith("##"):
            continue
        out.append(line.strip())
    return out


@pytest.mark.parametrize("case", range(len(CASES)),
                         ids=[c[0] for c in CASES])
def test_select_variants_golden(tmp_path, case):
    name, args = CASES[case]
    if not os.path.exists(args[0]):
        pytest.skip(f"{args[0]} missing")
    expected = f"{S}/expected/testSelectVariants_{name}.vcf"
    if not os.path.exists(expected):
        pytest.skip(f"{expected} missing")
    from gatk_tpu.tools.select_variants import select_variants

    out = tmp_path / "out.vcf"
    select_variants(["-V"] + args + ["-O", str(out)])
    got, exp = _lines(str(out)), _lines(expected)
    assert len(got) == len(exp), \
        (name, len(got), len(exp), got[1:3], exp[1:3])
    for i, (g, e) in enumerate(zip(got, exp)):
        assert g == e, (name, i, g, e)
