"""VariantEval byte-identical gates against the reference's committed
expected tables (tools/walkers/varianteval/VariantEval/expected/) — the
LFS-free subset of VariantEvalIntegrationTest.java's cases."""
import os

import pytest

from gatk_tpu.cli import TOOL_REGISTRY

D = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
     "tools/walkers/varianteval/VariantEval")

pytestmark = pytest.mark.skipif(not os.path.isdir(D),
                                reason="varianteval resources unavailable")


def _run_and_compare(argv, expected_name, tmp_path):
    out = tmp_path / "out.txt"
    rc = TOOL_REGISTRY["VariantEval"](argv + ["-O", str(out)])
    assert not rc
    got = out.read_text()
    exp = open(f"{D}/expected/{expected_name}").read()
    assert got == exp, f"{expected_name} differs"


def test_fundamentals_count_variants_no_comp(tmp_path):
    vcf = f"{D}/FundamentalsTest.annotated.db.subset.snps_and_indels.vcf"
    _run_and_compare(
        ["--eval", vcf, "-no-ev", "-EV", "CountVariants", "-no-st", "-L", vcf],
        "testFundamentalsCountVariantsNoCompRod.expected.txt", tmp_path)


@pytest.mark.parametrize("suffix,ev,cp", [
    ("sites-sites", "validationReportEval.noGenotypes.vcf",
     "validationReportComp.noGenotypes.vcf"),
    ("sites-genotypes", "validationReportEval.noGenotypes.vcf",
     "validationReportComp.vcf"),
    ("genotypes-sites", "validationReportEval.vcf",
     "validationReportComp.noGenotypes.vcf"),
    ("genotypes-genotypes", "validationReportEval.vcf",
     "validationReportComp.vcf"),
])
def test_validation_report(suffix, ev, cp, tmp_path):
    _run_and_compare(
        ["--eval", f"{D}/{ev}", "--comp", f"{D}/{cp}",
         "-L", "20:10,000,000-10,000,010", "-no-st", "-no-ev",
         "-EV", "ValidationReport"],
        f"testValidationReportData-{suffix}.expected.txt", tmp_path)


@pytest.mark.parametrize("keep", [False, True])
def test_variant_summary_ac0(keep, tmp_path):
    argv = ["--eval", f"{D}/ac0.vcf", "-L", "20:81006", "-no-st", "-no-ev",
            "-EV", "VariantSummary"]
    if keep:
        argv.append("-keep-ac0")
    _run_and_compare(argv, f"testIncludingAC0 keep ac 0 = {keep}.expected.txt"
                     .replace("False", "false").replace("True", "true"),
                     tmp_path)


def test_ve_mendelian_violation_evaluator(tmp_path):
    _run_and_compare(
        ["--eval", f"{D}/MendelianViolationEval.vcf",
         "-ped", f"{D}/MendelianViolationEval.ped",
         "-no-ev", "-no-st", "-EV", "MendelianViolationEvaluator",
         "-L", "1:10109-10315",
         "--mendelian-violation-qual-threshold", "0"],
        "testVEMendelianViolationEvaluator.expected.txt", tmp_path)


def test_mv_eval_family_strat(tmp_path):
    _run_and_compare(
        ["--eval", f"{D}/PhaseByTransmission.IntegrationTest.TP.vcf",
         "-ped", f"{D}/PhaseByTransmission.IntegrationTest.goodFamilies.ped",
         "-no-ev", "-no-st", "-ST", "Family",
         "-EV", "MendelianViolationEvaluator"],
        "testMVEvalFamilyStrat.expected.txt", tmp_path)


def test_interval_strat(tmp_path):
    # -L 20 in the reference spec == the full b37 chr20 span
    _run_and_compare(
        ["--eval", f"{D}/withSymbolic.b37.vcf", "-no-ev", "-EV",
         "CountVariants", "-no-st", "-strat-intervals",
         f"{D}/overlapTest.bed", "-ST", "IntervalStratification",
         "-L", "20:1-63025520"],
        "testIntervalStrat.expected.txt", tmp_path)


def test_pedigree_validation(tmp_path):
    # SILENT: mismatched ped tolerated, output matches the committed golden
    _run_and_compare(
        ["--eval", f"{D}/PhaseByTransmission.IntegrationTest.TP.vcf",
         "-ped", f"{D}/MendelianViolationEval.ped", "-no-ev",
         "-EV", "MendelianViolationEvaluator", "-L", "1:10109-10315",
         "-mvq", "0", "-no-st", "-pedValidationType", "SILENT"],
        "testPedigreeValidation.expected.txt", tmp_path)
    # STRICT (the default): mismatched pedigree raises a UserError
    import pytest

    from gatk_tpu.utils.errors import UserError
    with pytest.raises(UserError, match="pedigree"):
        TOOL_REGISTRY["VariantEval"](
            ["--eval", f"{D}/PhaseByTransmission.IntegrationTest.TP.vcf",
             "-ped", f"{D}/MendelianViolationEval.ped", "-no-ev",
             "-EV", "MendelianViolationEvaluator", "-L", "1:10109-10315",
             "-mvq", "0", "-no-st", "-O", str(tmp_path / "x.txt")])


def test_allele_frequency_qc(tmp_path):
    """AlleleFrequencyQC metrics byte-identical to the reference golden
    (incl. the Java int-division quirk in VariantAFEvaluator.java:57)."""
    A = ("/root/reference/src/test/resources/org/broadinstitute/hellbender/"
         "tools/walkers/varianteval/AlleleFrequencyQC")
    out = tmp_path / "afqc.txt"
    rc = TOOL_REGISTRY["AlleleFrequencyQC"](
        ["--eval", f"{A}/af.na12878_array.vcf",
         "--comp", f"{A}/af.thousand_genomes.10sites.vcf",
         "-L", f"{A}/af.thousand_genomes.10sites.vcf", "-O", str(out)])
    assert not rc
    assert out.read_text() == open(
        f"{A}/expected/testAFQCIntegration.expected.txt").read()
