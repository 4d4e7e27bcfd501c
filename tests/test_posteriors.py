"""CalculateGenotypePosteriors golden tests (family + population priors)."""
import subprocess
import sys

from conftest import reference_path

D = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/walkers/variantutils/CalculateGenotypePosteriors")


def _run(args):
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "CalculateGenotypePosteriors"] + args,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr


def _data_lines(path):
    with open(path) as fh:
        return [ln.rstrip("\n") for ln in fh if not ln.startswith("##")]


def test_family_priors_golden(tmp_path):
    """Trio family priors + population priors (CGP testFamilyPriors)."""
    out = str(tmp_path / "cgp.vcf")
    _run(["--discovered-allele-count-priors-off", "-V", f"{D}/CEUtrioTest_chr1.vcf",
          "-ped", f"{D}/CEUtrio.ped",
          "--supporting-callsets", f"{D}/CEUtrioPopPriorsTest_chr1.vcf", "-O", out])
    assert _data_lines(out) == _data_lines(f"{D}/expectedCGP_testFamilyPriors_chr1.vcf")


def test_single_parent_family_golden(tmp_path):
    """Trio-only family priors; pairs left untouched (CGP testSingleParentFamily)."""
    out = str(tmp_path / "cgp2.vcf")
    _run(["-V", f"{D}/threeMemberNonTrioTest_chr1.vcf",
          "-ped", f"{D}/threeMemberNonTrio.ped", "--skip-population-priors", "-O", out])
    assert _data_lines(out) == _data_lines(f"{D}/expectedCGP_testSingleParentFamily_chr1.vcf")
