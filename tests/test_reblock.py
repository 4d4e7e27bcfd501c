"""ReblockGVCF golden tests against the reference's committed expected outputs
(ReblockGVCFIntegrationTest.java scenarios that don't require the LFS reference)."""
import subprocess
import sys

import pytest

from conftest import reference_path

D = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/walkers/variantutils/ReblockGVCF")


def _run(args, out):
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "ReblockGVCF"] + args + ["-O", out],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr


def _data_lines(path):
    with open(path) as fh:
        return [ln.rstrip("\n") for ln in fh if not ln.startswith("##")]


@pytest.mark.parametrize("case,args,expected", [
    ("gnomad", ["-V", f"{D}/gvcfForReblocking.g.vcf", "--drop-low-quals",
                "--do-qual-score-approximation", "-L", "chr20:69485-69791",
                "-A", "Coverage", "-A", "RMSMappingQuality",
                "-A", "ReadPosRankSumTest", "-A", "MappingQualityRankSumTest"],
     f"{D}/testOneSampleAsForGnomAD.expected.g.vcf"),
    ("one_sample", ["-V", f"{D}/gvcfForReblocking.g.vcf", "-L", "chr20:69771",
                    "--rgq-threshold-to-no-call", "19"],
     f"{D}/testJustOneSample.expected.g.vcf"),
    ("raw_mq", ["-V", f"{D}/prod.chr20snippet.withRawMQ.g.vcf"],
     f"{D}/prod.chr20snippet.withRawMQ.expected.g.vcf"),
])
def test_reblock_gvcf_golden(tmp_path, case, args, expected):
    out = str(tmp_path / f"{case}.g.vcf")
    _run(args, out)
    assert _data_lines(out) == _data_lines(expected)
