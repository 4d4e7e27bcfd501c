"""RampedHaplotypeCaller off/on ramp round trip
(haplotypecaller/RampedHaplotypeCaller.java)."""
import os

import pytest

from gatk_tpu.cli import TOOL_REGISTRY

MITO = "/root/reference/src/test/resources/org/broadinstitute/hellbender/tools/mutect/mito"
BAM = f"{MITO}/NA12878.bam"
REF = f"{MITO}/Homo_sapiens_assembly38.mt_only.fasta"

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.exists(BAM), reason="mito test data absent")
def test_ramped_off_on_roundtrip(tmp_path):
    state = str(tmp_path / "state.zip")
    rc = TOOL_REGISTRY["RampedHaplotypeCaller"](
        ["-I", BAM, "-R", REF, "-L", "chrM:100-400", "-O", state,
         "--off-ramp-type", "POST_ASSEMBLER_OFF", "--off-ramp-file", state,
         "--max-reads-per-alignment-start", "5", "--adaptive-pruning"])
    assert rc == 0
    assert os.path.getsize(state) > 1000

    out = str(tmp_path / "resumed.vcf")
    rc = TOOL_REGISTRY["RampedHaplotypeCaller"](
        ["-R", REF, "-O", out, "--on-ramp-type", "POST_ASSEMBLER_ON",
         "--on-ramp-file", state])
    assert rc == 0
    by_pos = {int(l.split("\t")[1]) for l in open(out) if not l.startswith("#")}
    # canonical mito calls must survive the ramp round trip
    for pos in (152, 263, 310):
        assert pos in by_pos, f"missing chrM:{pos} after on-ramp resume"
