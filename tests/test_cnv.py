"""gCNV stack tests vs the reference's bundled gcnvkernel outputs (sim cohort)."""
import glob
import gzip
import os
import re

import numpy as np
import pytest

from gatk_tpu.utils.testdata import reference_path

pytestmark = pytest.mark.slow  # heavy integration tier (pytest.ini; testsettings.gradle:13-34)

SIM_DIR = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/copynumber/gcnv-sim-data")
POST_DIR = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/copynumber/gcnv-postprocess")
needs_ref = pytest.mark.skipif(not os.path.isdir(SIM_DIR), reason="reference data missing")


def _norm(s):
    return re.sub(r"_0*(\d+)$", r"_\1", s)


@pytest.fixture(scope="module")
def cohort_fit(tmp_path_factory):
    from gatk_tpu.tools.cnv_tools import determine_germline_contig_ploidy, germline_cnv_caller

    out = str(tmp_path_factory.mktemp("cnv"))
    inputs = sorted(glob.glob(os.path.join(SIM_DIR, "SAMPLE_*_counts.tsv")))
    argv = []
    for f in inputs:
        argv += ["-I", f]
    determine_germline_contig_ploidy(argv + [
        "--contig-ploidy-priors", os.path.join(SIM_DIR, "contig_ploidy_prior.tsv"),
        "-O", out, "--output-prefix", "ploidy"])
    germline_cnv_caller(argv + [
        "--contig-ploidy-calls", os.path.join(out, "ploidy-calls"),
        "-O", out, "--output-prefix", "gcnv"])
    return out


@needs_ref
def test_contig_ploidy_matches_gcnvkernel(cohort_fit):
    """All 100 contig-ploidy calls match the reference python model's bundled
    calls (gcnv-sim-data/contig-ploidy-calls)."""
    from gatk_tpu.cnv.cnv_io import read_contig_ploidy_calls

    ref, _ = read_contig_ploidy_calls(os.path.join(SIM_DIR, "contig-ploidy-calls"))
    got, _ = read_contig_ploidy_calls(os.path.join(cohort_fit, "ploidy-calls"))
    refn = {_norm(k): v for k, v in ref.items()}
    mismatches = [
        (s, c) for s, calls in got.items() for c, p in calls.items()
        if refn.get(_norm(s), {}).get(c) != p
    ]
    assert mismatches == []


@needs_ref
def test_copy_number_concordance_vs_gcnvkernel(cohort_fit):
    """Per-interval CN calls >= 99% concordant with the reference's expected
    PostprocessGermlineCNVCalls outputs for the 3 bundled samples."""
    cn = np.load(os.path.join(cohort_fit, "gcnv-calls", "cn.npy"))
    samples = open(os.path.join(cohort_fit, "gcnv-calls", "samples.txt")).read().split()
    for name in ("SAMPLE_000", "SAMPLE_001", "SAMPLE_002"):
        si = samples.index(name)
        ref_cn = np.array([
            int(line.split("\t")[9].split(":")[1])
            for line in gzip.open(os.path.join(POST_DIR, f"intervals_output_{name}.vcf.gz"), "rt")
            if not line.startswith("#")
        ])
        got = cn[si][: len(ref_cn)]
        assert (got == ref_cn).mean() >= 0.99, name


@needs_ref
def test_postprocess_writes_vcf(cohort_fit, tmp_path):
    from gatk_tpu.io import vcf as vcfio
    from gatk_tpu.tools.cnv_tools import postprocess_germline_cnv_calls

    out = str(tmp_path / "s0.vcf")
    postprocess_germline_cnv_calls([
        "--calls-shard-path", os.path.join(cohort_fit, "gcnv-calls"),
        "--sample-index", "0", "--output-genotyped-intervals", out])
    vs = list(vcfio.VcfReader(out))
    assert len(vs) == 510
    assert vs[0].alts == ("<DEL>", "<DUP>")
    assert all("CN" in v.samples[0] for v in vs)
