"""QC metrics golden tests vs the reference's committed Picard metrics files."""
import subprocess
import sys

from conftest import reference_path

M = reference_path("src/test/resources/org/broadinstitute/hellbender/metrics/analysis")


def _run(tool, args):
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", tool] + args,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr


def _payload(path):
    """Metrics + histogram sections (skip the tool-invocation headers)."""
    lines = open(path).read().splitlines()
    start = next(i for i, ln in enumerate(lines)
                 if ln.startswith(("## METRICS CLASS", "## HISTOGRAM")))
    return [ln for ln in lines[start:] if ln.strip()]


def test_collect_insert_size_metrics_golden(tmp_path):
    out = str(tmp_path / "is.txt")
    _run("CollectInsertSizeMetrics",
         ["-I", f"{M}/CollectInsertSizeMetrics/insert_size_metrics_test.bam", "-O", out])
    assert _payload(out) == _payload(
        f"{M}/CollectInsertSizeMetrics/expectedInsertSizeMetricsL1.txt")


def test_mean_quality_by_cycle_golden(tmp_path):
    out = str(tmp_path / "mqbc.txt")
    _run("MeanQualityByCycle", ["-I", f"{M}/MeanQualityByCycle/first5000a.bam", "-O", out])
    assert _payload(out) == _payload(f"{M}/MeanQualityByCycle/meanqualbycycle.txt")


def test_mean_quality_by_cycle_pf_fail(tmp_path):
    out = str(tmp_path / "pf.txt")
    _run("MeanQualityByCycle", ["-I", f"{M}/MeanQualityByCycle/example_pfFail_reads.bam",
                                "-O", out, "--pf-reads-only", "true"])
    assert _payload(out) == _payload(f"{M}/MeanQualityByCycle/pfFailBam.pfOnly.txt")


def test_quality_score_distribution_golden(tmp_path):
    out = str(tmp_path / "qsd.txt")
    _run("QualityScoreDistribution",
         ["-I", f"{M}/QualityScoreDistribution/first5000a.bam", "-O", out])
    assert _payload(out) == _payload(f"{M}/QualityScoreDistribution/qualscoredist.txt")


def test_quality_score_distribution_oq(tmp_path):
    out = str(tmp_path / "oq.txt")
    _run("QualityScoreDistribution",
         ["-I", f"{M}/QualityScoreDistribution/originalQuals.chr1.1-1K.bam", "-O", out])
    assert _payload(out) == _payload(
        f"{M}/QualityScoreDistribution/originalQuals.chr1.1-1K.QualityScoreDistribution.txt")
