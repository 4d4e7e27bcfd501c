"""Somatic CNV stack tests: SVD denoising, kernel segmentation, calling.

Golden: CallCopyRatioSegments reproduces CallCopyRatioSegmentsIntegrationTest's
expected calls on the bundled segments file. The rest are property tests on
synthetic data (the reference's own DenoiseReadCounts tests are smoke-only)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import reference_path
from gatk_tpu.cnv import somatic

pytestmark = pytest.mark.slow  # heavy integration tier (pytest.ini; testsettings.gradle:13-34)

CNV_DIR = reference_path("src/test/resources/org/broadinstitute/hellbender/tools/copynumber")


def test_call_copy_ratio_segments_golden(tmp_path):
    seg = os.path.join(CNV_DIR, "call-copy-ratio-segments-segments.seg")
    out = str(tmp_path / "called.seg")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "CallCopyRatioSegments",
                        "-I", seg, "-O", out], capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    _s, _h, cols, rows = somatic.read_sam_tsv(out)
    assert cols[-1] == "CALL"
    assert [r[-1] for r in rows] == ["+", "-", "0", "0"]


def test_kernel_segmentation_recovers_steps():
    rng = np.random.default_rng(7)
    data = np.concatenate([rng.normal(0.0, 0.1, 100),
                           rng.normal(1.0, 0.1, 80),
                           rng.normal(-0.5, 0.1, 120)])
    cps = somatic.find_changepoints(data, window_sizes=(8, 16, 32, 64))
    assert len(cps) == 2
    assert abs(cps[0] - 99) <= 2 and abs(cps[1] - 179) <= 2


def test_kernel_segmentation_no_changepoints_on_flat_data():
    rng = np.random.default_rng(3)
    data = rng.normal(0.0, 0.1, 200)
    cps = somatic.find_changepoints(data, window_sizes=(8, 16, 32, 64))
    assert cps == []


def test_gaussian_kernel_detects_multimodal_change():
    # allele fractions: balanced hets (~0.5) then imbalanced (0.2/0.8 mixture)
    rng = np.random.default_rng(11)
    balanced = rng.normal(0.5, 0.03, 100)
    imbalanced = np.concatenate([rng.normal(0.25, 0.03, 50), rng.normal(0.75, 0.03, 50)])
    rng.shuffle(imbalanced)
    data = np.concatenate([balanced, imbalanced])
    cps = somatic.find_changepoints(data, kernel_variance=0.025,
                                    window_sizes=(8, 16, 32, 64))
    assert any(abs(c - 99) <= 4 for c in cps)


def test_pon_denoising_removes_systematic_bias():
    rng = np.random.default_rng(42)
    n_intervals = 300
    n_normals = 12
    bias = np.exp(rng.normal(0.0, 0.5, n_intervals))  # shared interval bias
    intervals = [("20", 1 + 1000 * i, 1000 * (i + 1)) for i in range(n_intervals)]

    # two latent noise factors (e.g. batch effects) with per-sample loadings:
    # static bias is removed by the interval medians; the SVD must learn these
    factors = rng.normal(0.0, 0.4, (2, n_intervals))
    normals = np.stack([
        rng.poisson(400 * bias * np.exp(rng.normal(0, 0.7, 2) @ factors))
        for _ in range(n_normals)]).astype(float)
    pon = somatic.build_panel_of_normals(normals, intervals, number_of_eigensamples=5)

    # case: same bias + factor structure plus a 2x amplification over 100..150
    cn = np.ones(n_intervals)
    cn[100:150] = 2.0
    case = rng.poisson(400 * bias * np.exp(np.array([0.8, -0.5]) @ factors) * cn).astype(float)

    standardized, denoised = somatic.denoise_sample(pon, case)
    # map back to original interval indices
    idx = pon.panel_interval_idx
    amp = np.isin(idx, np.arange(100, 150))
    neutral = ~amp
    # denoised neutral region should be much flatter than standardized
    assert np.std(denoised[neutral]) < 0.6 * np.std(standardized[neutral])
    # amplification preserved (~log2 2.0 = 1)
    assert abs(np.median(denoised[amp]) - 1.0) < 0.25


def test_pon_hdf5_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    intervals = [("1", 1 + 10 * i, 10 * (i + 1)) for i in range(50)]
    counts = rng.poisson(100, size=(6, 50)).astype(float) + 1
    pon = somatic.build_panel_of_normals(counts, intervals, number_of_eigensamples=3)
    path = str(tmp_path / "pon.hdf5")
    pon.save_hdf5(path)
    back = somatic.PanelOfNormals.load_hdf5(path)
    assert back.original_intervals == pon.original_intervals
    np.testing.assert_array_equal(back.panel_interval_idx, pon.panel_interval_idx)
    np.testing.assert_allclose(back.eigensample_vectors, pon.eigensample_vectors)
    assert back.sample_names == pon.sample_names


def test_gc_bias_correction_flattens_gc_trend():
    rng = np.random.default_rng(5)
    n = 500
    gc = rng.uniform(0.2, 0.8, n)
    bias = 1.0 + 2.0 * (gc - 0.5) ** 2 * 10  # strong parabolic GC bias
    counts = rng.poisson(100 * bias).astype(float)[None, :]
    corrected = somatic.correct_gc_bias(counts, gc)
    # correlation of counts with bias should drop substantially
    before = abs(np.corrcoef(counts[0], bias)[0, 1])
    after = abs(np.corrcoef(corrected[0], bias)[0, 1])
    assert after < 0.3 * before
    # total coverage preserved
    assert corrected.sum() == pytest.approx(counts.sum(), rel=1e-6)


def test_denoise_read_counts_no_pon_on_reference_tsv(tmp_path):
    tsv = os.path.join(CNV_DIR,
                       "denoise-read-counts-wgs-read-counts-HCC1143_BL-n1-chr20-downsampled-deduplicated.tsv")
    std = str(tmp_path / "std.tsv")
    den = str(tmp_path / "den.tsv")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "DenoiseReadCounts",
                        "-I", tsv, "--standardized-copy-ratios", std,
                        "--denoised-copy-ratios", den],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    _s, _h, cols, rows = somatic.read_sam_tsv(std)
    assert cols == ["CONTIG", "START", "END", "LOG2_COPY_RATIO"]
    vals = np.array([float(x[3]) for x in rows])
    # standardized values are median-centered log2 ratios
    assert abs(np.median(vals)) < 1e-6
    # without a PoN, denoised == standardized
    _s2, _h2, _c2, rows2 = somatic.read_sam_tsv(den)
    assert rows == rows2


def test_read_gatk_hdf5_counts():
    h5 = os.path.join(CNV_DIR,
                      "denoise-read-counts-wgs-read-counts-HCC1143_BL-n1-chr20-downsampled-deduplicated.hdf5")
    tsv = os.path.join(CNV_DIR,
                       "denoise-read-counts-wgs-read-counts-HCC1143_BL-n1-chr20-downsampled-deduplicated.tsv")
    from gatk_tpu.tools.somatic_cnv_tools import _read_counts_any

    s1, _h1, iv1, c1 = _read_counts_any(h5)
    s2, _h2, iv2, c2 = _read_counts_any(tsv)
    assert iv1 == iv2
    np.testing.assert_array_equal(c1, c2)


def test_model_segments_synthetic(tmp_path):
    rng = np.random.default_rng(9)
    # denoised copy ratios with one amplified segment
    n = 300
    log2 = rng.normal(0, 0.08, n)
    log2[120:180] += 1.0
    rows = [("20", 1 + 1000 * i, 1000 * (i + 1), somatic.format_double(v))
            for i, v in enumerate(log2)]
    cr_path = str(tmp_path / "denoised.tsv")
    somatic.write_sam_tsv(cr_path, "case", ["CONTIG", "START", "END", "LOG2_COPY_RATIO"],
                          rows, ["@HD\tVN:1.6", "@SQ\tSN:20\tLN:63025520"])

    outdir = str(tmp_path / "ms")
    r = subprocess.run([sys.executable, "-m", "gatk_tpu", "ModelSegments",
                        "--denoised-copy-ratios", cr_path, "-O", outdir,
                        "--output-prefix", "case"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    _s, _h, cols, seg_rows = somatic.read_sam_tsv(os.path.join(outdir, "case.cr.seg"))
    assert len(seg_rows) == 3
    means = [float(x[4]) for x in seg_rows]
    assert abs(means[0]) < 0.1 and abs(means[1] - 1.0) < 0.15 and abs(means[2]) < 0.1
    # modelFinal.seg exists with posterior columns
    _s3, _h3, mcols, mrows = somatic.read_sam_tsv(os.path.join(outdir, "case.modelFinal.seg"))
    assert "MINOR_ALLELE_FRACTION_POSTERIOR_50" in mcols
    assert len(mrows) == 3


def test_mcmc_copy_ratio_posteriors():
    """Posterior deciles recover the segment means within noise, with sensible
    interval widths (CopyRatioModeller semantics)."""
    import numpy as np

    from gatk_tpu.cnv import mcmc

    rng = np.random.default_rng(3)
    seg_means = [0.0, 1.5, -0.8]
    seg_values = [rng.normal(m, 0.15, 300) for m in seg_means]
    q = mcmc.sample_copy_ratio_posteriors(seg_values, seed=1)
    for i, m in enumerate(seg_means):
        q10, q50, q90 = q[i]
        assert abs(q50 - m) < 0.05, (i, q[i])
        assert q10 < q50 < q90
        assert (q90 - q10) < 0.1  # tight with 300 points
    # empty segments produce NaN
    q2 = mcmc.sample_copy_ratio_posteriors([rng.normal(0, 0.1, 50), []])
    assert np.isnan(q2[1]).all() and not np.isnan(q2[0]).any()


def test_mcmc_copy_ratio_outlier_robustness():
    import numpy as np

    from gatk_tpu.cnv import mcmc

    rng = np.random.default_rng(4)
    clean = rng.normal(0.5, 0.1, 200)
    with_outliers = np.concatenate([clean, np.full(8, 4.0)])  # 4% outliers
    q = mcmc.sample_copy_ratio_posteriors([with_outliers], seed=2)
    assert abs(q[0][1] - 0.5) < 0.1, q  # outliers absorbed by the outlier state


def test_mcmc_allele_fraction_posteriors():
    import numpy as np

    from gatk_tpu.cnv import mcmc

    rng = np.random.default_rng(5)
    # segment 1: balanced hets (minor AF 0.5); segment 2: minor AF 0.2
    def hets(f, n, depth=60):
        out = []
        for _ in range(n):
            minor_is_alt = rng.random() < 0.5
            p = f if minor_is_alt else 1 - f
            a = rng.binomial(depth, p)
            out.append((depth - a, a))
        return out

    q = mcmc.sample_allele_fraction_posteriors([hets(0.5, 150), hets(0.2, 150)], seed=3)
    assert abs(q[0][1] - 0.5) < 0.03, q[0]
    assert abs(q[1][1] - 0.2) < 0.03, q[1]
    assert q[0][0] < q[0][1] <= q[0][2]
