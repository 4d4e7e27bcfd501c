import numpy as np

from gatk_tpu.calling import genotyper


def test_genotype_order_diploid():
    gts = genotyper.genotype_allele_counts(2, 3)
    assert gts == [(0, 0), (0, 1), (1, 1), (0, 2), (1, 2), (2, 2)]


def test_gl_hom_ref():
    # 10 reads all strongly supporting allele 0
    values = np.array([[0.0] * 10, [-5.0] * 10])
    gl = genotyper.compute_genotype_likelihoods(values, 2)
    assert gl[0] > gl[1] > gl[2]
    np.testing.assert_allclose(gl[0], 0.0, atol=1e-9)


def test_gl_het():
    values = np.array([[0.0] * 5 + [-5.0] * 5, [-5.0] * 5 + [0.0] * 5])
    gl = genotyper.compute_genotype_likelihoods(values, 2)
    assert gl[1] > gl[0] and gl[1] > gl[2]
    # het likelihood = 10 reads * log10(1/2 + tiny)
    np.testing.assert_allclose(gl[1], 10 * np.log10(0.5 + 0.5e-5), atol=1e-3)


def test_af_calc_confident_het():
    values = np.array([[0.0] * 15 + [-6.0] * 15, [-6.0] * 15 + [0.0] * 15])
    gl = genotyper.compute_genotype_likelihoods(values, 2)
    pl = genotyper.gls_to_pls(gl)
    af = genotyper.AlleleFrequencyCalculator()
    res = af.calculate([1, 1], 1, [genotyper.pls_to_gls(pl)])
    qual = -10 * res.log10_p_no_variant
    assert qual > 50
    assert res.allele_counts_mle[0] == 1


def test_af_calc_hom_ref_low_qual():
    values = np.array([[0.0] * 20, [-6.0] * 20])
    gl = genotyper.compute_genotype_likelihoods(values, 2)
    pl = genotyper.gls_to_pls(gl)
    af = genotyper.AlleleFrequencyCalculator()
    res = af.calculate([1, 1], 1, [genotyper.pls_to_gls(pl)])
    qual = -10 * res.log10_p_no_variant
    assert qual < 1.0


def test_af_calc_hom_var():
    values = np.array([[-6.0] * 20, [0.0] * 20])
    gl = genotyper.compute_genotype_likelihoods(values, 2)
    pl = genotyper.gls_to_pls(gl)
    af = genotyper.AlleleFrequencyCalculator()
    res = af.calculate([1, 1], 1, [genotyper.pls_to_gls(pl)])
    assert res.allele_counts_mle[0] == 2
    assert -10 * res.log10_p_no_variant > 50


def test_pl_roundtrip():
    gl = np.array([-2.0, -0.1, -5.0])
    pl = genotyper.gls_to_pls(gl)
    assert pl.min() == 0
    assert pl[1] == 0
    assert pl[0] == 19
