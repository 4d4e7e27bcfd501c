import numpy as np

from gatk_tpu.utils import mathx, quals


def test_jacobian_matches_exact_within_table_precision():
    rng = np.random.default_rng(0)
    a = rng.uniform(-30, 0, 1000)
    b = rng.uniform(-30, 0, 1000)
    approx = mathx.approximate_log10_sum_log10(a, b)
    exact = np.log10(10.0**a + 10.0**b)
    np.testing.assert_allclose(approx, exact, atol=1e-4)


def test_approximate_sum_neg_inf():
    assert mathx.approximate_log10_sum_log10(-np.inf, -3.0) == -3.0
    assert mathx.approximate_log10_sum_log10(np.array([-np.inf, -2.0, -2.0])) > -2.0


def test_log10_sum_log10_axis():
    vals = np.log10(np.array([[1.0, 2.0, 3.0], [0.5, 0.5, 1.0]]))
    out = mathx.log10_sum_log10(vals, axis=-1)
    np.testing.assert_allclose(out, np.log10([6.0, 2.0]))


def test_qual_tables():
    assert quals.qual_to_error_prob(np.array([10], np.uint8))[0] == 0.1
    np.testing.assert_allclose(quals.qual_to_prob(np.array([20], np.uint8))[0], 0.99)
    # byte wrap semantics: java byte -1 -> 255
    assert quals.qual_to_error_prob(np.array([255], np.int64))[0] == 10.0 ** (-25.5)


def test_log1mexp():
    a = np.array([-0.1, -1.0, -20.0])
    np.testing.assert_allclose(mathx.log1mexp(a), np.log(1 - np.exp(a)))
