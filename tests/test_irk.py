"""IRK tableau tests: known small-q coefficients + order conditions
(SURVEY.md §4(b))."""

import numpy as np
import pytest

from pinn import irk


def test_q1_midpoint():
    tab = irk.gauss_legendre_irk(1)
    np.testing.assert_allclose(tab.c, [0.5], atol=1e-15)
    np.testing.assert_allclose(tab.b, [1.0], atol=1e-15)
    np.testing.assert_allclose(tab.A, [[0.5]], atol=1e-15)


def test_q2_known_coefficients():
    s3 = np.sqrt(3.0)
    tab = irk.gauss_legendre_irk(2)
    np.testing.assert_allclose(tab.c, [0.5 - s3 / 6, 0.5 + s3 / 6], atol=1e-14)
    np.testing.assert_allclose(tab.b, [0.5, 0.5], atol=1e-14)
    expected_A = np.array([[0.25, 0.25 - s3 / 6],
                           [0.25 + s3 / 6, 0.25]])
    np.testing.assert_allclose(tab.A, expected_A, atol=1e-14)


def test_q3_known_coefficients():
    s15 = np.sqrt(15.0)
    tab = irk.gauss_legendre_irk(3)
    np.testing.assert_allclose(
        tab.c, [0.5 - s15 / 10, 0.5, 0.5 + s15 / 10], atol=1e-14)
    np.testing.assert_allclose(tab.b, [5 / 18, 4 / 9, 5 / 18], atol=1e-14)
    expected_A = np.array([
        [5 / 36, 2 / 9 - s15 / 15, 5 / 36 - s15 / 30],
        [5 / 36 + s15 / 24, 2 / 9, 5 / 36 - s15 / 24],
        [5 / 36 + s15 / 30, 2 / 9 + s15 / 15, 5 / 36],
    ])
    np.testing.assert_allclose(tab.A, expected_A, atol=1e-13)


@pytest.mark.parametrize("q", [5, 25, 100, 500])
def test_order_conditions(q):
    """Collocation conditions: sum_j A[i,j] c_j^(k-1) = c_i^k / k."""
    tab = irk.gauss_legendre_irk(q)
    kmax = min(q, 12)
    for k in range(1, kmax + 1):
        lhs = tab.A @ (tab.c ** (k - 1))
        rhs = tab.c ** k / k
        np.testing.assert_allclose(lhs, rhs, atol=1e-11,
                                   err_msg=f"q={q} order cond k={k}")
    # Row sums of A equal c; b sums to 1.
    np.testing.assert_allclose(tab.A.sum(axis=1), tab.c, atol=1e-11)
    np.testing.assert_allclose(tab.b.sum(), 1.0, atol=1e-12)


def test_reference_file_layout():
    W, times = irk.irk_weights(4)
    assert W.shape == (5, 4)
    np.testing.assert_allclose(W[-1], irk.gauss_legendre_irk(4).b)
    assert times.shape == (4,)


def test_auto_stages_rule():
    # dt = 0.8: q = ceil(0.5 * log(eps)/log(0.8))
    eps = np.finfo(np.float64).eps
    expected = int(np.ceil(0.5 * np.log(eps) / np.log(0.8)))
    assert irk.auto_stages(0.8) == expected
    assert expected == 81  # sanity: the reference setup's actual q
