"""Data layer tests: loaders, LHS sampler, prep-path shapes and
boundary semantics (SURVEY.md §2.2)."""

import numpy as np
import pytest

from pinn import data as pdata


def test_load_burgers_shapes():
    x, t, usol = pdata.load_burgers()
    assert x.shape == (256, 1) and t.shape == (100, 1)
    assert usol.shape == (256, 100)
    # Known grid: x = linspace(-1,1,256), t = 0:0.01:0.99, IC = -sin(pi x).
    np.testing.assert_allclose(x[0, 0], -1.0)
    np.testing.assert_allclose(x[-1, 0], 1.0)
    np.testing.assert_allclose(t[1, 0] - t[0, 0], 0.01)
    np.testing.assert_allclose(usol[:, 0], -np.sin(np.pi * x.ravel()),
                               atol=1e-8)


def test_load_schrodinger_shapes():
    x, t, uu = pdata.load_schrodinger()
    assert x.shape == (256, 1) and t.shape == (201, 1)
    assert uu.shape == (256, 201) and np.iscomplexobj(uu)
    # IC: 2 sech(x).
    np.testing.assert_allclose(np.real(uu[:, 0]),
                               2.0 / np.cosh(x.ravel()), atol=1e-8)


def test_lhs_stratification():
    """Each factor must have exactly one sample per 1/N stratum — the
    defining LHS property (pyDOE-classic semantics)."""
    rng = np.random.RandomState(0)
    H = pdata.lhs(3, 50, rng)
    assert H.shape == (50, 3)
    for j in range(3):
        strata = np.floor(H[:, j] * 50).astype(int)
        assert sorted(strata) == list(range(50))


def test_lhs_rng_call_order():
    """Same seed => same sample (determinism contract)."""
    a = pdata.lhs(2, 20, np.random.RandomState(1234))
    b = pdata.lhs(2, 20, np.random.RandomState(1234))
    np.testing.assert_array_equal(a, b)


def test_burgers_cont_inference_prep():
    np.random.seed(1234)
    d = pdata.burgers_cont_inference(N_u=100, N_f=1000)
    assert d.X_u_train.shape == (100, 2)
    assert d.X_f.shape == (1000, 2)
    assert d.X_star.shape == (25600, 2)
    np.testing.assert_allclose(d.lb, [-1.0, 0.0])
    np.testing.assert_allclose(d.ub, [1.0, 0.99])
    # Supervised points lie on the boundary/initial set: t=0 or x=±1.
    on_bnd = ((d.X_u_train[:, 1] == 0.0)
              | (np.abs(d.X_u_train[:, 0]) == 1.0))
    assert on_bnd.all()
    # Collocation points inside the domain box.
    assert (d.X_f >= d.lb - 1e-12).all() and (d.X_f <= d.ub + 1e-12).all()


def test_burgers_cont_identification_prep():
    np.random.seed(1234)
    d = pdata.burgers_cont_identification(N_u=500)
    assert d.X_u_train.shape == (500, 2)
    assert d.X_f is None
    # Values must match the grid solution at the sampled points.
    # Reconstruct indices from coordinates.
    xi = np.searchsorted(d.x.ravel(), d.X_u_train[:, 0])
    ti = np.searchsorted(d.t.ravel(), d.X_u_train[:, 1])
    np.testing.assert_allclose(d.u_train[:, 0], d.Exact_u[ti, xi],
                               atol=1e-10)


def test_burgers_cont_identification_noise():
    np.random.seed(1234)
    clean = pdata.burgers_cont_identification(N_u=500, noise=0.0)
    np.random.seed(1234)
    noisy = pdata.burgers_cont_identification(N_u=500, noise=0.01)
    delta = noisy.u_train - clean.u_train
    assert 0 < np.abs(delta).max() < 0.1
    np.testing.assert_allclose(delta.std(), 0.01 * clean.u_train.std(),
                               rtol=0.2)


def test_burgers_disc_inference_prep():
    np.random.seed(1234)
    lb, ub = np.array([-1.0]), np.array([1.0])
    d = pdata.burgers_disc_inference(N_n=50, q=8, lb=lb, ub=ub,
                                     idx_t_0=10, idx_t_1=90)
    assert d.x_0.shape == (50, 1) and d.u_0.shape == (50, 1)
    np.testing.assert_allclose(d.dt, 0.8)
    assert d.IRK_weights.shape == (9, 8)
    assert d.IRK_times.shape == (8,)
    np.testing.assert_array_equal(d.x_1, [[-1.0], [1.0]])
    assert d.u_star.shape == (256,)


def test_burgers_disc_identification_prep():
    np.random.seed(1234)
    d = pdata.burgers_disc_identification(N_0=30, N_1=40,
                                          idx_t_0=10, idx_t_1=90)
    assert d.x_0.shape == (30, 1) and d.x_1.shape == (40, 1)
    assert d.q == 81  # auto rule at dt=0.8
    assert d.IRK_alpha.shape == (81, 81)
    assert d.IRK_beta.shape == (1, 81)


def test_schrodinger_prep():
    np.random.seed(1234)
    d = pdata.schrodinger_inference(N_0=30, N_b=25, N_f=500)
    assert d.x0.shape == (30, 1) and d.tb.shape == (25, 1)
    assert d.X_f.shape == (500, 2)
    np.testing.assert_allclose(d.lb, [-5.0, 0.0])
    np.testing.assert_allclose(d.ub, [5.0, np.pi / 2])
    # Initial values match the dataset at t=0.
    xi = np.searchsorted(d.x.ravel(), d.x0[:, 0])
    np.testing.assert_allclose(d.u0[:, 0], d.Exact_u[xi, 0], atol=1e-10)
