"""Allen–Cahn (beyond-reference model family) tests.

Three layers, mirroring the Burgers discrete-mode strategy
(SURVEY.md §4): the spectral dataset generator is validated by
self-convergence and a structural invariant (monotone Ginzburg–Landau
energy decay — Allen–Cahn is its L2 gradient flow); the stage
derivative / IRK map / periodic-BC pieces are checked against
``jax.jacfwd`` oracles on tiny nets; and a tiny end-to-end run must
optimize.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn import irk
from pinn.models import mlp
from pinn.problems import allencahn

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "experiments"))

from datagen.allencahn_exact import (allencahn_etdrk4,  # noqa: E402
                                     ginzburg_landau_energy)


# ---------------------------------------------------------------------------
# Dataset generator
# ---------------------------------------------------------------------------

def test_etdrk4_ic_and_range():
    d = allencahn_etdrk4(nx=128, nt=6, substeps=2)
    x = d["x"].flatten()
    np.testing.assert_allclose(d["uu"][:, 0], x ** 2 * np.cos(np.pi * x),
                               atol=1e-14)
    # Phase separation keeps |u| <= ~1 (maximum principle up to O(dt)).
    assert np.abs(d["uu"]).max() < 1.0 + 1e-6


def test_etdrk4_fourth_order_dt_convergence():
    ref = allencahn_etdrk4(nx=128, nt=6, substeps=16)["uu"][:, -1]
    e2 = np.abs(allencahn_etdrk4(nx=128, nt=6, substeps=2)["uu"][:, -1]
                - ref).max()
    e4 = np.abs(allencahn_etdrk4(nx=128, nt=6, substeps=4)["uu"][:, -1]
                - ref).max()
    e8 = np.abs(allencahn_etdrk4(nx=128, nt=6, substeps=8)["uu"][:, -1]
                - ref).max()
    # 4th order = /16 per halving; measured ~21-26x. Allow slack to /8.
    assert e4 < e2 / 8.0
    assert e8 < e4 / 8.0
    assert e8 < 1e-4


def test_etdrk4_energy_decay():
    d = allencahn_etdrk4(nx=256, nt=21, substeps=2)
    E = [ginzburg_landau_energy(d["uu"][:, j]) for j in range(21)]
    assert all(E[j + 1] <= E[j] + 1e-12 for j in range(20))
    assert E[-1] < E[0]


def test_irk_map_reproduces_u0_on_exact_stage_values():
    """Training-free end-to-end check of the discrete-time contract:
    plug the EXACT solution at the Gauss stage times into the backward
    IRK map U0 = [U; u1] + dt*F@W^T (F = 5U^3-5U-1e-4*U_xx, spectral
    U_xx) — every column must reproduce u(t0) to quadrature precision.
    Validates the tableau, the sign conventions, and the dataset
    conventions together; a flipped sign or transposed W fails at O(1).
    """
    from datagen.allencahn_exact import _etdrk4_coeffs

    nx, q, t0, dt = 128, 8, 0.1, 0.1
    x = -1.0 + 2.0 * np.arange(nx) / nx
    k = 2.0 * np.pi * np.fft.fftfreq(nx, d=2.0 / nx)
    Lk = -1e-4 * k ** 2 + 5.0

    def N(vhat):
        return -5.0 * np.fft.fft(np.fft.ifft(vhat).real ** 3)

    def integrate(u, t_span, n_steps):
        v = np.fft.fft(u)
        h = t_span / n_steps
        E, E2, Q, f1, f2, f3 = _etdrk4_coeffs(Lk, h)
        for _ in range(n_steps):
            Nv = N(v)
            a = E2 * v + Q * Nv
            Na = N(a)
            b = E2 * v + Q * Na
            Nb = N(b)
            c = E2 * a + Q * (2.0 * Nb - Nv)
            Nc = N(c)
            v = E * v + f1 * Nv + 2.0 * f2 * (Na + Nb) + f3 * Nc
        return np.fft.ifft(v).real

    tab_W, c_nodes = irk.irk_weights(q)
    u_t0 = integrate(x ** 2 * np.cos(np.pi * x), t0, 200)
    # March through the (sorted) stage times collecting exact values.
    times = np.concatenate([c_nodes * dt, [dt]])
    order = np.argsort(times)
    U_cols = np.empty((nx, q + 1))
    u, t_prev = u_t0, 0.0
    for idx in order:
        u = integrate(u, times[idx] - t_prev, 50)
        t_prev = times[idx]
        U_cols[:, idx] = u

    U, u1 = U_cols[:, :q], U_cols[:, q:]
    U_xx = np.stack([np.fft.ifft(-(k ** 2) * np.fft.fft(U[:, j])).real
                     for j in range(q)], axis=1)
    F = 5.0 * (U ** 3 - U) - 1e-4 * U_xx
    U0_pred = np.concatenate([U, u1], axis=1) + dt * F @ tab_W.T

    defect = np.abs(U0_pred - u_t0[:, None]).max()
    assert defect < 1e-7, f"IRK map defect {defect:.2e}"


# ---------------------------------------------------------------------------
# Stage map / loss oracles
# ---------------------------------------------------------------------------

def _second_deriv_oracle(params, x, lb, ub):
    """(U, U_x, U_xx) of the (q+1)-output net via nested jacfwd."""
    def scalar_net(xs):
        return mlp.apply(params, xs[None, None], lb, ub)[0]

    U = mlp.apply(params, x, lb, ub)
    U_x = jax.vmap(jax.jacfwd(scalar_net))(x[:, 0])
    U_xx = jax.vmap(jax.jacfwd(jax.jacfwd(scalar_net)))(x[:, 0])
    return U, U_x, U_xx


def test_u0_map_matches_jacfwd_oracle():
    q = 3
    key = jax.random.PRNGKey(0)
    params = mlp.init_mlp(key, [1, 8, q + 1], jnp.float64)
    lb, ub = jnp.array([-1.0]), jnp.array([1.0])
    x = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (7, 1)))
    W, _ = irk.irk_weights(q)
    W = jnp.asarray(W, jnp.float64)
    dt = 0.8

    got = allencahn.u0_pred_disc_inference(params, x, lb, ub, dt, W)

    U1, _, U1_xx = _second_deriv_oracle(params, x, lb, ub)
    U, U_xx = U1[:, :-1], U1_xx[:, :-1]
    F = 5.0 * (U ** 3 - U) - 1e-4 * U_xx
    expected = U1 + dt * F @ W.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-10, atol=1e-12)


def test_periodic_bc_terms_match_oracle():
    q = 4
    params = mlp.init_mlp(jax.random.PRNGKey(3), [1, 6, q + 1], jnp.float64)
    lb, ub = jnp.array([-1.0]), jnp.array([1.0])
    x_bnd = jnp.array([[-1.0], [1.0]])

    gap_u, gap_ux = allencahn.periodic_bc_terms(params, x_bnd, lb, ub)

    U, U_x, _ = _second_deriv_oracle(params, x_bnd, lb, ub)
    np.testing.assert_allclose(np.asarray(gap_u),
                               np.asarray(U[0] - U[1]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gap_ux),
                               np.asarray(U_x[0] - U_x[1]),
                               rtol=1e-10, atol=1e-12)


def test_loss_zero_for_consistent_targets():
    """If u_0 is set to the net's own IRK image and the net is exactly
    periodic across the boundary pair, the loss must vanish."""
    q = 2
    params = mlp.init_mlp(jax.random.PRNGKey(5), [1, 5, q + 1], jnp.float64)
    lb, ub = jnp.array([-1.0]), jnp.array([1.0])
    x = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (5, 1)))
    W = jnp.asarray(irk.irk_weights(q)[0], jnp.float64)
    u0 = allencahn.u0_pred_disc_inference(params, x, lb, ub, 0.8, W)
    # Periodic gap is generally nonzero for a random net, so measure the
    # data term alone first:
    loss = allencahn.loss_disc_inference(params, x, u0, jnp.array([[-1.0],
                                                                   [1.0]]),
                                         lb, ub, 0.8, W)
    gap_u, gap_ux = allencahn.periodic_bc_terms(
        params, jnp.array([[-1.0], [1.0]]), lb, ub)
    expected_bc = float(jnp.sum(gap_u ** 2) + jnp.sum(gap_ux ** 2))
    assert float(loss) == pytest.approx(expected_bc, rel=1e-9)


# ---------------------------------------------------------------------------
# End-to-end (tiny schedule)
# ---------------------------------------------------------------------------

def test_e2e_allencahn_tiny():
    import inf_disc_allencahn as ac
    hp = {"tf_epochs": 15, "nt_epochs": 25, "q": 8,
          "layers": [1, 16, 9], "N_n": 40, "nt_ncorr": 10,
          "log_frequency": 1000, "dtype": "float64"}
    r = ac.run(hp)
    assert np.isfinite(r["error"])
    # Tiny schedule: only assert real optimization happened.
    assert r["error"] < 1.5
    assert r["u_1_pred"].shape == (512,)


# ---------------------------------------------------------------------------
# ETDRK4 phi-coefficients: contour mean vs exact phi functions
# ---------------------------------------------------------------------------

def _exact_coeffs(Lk, dt):
    """phi-expression closed forms evaluated in 50-digit mpmath — the
    oracle the contour means must reproduce for ANY complex Lk."""
    import mpmath as mp
    mp.mp.dps = 50
    rows = []
    for lk in Lk:
        z = mp.mpc(complex(dt * lk))
        ez = mp.exp(z)
        Q = dt * (mp.exp(z / 2) - 1) / z
        f1 = dt * (-4 - z + ez * (4 - 3 * z + z ** 2)) / z ** 3
        f2 = dt * (2 + z + ez * (-2 + z)) / z ** 3
        f3 = dt * (-4 - 3 * z - z ** 2 + ez * (4 - z)) / z ** 3
        rows.append([complex(v) for v in (Q, f1, f2, f3)])
    return np.array(rows)


@pytest.mark.parametrize("Lk", [
    np.array([1e-6 + 2.0j, -1.0 + 5.0j, 0.3 - 0.2j, 2.5 + 0.0j]),
    np.array([1j * (2 * np.pi * k) ** 3 for k in (1e-4, 0.5, 2.0)]),
])
def test_etdrk4_complex_contour_matches_exact_phi(Lk):
    """ADVICE round-3 regression: real=False must use the FULL circle of
    roots of unity; the old half-circle carried ~1e-2 coefficient errors
    for Lk with nonzero real part (silently corrupting e.g. complex
    Ginzburg–Landau, while KdV's purely-imaginary Lk cancelled them)."""
    from datagen.allencahn_exact import _etdrk4_coeffs
    dt = 0.4
    _, _, Q, f1, f2, f3 = _etdrk4_coeffs(Lk, dt, real=False)
    exact = _exact_coeffs(Lk, dt)
    got = np.stack([Q, f1, f2, f3], axis=1)
    assert np.max(np.abs(got - exact)) < 1e-12


def test_etdrk4_real_halfcircle_matches_exact_phi():
    """The real=True half-circle path stays exact for real Lk
    (conjugate symmetry): guard it against regressions too."""
    from datagen.allencahn_exact import _etdrk4_coeffs
    Lk = np.array([-4.0, -1e-7, 0.5, 3.0])
    dt = 0.25
    _, _, Q, f1, f2, f3 = _etdrk4_coeffs(Lk, dt, real=True)
    exact = _exact_coeffs(Lk, dt).real
    got = np.stack([Q, f1, f2, f3], axis=1)
    assert np.max(np.abs(got - exact)) < 1e-12
