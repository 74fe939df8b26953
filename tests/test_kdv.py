"""KdV (beyond-reference model family) tests.

Same three-layer strategy as the other discrete modes (SURVEY.md §4):
the spectral dataset generator is validated by self-convergence and
structural invariants (mass is conserved to round-off by construction,
momentum ∫u² — a genuine KdV invariant the integrator only preserves
to truncation order — to ~1e-11); the order-3 Taylor stream and the
identification stage maps are checked against ``jax.jacfwd`` oracles on
tiny nets; a training-free IRK contract test pushes EXACT spectral
stage values through both identification maps; and a tiny end-to-end
run must optimize.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pinn import irk
from pinn.models import mlp
from pinn.problems import kdv

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "experiments"))

from datagen.kdv_exact import kdv_etdrk4, kdv_invariants  # noqa: E402


# ---------------------------------------------------------------------------
# Dataset generator
# ---------------------------------------------------------------------------

def test_kdv_ic_and_soliton_growth():
    d = kdv_etdrk4(nx=256, nt=6, substeps=10, t_final=1.0)
    x = d["x"].flatten()
    np.testing.assert_allclose(d["uu"][:, 0], np.cos(np.pi * x), atol=1e-14)
    # The cosine steepens into a soliton train whose leading crest
    # overshoots the initial amplitude (measured peak ~2.3 at t=1).
    assert d["uu"][:, -1].max() > 1.8


def test_kdv_fourth_order_dt_convergence():
    ref = kdv_etdrk4(nx=256, nt=3, substeps=16, t_final=0.02)["uu"][:, -1]
    errs = [np.abs(kdv_etdrk4(nx=256, nt=3, substeps=s,
                              t_final=0.02)["uu"][:, -1] - ref).max()
            for s in (2, 4, 8)]
    # 4th order = /16 per halving; measured ~16x. Allow slack to /8.
    assert errs[1] < errs[0] / 8.0
    assert errs[2] < errs[1] / 8.0
    assert errs[2] < 1e-8


def test_kdv_invariants():
    # Full production resolution: at nx=256 the soliton train's spectrum
    # reaches the 2/3-dealiasing cutoff and momentum leaks (~2e-3);
    # at nx=512 with the production step both invariants hold to
    # integrator accuracy (substeps are per saved frame).
    d = kdv_etdrk4(nx=512, nt=201, substeps=20, t_final=1.0)
    m0, p0 = kdv_invariants(d["uu"][:, 0])
    m1, p1 = kdv_invariants(d["uu"][:, -1])
    assert abs(m1 - m0) < 1e-13         # exact (k=0 mode is inert)
    assert abs(p1 - p0) < 1e-9          # truncation-order conservation


# ---------------------------------------------------------------------------
# Training-free IRK identification contract
# ---------------------------------------------------------------------------

def test_ide_irk_maps_reproduce_snapshots_on_exact_stage_values():
    """Plug the EXACT solution at the Gauss stage times (with spectral
    U_x / U_xxx and the true lambdas) into both identification maps:
    every U_0 column must reproduce u(t0) and every U_1 column u(t1).
    Validates the tableau, the forward/backward sign conventions, and
    the N = l1 U U_x + l2 U_xxx orientation together; a flipped sign or
    transposed W fails at O(1)."""
    from datagen.kdv_exact import _etdrk4_coeffs

    nx, q, t0, dt = 256, 8, 0.2, 0.2
    l1, l2 = 1.0, 0.0025
    x = -1.0 + 2.0 * np.arange(nx) / nx
    k = 2.0 * np.pi * np.fft.fftfreq(nx, d=2.0 / nx)
    Lk = 1j * l2 * k ** 3
    dealias = np.abs(k) < (2.0 / 3.0) * np.abs(k).max()
    g = -0.5j * l1 * k * dealias

    def N(vhat):
        u_ = np.fft.ifft(vhat).real
        return g * np.fft.fft(u_ * u_)

    def integrate(u, t_span, n_steps):
        if t_span <= 0:
            return u
        v = np.fft.fft(u)
        E, E2, Q, f1, f2, f3 = _etdrk4_coeffs(Lk, t_span / n_steps,
                                              real=False)
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
    alpha, beta = tab_W[:-1, :], tab_W[-1:, :]
    u_t0 = integrate(np.cos(np.pi * x), t0, 200)
    u_t1 = integrate(u_t0, dt, 200)

    # March through the (sorted) stage times collecting exact values.
    times = np.asarray(c_nodes) * dt
    order = np.argsort(times)
    U = np.empty((nx, q))
    u, t_prev = u_t0, 0.0
    for idx in order:
        u = integrate(u, times[idx] - t_prev, 100)
        t_prev = times[idx]
        U[:, idx] = u

    U_x = np.stack([np.fft.ifft(1j * k * np.fft.fft(U[:, j])).real
                    for j in range(q)], axis=1)
    U_xxx = np.stack([np.fft.ifft((1j * k) ** 3 * np.fft.fft(U[:, j])).real
                      for j in range(q)], axis=1)
    F = l1 * U * U_x + l2 * U_xxx
    U_0 = U + dt * F @ alpha.T
    U_1 = U + dt * (-F) @ (beta - alpha).T

    # The exact solution satisfies the stage equations to the Gauss
    # STAGE order O(dt^{q+1}) (not the 2q quadrature order): 0.2^9 times
    # the dispersive derivative scale ~ 1e-6 (measured 1.4e-6). A sign
    # or tableau error would fail at O(1).
    d0 = np.abs(U_0 - u_t0[:, None]).max()
    d1 = np.abs(U_1 - u_t1[:, None]).max()
    assert d0 < 5e-6, f"U_0 map defect {d0:.2e}"
    assert d1 < 5e-6, f"U_1 map defect {d1:.2e}"


# ---------------------------------------------------------------------------
# Order-3 Taylor stream / stage-map oracles
# ---------------------------------------------------------------------------

def _third_deriv_oracle(params, x, lb, ub):
    """(U, U_x, U_xxx) of the q-output net via nested jacfwd."""
    def scalar_net(xs):
        return mlp.apply(params, xs[None, None], lb, ub)[0]

    U = mlp.apply(params, x, lb, ub)
    U_x = jax.vmap(jax.jacfwd(scalar_net))(x[:, 0])
    U_xxx = jax.vmap(jax.jacfwd(jax.jacfwd(jax.jacfwd(scalar_net))))(x[:, 0])
    return U, U_x, U_xxx


def _tiny_setup(q=5, seed=0):
    key = jax.random.PRNGKey(seed)
    params = mlp.init_mlp(key, [1, 11, 9, q], jnp.float64)
    lb = jnp.asarray([-1.0], jnp.float64)
    ub = jnp.asarray([1.0], jnp.float64)
    x = jnp.linspace(-0.8, 0.9, 7, dtype=jnp.float64)[:, None]
    return params, lb, ub, x


def test_stage_derivs3_matches_jacfwd_oracle():
    params, lb, ub, x = _tiny_setup()
    U, U_x, U_xxx = kdv._stage_derivs3(params, x, lb, ub)
    Uo, U_xo, U_xxxo = _third_deriv_oracle(params, x, lb, ub)
    np.testing.assert_allclose(U, Uo, rtol=1e-12)
    np.testing.assert_allclose(U_x, U_xo, rtol=1e-10)
    np.testing.assert_allclose(U_xxx, U_xxxo, rtol=1e-8)


def test_stage_maps_match_manual_formula():
    params, lb, ub, x = _tiny_setup(q=5)
    ide = kdv.init_ide_params(params, jnp.float64)
    ide = ide._replace(lambda1=jnp.asarray([0.7], jnp.float64),
                       log_lambda2=jnp.asarray([-5.5], jnp.float64))
    tab_W, _ = irk.irk_weights(5)
    alpha = jnp.asarray(tab_W[:-1, :], jnp.float64)
    beta = jnp.asarray(tab_W[-1:, :], jnp.float64)
    dt = 0.3

    U_0, U_1 = kdv.disc_ide_stage_maps(ide, x, lb, ub, dt, alpha, beta)

    U, U_x, U_xxx = _third_deriv_oracle(params, x, lb, ub)
    F = 0.7 * np.asarray(U) * np.asarray(U_x) \
        + np.exp(-5.5) * np.asarray(U_xxx)
    np.testing.assert_allclose(U_0, np.asarray(U) + dt * F @ np.asarray(alpha).T,
                               rtol=1e-8)
    np.testing.assert_allclose(
        U_1, np.asarray(U) + dt * (-F) @ (np.asarray(beta)
                                          - np.asarray(alpha)).T, rtol=1e-8)


def test_loss_grads_finite_and_loss_zero_on_consistent_targets():
    params, lb, ub, x = _tiny_setup(q=5)
    ide = kdv.init_ide_params(params, jnp.float64)
    tab_W, _ = irk.irk_weights(5)
    alpha = jnp.asarray(tab_W[:-1, :], jnp.float64)
    beta = jnp.asarray(tab_W[-1:, :], jnp.float64)
    dt = 0.3
    U_0, U_1 = kdv.disc_ide_stage_maps(ide, x, lb, ub, dt, alpha, beta)

    loss = kdv.loss_disc_identification(ide, x, U_0, x, U_1,
                                        lb, ub, dt, alpha, beta)
    assert float(loss) < 1e-20

    grads = jax.grad(kdv.loss_disc_identification)(
        ide, x, U_0 + 0.1, x, U_1 - 0.1, lb, ub, dt, alpha, beta)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.all(np.isfinite(np.asarray(flat)))
    assert float(jnp.abs(flat).max()) > 0.0


# ---------------------------------------------------------------------------
# End-to-end
# ---------------------------------------------------------------------------

def test_e2e_kdv_tiny():
    import ide_disc_kdv as exp
    r = exp.run({"tf_epochs": 15, "nt_epochs": 15, "q": 6,
                 "layers": [1, 12, 12, 0], "N_0": 40, "N_1": 40,
                 "log_frequency": 100}, plot=False)
    l1, l2 = r["lambdas"]
    assert np.isfinite(l1) and np.isfinite(l2) and l2 > 0
    assert np.isfinite(r["error"])
    assert r["U_0_pred"].shape == (512, 6)
