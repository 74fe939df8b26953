"""Derivative engine tests: fused Taylor propagation vs jvp oracles vs
analytic closed forms (test strategy per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn.models import mlp
from pinn.ops import diff

LB = jnp.array([-1.0, 0.0])
UB = jnp.array([1.0, 1.0])


def _net(rng, layers=(2, 16, 16, 1), dtype=jnp.float64):
    return mlp.init_mlp(rng, list(layers), dtype=dtype)


def test_apply_shapes_and_normalization(rng):
    p = _net(rng)
    X = jnp.array([[-1.0, 0.0], [1.0, 1.0]])
    out = mlp.apply(p, X, LB, UB)
    assert out.shape == (2, 1)
    z = mlp.normalize(X, LB, UB)
    np.testing.assert_allclose(np.asarray(z), [[-1, -1], [1, 1]], atol=1e-12)


def test_glorot_init_stats(rng):
    p = mlp.init_mlp(rng, [100, 200, 1], dtype=jnp.float32)
    w0 = np.asarray(p[0][0])
    expected_std = np.sqrt(2.0 / (100 + 200))
    assert abs(w0.std() - expected_std) < 0.1 * expected_std
    assert abs(w0.mean()) < 3 * expected_std / np.sqrt(w0.size)
    np.testing.assert_array_equal(np.asarray(p[0][1]), 0.0)


def test_taylor_apply_matches_jvp_oracle(rng):
    p = _net(rng, (2, 16, 16, 3))
    X = jax.random.uniform(jax.random.PRNGKey(7), (37, 2), dtype=jnp.float64,
                           minval=-1.0, maxval=1.0)
    vx = jnp.array([1.0, 0.0])
    vt = jnp.array([0.0, 1.0])

    out = mlp.taylor_apply(p, X, LB, UB, vx, vt)

    def f(x):
        return mlp.apply(p, x, LB, UB)

    value, dx, dxx, dt = diff.space_time_derivs(f, X, vx, vt)
    np.testing.assert_allclose(np.asarray(out.value), np.asarray(value), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out.d1), np.asarray(dx), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.d11), np.asarray(dxx), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.d2), np.asarray(dt), rtol=1e-9, atol=1e-12)


def test_taylor_apply_matches_jacfwd_hessian(rng):
    """Cross-check against dense jacfwd/hessian on a tiny net."""
    p = _net(rng, (2, 8, 1))
    x0 = jnp.array([0.3, 0.7], dtype=jnp.float64)

    def f_point(x):
        return mlp.apply(p, x[None, :], LB, UB)[0, 0]

    grad = jax.grad(f_point)(x0)
    hess = jax.hessian(f_point)(x0)

    out = mlp.taylor_apply(p, x0[None, :], LB, UB,
                           jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(float(out.d1[0, 0]), float(grad[0]), rtol=1e-9)
    np.testing.assert_allclose(float(out.d2[0, 0]), float(grad[1]), rtol=1e-9)
    np.testing.assert_allclose(float(out.d11[0, 0]), float(hess[0, 0]), rtol=1e-8)


def test_diff_analytic_closed_form():
    """Oracle sanity on sin: d/dx sin(2x+3t) etc."""
    def f(X):
        return jnp.sin(2.0 * X[:, 0:1] + 3.0 * X[:, 1:2])

    X = jnp.array([[0.1, 0.2], [0.5, -0.3]], dtype=jnp.float64)
    phase = 2 * X[:, 0:1] + 3 * X[:, 1:2]
    value, dx, dxx, dt = diff.space_time_derivs(
        f, X, jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(value), np.asarray(jnp.sin(phase)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(2 * jnp.cos(phase)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dxx), np.asarray(-4 * jnp.sin(phase)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(3 * jnp.cos(phase)), rtol=1e-12)


def test_taylor_apply_1d_input_multi_output(rng):
    """Discrete-time path: x-only input, q+1 outputs — one pass gives the
    whole Jacobian column (replaces reference dummy-vjp trick,
    1d-burgers/inf_disc_burgers.py:74-80)."""
    q = 7
    p = mlp.init_mlp(rng, [1, 10, q + 1], dtype=jnp.float64)
    lb, ub = jnp.array([-1.0]), jnp.array([1.0])
    x = jnp.linspace(-0.9, 0.9, 11, dtype=jnp.float64)[:, None]

    out = mlp.taylor_apply(p, x, lb, ub, jnp.array([1.0]))
    assert out.value.shape == (11, q + 1)
    assert out.d2 is None

    jac = jax.vmap(jax.jacfwd(lambda xx: mlp.apply(p, xx[None], lb, ub)[0]))(x)
    np.testing.assert_allclose(np.asarray(out.d1), np.asarray(jac[:, :, 0]), rtol=1e-9)


def test_taylor_apply_first_order_only(rng):
    p = _net(rng)
    X = jnp.zeros((4, 2), dtype=jnp.float64)
    out = mlp.taylor_apply(p, X, LB, UB, jnp.array([1.0, 0.0]), order=1)
    assert out.d11 is None and out.d2 is None
    assert out.d1.shape == (4, 1)


def test_outer_grad_through_taylor(rng):
    """Reverse-mode loss gradient through the forward Taylor streams —
    the 3rd-order composition the training step relies on."""
    p = _net(rng, (2, 8, 1))
    X = jax.random.normal(jax.random.PRNGKey(3), (5, 2), dtype=jnp.float64) * 0.3

    def loss_taylor(p_):
        out = mlp.taylor_apply(p_, X, LB, UB, jnp.array([1.0, 0.0]),
                               jnp.array([0.0, 1.0]))
        r = out.d2 + out.value * out.d1 - 0.1 * out.d11
        return jnp.mean(r ** 2)

    def loss_oracle(p_):
        def f(x):
            return mlp.apply(p_, x, LB, UB)
        value, dx, dxx, dt = diff.space_time_derivs(
            f, X, jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))
        r = dt + value * dx - 0.1 * dxx
        return jnp.mean(r ** 2)

    g1 = jax.grad(loss_taylor)(p)
    g2 = jax.grad(loss_oracle)(p)
    for (gw1, gb1), (gw2, gb2) in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-7, atol=1e-12)
        np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2), rtol=1e-7, atol=1e-12)


def test_taylor_apply_order3_matches_jvp3_oracle(rng):
    """taylor_apply(order=3)'s Faà-di-Bruno stream vs diff.directional3
    (jvp-over-jvp-over-jvp) on a 1-D-input multi-output net — the KdV
    u_xxx configuration."""
    p = _net(rng, (1, 14, 10, 4))
    lb, ub = jnp.array([-1.0]), jnp.array([1.0])
    X = jnp.linspace(-0.9, 0.95, 23, dtype=jnp.float64)[:, None]
    v = jnp.array([1.0], dtype=jnp.float64)

    out = mlp.taylor_apply(p, X, lb, ub, v, order=3)

    def f(x):
        return mlp.apply(p, x, lb, ub)

    value, d1, d11, d111 = diff.directional3(f, X, v)
    np.testing.assert_allclose(np.asarray(out.value), np.asarray(value),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.d1), np.asarray(d1),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out.d11), np.asarray(d11),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out.d111), np.asarray(d111),
                               rtol=1e-8)
