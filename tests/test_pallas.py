"""Pallas fused residual kernel vs the JAX Taylor engine (interpret
mode on CPU; the real-TPU check runs in bench/experiments)."""

import jax
import jax.numpy as jnp
import numpy as np

from pinn.models import mlp
from pinn.ops import pallas_residual
from pinn.problems import burgers


def test_fused_residual_matches_taylor_engine(rng):
    dtype = jnp.float32
    params = mlp.init_mlp(rng, [2, 20, 20, 20, 1], dtype)
    lb = jnp.array([-1.0, 0.0], dtype)
    ub = jnp.array([1.0, 1.0], dtype)
    X = jax.random.uniform(jax.random.PRNGKey(1), (700, 2), dtype)
    nu = 0.01 / np.pi

    ref = burgers.residual_cont(params, X, lb, ub, nu=nu)
    out = pallas_residual.burgers_residual(params, X, lb, ub, nu,
                                           interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)


def test_fused_residual_tile_exact_multiple(rng):
    dtype = jnp.float32
    params = mlp.init_mlp(rng, [2, 20, 1], dtype)
    lb = jnp.array([-1.0, 0.0], dtype)
    ub = jnp.array([1.0, 1.0], dtype)
    X = jax.random.uniform(jax.random.PRNGKey(2), (1024, 2), dtype)
    ref = burgers.residual_cont(params, X, lb, ub, nu=0.01)
    out = pallas_residual.burgers_residual(params, X, lb, ub, 0.01,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)


def test_fused_residual_fmajor_matches(rng):
    dtype = jnp.float32
    params = mlp.init_mlp(rng, [2, 20, 20, 1], dtype)
    lb = jnp.array([-1.0, 0.0], dtype)
    ub = jnp.array([1.0, 1.0], dtype)
    X = jax.random.uniform(jax.random.PRNGKey(3), (700, 2), dtype)
    ref = burgers.residual_cont(params, X, lb, ub, nu=0.003)
    out = pallas_residual.burgers_residual_fmajor(params, X, lb, ub, 0.003,
                                                  interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)


def test_fused_schrodinger_residual_matches(rng):
    import numpy as np
    from pinn.problems import schrodinger
    dtype = jnp.float32
    params = mlp.init_mlp(rng, [2, 32, 32, 2], dtype)
    lb = jnp.array([-5.0, 0.0], dtype)
    ub = jnp.array([5.0, np.pi / 2], dtype)
    X = jax.random.uniform(jax.random.PRNGKey(4), (600, 2), dtype,
                           minval=-1.0, maxval=1.0)
    fu_ref, fv_ref = schrodinger.residual(params, X, lb, ub)
    fu, fv = pallas_residual.schrodinger_residual(params, X, lb, ub,
                                                  interpret=True)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(fv_ref),
                               rtol=2e-4, atol=2e-6)
