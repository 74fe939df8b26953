"""Fused Schrödinger residual kernel vs the jax.grad oracle
(interpret mode on CPU; the compiled path runs on TPU — SCALING.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn.models import mlp
from pinn.ops import pallas_schrodinger
from pinn.problems import schrodinger as sprob

LB = np.array([-5.0, 0.0], np.float32)
UB = np.array([5.0, np.pi / 2], np.float32)


def _setup(layers, n, seed=0):
    dtype = jnp.float32
    params = mlp.init_mlp(jax.random.PRNGKey(seed), layers, dtype)
    rng = np.random.RandomState(seed)
    X_f = jnp.asarray(LB + (UB - LB) * rng.rand(n, 2), dtype)
    return params, X_f


def _oracle_sse(params, X_f):
    f_u, f_v = sprob.residual(params, X_f, jnp.asarray(LB), jnp.asarray(UB))
    return jnp.sum(jnp.square(f_u)) + jnp.sum(jnp.square(f_v))


@pytest.mark.parametrize("layers,n", [
    ([2, 100, 100, 100, 100, 2], 512),   # flagship 4x100 shape
    ([2, 100, 100, 100, 100, 2], 300),   # ragged: pad-mask path
    ([2, 32, 2], 512),                   # single hidden layer
])
def test_fused_schrodinger_sse_value_matches_oracle(layers, n):
    params, X_f = _setup(layers, n)
    sse = pallas_schrodinger.make_schrodinger_sse(LB, UB, interpret=True)
    got = float(sse(params, X_f))
    want = float(_oracle_sse(params, X_f))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("layers,n", [
    ([2, 100, 100, 100, 100, 2], 512),
    ([2, 100, 100, 100, 100, 2], 300),
    ([2, 32, 2], 512),
])
def test_fused_schrodinger_grad_matches_oracle(layers, n):
    params, X_f = _setup(layers, n)
    sse = pallas_schrodinger.make_schrodinger_sse(LB, UB, interpret=True)
    g_fused = jax.grad(lambda p: sse(p, X_f))(params)
    g_oracle = jax.grad(lambda p: _oracle_sse(p, X_f))(params)
    for (gw1, gb1), (gw2, gb2) in zip(g_fused, g_oracle):
        scale = max(1e-3, float(jnp.max(jnp.abs(gw2))))
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=5e-4, atol=5e-6 * scale)
        np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                                   rtol=5e-4, atol=5e-6 * scale)


def test_fused_schrodinger_full_loss_matches_xla():
    """make_schrodinger_loss == the XLA loss (value and one SGD step)."""
    params, X_f = _setup([2, 40, 40, 2], 512)
    rng = np.random.RandomState(5)
    n0, nb = 20, 15
    x0 = LB[0] + (UB[0] - LB[0]) * rng.rand(n0, 1)
    X0 = jnp.asarray(np.hstack([x0, np.zeros((n0, 1))]), jnp.float32)
    H0 = jnp.asarray(rng.rand(n0, 2), jnp.float32)
    tb = rng.rand(nb, 1) * (UB[1] - LB[1])
    X_lb = jnp.asarray(np.hstack([np.full((nb, 1), LB[0]), tb]), jnp.float32)
    X_ub = jnp.asarray(np.hstack([np.full((nb, 1), UB[0]), tb]), jnp.float32)
    batch = {"X0": X0, "H0": H0, "X_lb": X_lb, "X_ub": X_ub, "X_f": X_f}

    loss = pallas_schrodinger.make_schrodinger_loss(LB, UB, interpret=True)
    val, grads = jax.value_and_grad(loss)(params, batch)

    def xla_loss(p, b):
        return sprob.loss(p, b["X0"], b["H0"], b["X_lb"], b["X_ub"],
                          b["X_f"], jnp.asarray(LB), jnp.asarray(UB))

    want_val, want_grads = jax.value_and_grad(xla_loss)(params, batch)
    np.testing.assert_allclose(float(val), float(want_val), rtol=1e-5)
    for (gw1, gb1), (gw2, gb2) in zip(grads, want_grads):
        scale = max(1e-3, float(jnp.max(jnp.abs(gw2))))
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=5e-4, atol=5e-6 * scale)
        np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                                   rtol=5e-4, atol=5e-6 * scale)


def test_experiment_fused_residual_hp_matches_xla_path():
    """hp["fused_residual"] routes inf_cont_schrodinger through the
    fused kernel with the same training outcome as the XLA loss."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments"))
    import inf_cont_schrodinger

    hp = {"N_0": 30, "N_b": 30, "N_f": 600,
          "layers": [2, 40, 40, 2], "tf_epochs": 20, "nt_epochs": 10,
          "log_frequency": 100}
    base = inf_cont_schrodinger.run(dict(hp))
    fused = inf_cont_schrodinger.run({**hp, "fused_residual": True})
    np.testing.assert_allclose(fused["error"], base["error"], rtol=1e-3)


def test_bf16_stream_sse_and_grad_direction():
    """bf16 streams + f32 accumulation: SSE within bf16 tolerance of
    the oracle, gradient cosine > 0.999 (warmup-grade by design)."""
    params, X_f = _setup([2, 100, 100, 100, 100, 2], 512)
    sse16 = pallas_schrodinger.make_schrodinger_sse(
        LB, UB, interpret=True, stream_dtype="bfloat16")
    val = float(sse16(params, X_f))
    want = float(_oracle_sse(params, X_f))
    np.testing.assert_allclose(val, want, rtol=3e-2)
    g_fused = jax.grad(lambda p: sse16(p, X_f))(params)
    g_oracle = jax.grad(lambda p: _oracle_sse(p, X_f))(params)
    g1 = np.concatenate([np.asarray(a).ravel()
                         for wb in g_fused for a in wb])
    g2 = np.concatenate([np.asarray(a).ravel()
                         for wb in g_oracle for a in wb])
    cos = float(g1 @ g2 / (np.linalg.norm(g1) * np.linalg.norm(g2)))
    assert cos > 0.999, cos
    assert abs(np.linalg.norm(g1) / np.linalg.norm(g2) - 1) < 0.05


def test_dp_fused_loss_matches_unsharded():
    """shard_map composition (make_schrodinger_loss_dp): 8-device DP
    over the collocation axis reproduces the unsharded fused loss
    (replicated IC/BC terms, psum/D algebra) and its grads to f32
    summation noise; indivisible N_f is rejected up front."""
    from pinn.parallel import make_mesh
    params, X_f = _setup([2, 40, 40, 2], 1024)
    rng = np.random.RandomState(7)
    n0, nb = 20, 15
    x0 = LB[0] + (UB[0] - LB[0]) * rng.rand(n0, 1)
    tb = rng.rand(nb, 1) * (UB[1] - LB[1])
    batch = {
        "X0": jnp.asarray(np.hstack([x0, np.zeros((n0, 1))]), jnp.float32),
        "H0": jnp.asarray(rng.rand(n0, 2), jnp.float32),
        "X_lb": jnp.asarray(np.hstack([np.full((nb, 1), LB[0]), tb]),
                            jnp.float32),
        "X_ub": jnp.asarray(np.hstack([np.full((nb, 1), UB[0]), tb]),
                            jnp.float32),
        "X_f": X_f,
    }
    mesh = make_mesh(8)
    ref = pallas_schrodinger.make_schrodinger_loss(LB, UB, interpret=True)
    dp = pallas_schrodinger.make_schrodinger_loss_dp(LB, UB, mesh,
                                                     interpret=True)
    v1, g1 = jax.value_and_grad(ref)(params, batch)
    v2, g2 = jax.value_and_grad(dp)(params, batch)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    f1 = np.concatenate([np.asarray(a).ravel()
                         for a in jax.tree.leaves(g1)])
    f2 = np.concatenate([np.asarray(a).ravel()
                         for a in jax.tree.leaves(g2)])
    np.testing.assert_allclose(f1, f2, rtol=1e-3, atol=1e-6)

    with pytest.raises(ValueError, match="must divide the mesh"):
        dp(params, {**batch, "X_f": X_f[:1023]})
