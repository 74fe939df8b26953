"""Fused forward+backward training kernel vs the jax.grad oracle
(interpret mode on CPU; the compiled path runs on TPU in bench.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn.models import mlp
from pinn.ops import pallas_train
from pinn.problems import burgers

NU = 0.01 / np.pi


def _setup(layers, n, seed=0):
    dtype = jnp.float32
    params = mlp.init_mlp(jax.random.PRNGKey(seed), layers, dtype)
    lb = np.array([-1.0, 0.0], np.float32)
    ub = np.array([1.0, 1.0], np.float32)
    rng = np.random.RandomState(seed)
    X_f = jnp.asarray(lb + (ub - lb) * rng.rand(n, 2), dtype)
    return params, X_f, lb, ub


def _oracle_sse(params, X_f, lb, ub):
    f = burgers.residual_cont(params, X_f, jnp.asarray(lb), jnp.asarray(ub),
                              nu=NU)
    return jnp.sum(jnp.square(f))


@pytest.mark.parametrize("layers,n", [
    ([2, 20, 20, 20, 1], 300),       # ragged: exercises the pad mask
    ([2, 20, 20, 20, 20, 20, 20, 20, 20, 1], 2048),  # flagship depth
    ([2, 16, 1], 1024),              # single hidden layer
])
def test_fused_sse_value_matches_oracle(layers, n):
    params, X_f, lb, ub = _setup(layers, n)
    sse = pallas_train.make_burgers_sse(lb, ub, NU, interpret=True)
    got = float(sse(params, X_f))
    want = float(_oracle_sse(params, X_f, lb, ub))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("layers,n", [
    ([2, 20, 20, 20, 1], 300),
    ([2, 20, 20, 20, 20, 20, 20, 20, 20, 1], 2048),
    ([2, 16, 1], 1024),
])
def test_fused_sse_grad_matches_oracle(layers, n):
    params, X_f, lb, ub = _setup(layers, n)
    sse = pallas_train.make_burgers_sse(lb, ub, NU, interpret=True)
    g_fused = jax.grad(lambda p: sse(p, X_f))(params)
    g_oracle = jax.grad(lambda p: _oracle_sse(p, X_f, lb, ub))(params)
    for (gw1, gb1), (gw2, gb2) in zip(g_fused, g_oracle):
        scale = max(1e-3, float(jnp.max(jnp.abs(gw2))))
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=5e-4, atol=5e-6 * scale)
        np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                                   rtol=5e-4, atol=5e-6 * scale)


def test_fused_loss_trains():
    """The full fused loss is a drop-in for the Trainer loss_fn."""
    params, X_f, lb, ub = _setup([2, 20, 20, 1], 512)
    loss = pallas_train.make_burgers_loss(lb, ub, NU, interpret=True)
    rng = np.random.RandomState(3)
    batch = {"X_u": jnp.asarray(rng.rand(32, 2), jnp.float32),
             "u": jnp.asarray(rng.rand(32, 1), jnp.float32),
             "X_f": X_f}
    val, grads = jax.value_and_grad(loss)(params, batch)
    assert np.isfinite(float(val))
    # One SGD step decreases the loss.
    stepped = jax.tree_util.tree_map(lambda p, g: p - 1e-3 * g, params, grads)
    assert float(loss(stepped, batch)) < float(val)

    # And it matches the reference XLA loss value.
    want = burgers.loss_cont_inference(
        params, batch["X_u"], batch["u"], X_f,
        jnp.asarray(lb), jnp.asarray(ub), NU)
    np.testing.assert_allclose(float(val), float(want), rtol=1e-5)


def test_experiment_fused_residual_hp_matches_xla_path():
    """hp["fused_residual"] routes inf_cont_burgers through the fused
    kernel with the same training outcome as the XLA loss."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments"))
    import inf_cont_burgers

    hp = {"N_u": 50, "N_f": 1000, "layers": [2, 20, 20, 1],
          "tf_epochs": 20, "nt_epochs": 20, "log_frequency": 100}
    base = inf_cont_burgers.run(dict(hp))
    fused = inf_cont_burgers.run({**hp, "fused_residual": True})
    np.testing.assert_allclose(fused["error"], base["error"], rtol=1e-3)


@pytest.mark.parametrize("layers,n_u,n_f", [
    ([2, 20, 20, 20, 1], 32, 300),   # ragged tail: padding w=0 path
    ([2, 20, 20, 20, 20, 20, 20, 20, 20, 1], 100, 2048),
    ([2, 16, 1], 7, 1017),           # data+collocation straddle a tile
    # width-40 flagship capacity variant (probe P18): the kernel must
    # stay width-generic past the paper's 20.
    ([2, 40, 40, 40, 40, 40, 40, 40, 40, 1], 100, 1024),
])
def test_combined_train_loss_and_grad_match_oracle(layers, n_u, n_f):
    """The single-launch combined kernel (data term folded into the
    stream, grads computed in the custom_vjp forward) must reproduce
    the XLA loss AND its jax.grad to f32 accuracy."""
    params, X_f, lb, ub = _setup(layers, n_f)
    rng = np.random.RandomState(11)
    batch = {"X_u": jnp.asarray(rng.rand(n_u, 2), jnp.float32),
             "u": jnp.asarray(rng.rand(n_u, 1), jnp.float32),
             "X_f": X_f}
    loss = pallas_train.make_burgers_loss(lb, ub, NU, interpret=True)

    def oracle(p, b):
        return burgers.loss_cont_inference(
            p, b["X_u"], b["u"], b["X_f"], jnp.asarray(lb),
            jnp.asarray(ub), NU)

    val, grads = jax.value_and_grad(loss)(params, batch)
    want_val, want_grads = jax.value_and_grad(oracle)(params, batch)
    np.testing.assert_allclose(float(val), float(want_val), rtol=1e-5)
    for (gw1, gb1), (gw2, gb2) in zip(grads, want_grads):
        scale = max(1e-3, float(jnp.max(jnp.abs(gw2))))
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=5e-4, atol=5e-6 * scale)
        np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                                   rtol=5e-4, atol=5e-6 * scale)


def test_bf16_stream_loss_and_grad_direction():
    """bf16 streams + f32 accumulation: loss within bf16 tolerance of
    the oracle and gradients pointing the same way (cosine > 0.999) —
    warmup-grade precision by design."""
    layers = [2, 20, 20, 20, 20, 1]
    params, X_f, lb, ub = _setup(layers, 1024)
    rng = np.random.RandomState(11)
    batch = {"X_u": jnp.asarray(rng.rand(64, 2), jnp.float32),
             "u": jnp.asarray(rng.rand(64, 1), jnp.float32),
             "X_f": X_f}
    loss16 = pallas_train.make_burgers_loss(lb, ub, NU, interpret=True,
                                            stream_dtype="bfloat16")

    def oracle(p, b):
        return burgers.loss_cont_inference(
            p, b["X_u"], b["u"], b["X_f"], jnp.asarray(lb),
            jnp.asarray(ub), NU)

    val, grads = jax.value_and_grad(loss16)(params, batch)
    want_val, want_grads = jax.value_and_grad(oracle)(params, batch)
    assert val.dtype == jnp.float32
    np.testing.assert_allclose(float(val), float(want_val), rtol=3e-2)
    g1 = np.concatenate([np.asarray(a).ravel()
                         for wb in grads for a in wb])
    g2 = np.concatenate([np.asarray(a).ravel()
                         for wb in want_grads for a in wb])
    cos = float(g1 @ g2 / (np.linalg.norm(g1) * np.linalg.norm(g2)))
    assert cos > 0.999, cos
    assert abs(np.linalg.norm(g1) / np.linalg.norm(g2) - 1) < 0.05


def test_dot_precision_by_dtype():
    """_dot must never request the f32 6-pass algorithm on bf16 inputs:
    Mosaic rejects tpu.matmul with contract_precision<fp32> on bf16
    operands ("Bad lhs type" on v5e), so bf16 dots pin DEFAULT even when
    the experiments set jax_default_matmul_precision=highest, while f32
    dots keep the configured global precision."""
    a16 = jnp.zeros((8, 16), jnp.bfloat16)
    b16 = jnp.zeros((16, 8), jnp.bfloat16)
    a32, b32 = a16.astype(jnp.float32), b16.astype(jnp.float32)

    def precision_of(fn, *args):
        jaxpr = jax.make_jaxpr(fn)(*args)
        eqn, = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
        return eqn.params["precision"]

    with jax.default_matmul_precision("highest"):
        p16 = precision_of(pallas_train._dot, a16, b16)
        pmix = precision_of(pallas_train._dot, a32, b16)
        p32 = precision_of(pallas_train._dot, a32, b32)
    assert p16 == (jax.lax.Precision.DEFAULT, jax.lax.Precision.DEFAULT), p16
    assert pmix == (jax.lax.Precision.DEFAULT, jax.lax.Precision.DEFAULT), pmix
    assert p32 == (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST), p32


def test_dp_fused_loss_matches_unsharded():
    """shard_map composition (make_burgers_loss_dp): 8-device DP over
    the collocation axis reproduces the unsharded fused loss exactly
    (replicated data term, psum/D algebra) and its grads to f32
    summation noise; indivisible N_f is rejected up front."""
    from pinn.parallel import make_mesh
    layers = [2, 20, 20, 20, 1]
    params, X_f, lb, ub = _setup(layers, 2048)
    rng = np.random.RandomState(5)
    batch = {"X_u": jnp.asarray(rng.rand(100, 2), jnp.float32),
             "u": jnp.asarray(rng.rand(100, 1), jnp.float32),
             "X_f": X_f}
    mesh = make_mesh(8)
    ref = pallas_train.make_burgers_loss(lb, ub, NU, interpret=True)
    dp = pallas_train.make_burgers_loss_dp(lb, ub, NU, mesh,
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
        dp(params, {**batch, "X_f": X_f[:2047]})


# ---------------------------------------------------------------------------
# Fused identification kernel (trainable lambda1, exp(lambda2))
# ---------------------------------------------------------------------------

def _ide_setup(layers, n, seed=0, l1=0.8, logl2=-5.0):
    params, X, lb, ub = _setup(layers, n, seed)
    rng = np.random.RandomState(seed + 1)
    ide = burgers.IdeParams(
        net=params,
        lambda1=jnp.full((1,), l1, jnp.float32),
        log_lambda2=jnp.full((1,), logl2, jnp.float32))
    batch = {"X_u": X, "u": jnp.asarray(rng.rand(n, 1), jnp.float32)}
    return ide, batch, lb, ub


@pytest.mark.parametrize("layers,n", [
    ([2, 20, 20, 20, 1], 300),       # ragged: exercises the pad mask
    ([2, 20, 20, 20, 20, 20, 20, 20, 20, 1], 2048),  # flagship depth
    ([2, 16, 1], 1024),              # single hidden layer
])
def test_ide_loss_and_grads_match_oracle(layers, n):
    """Fused identification loss + ALL grads (net weights AND the two
    lambda trainables through the exp reparameterization) vs the
    jax.grad oracle of loss_cont_identification."""
    ide, batch, lb, ub = _ide_setup(layers, n)
    loss = pallas_train.make_burgers_ide_loss(lb, ub, interpret=True)

    def oracle(p, b):
        return burgers.loss_cont_identification(
            p, b["X_u"], b["u"], jnp.asarray(lb), jnp.asarray(ub))

    val, grads = jax.value_and_grad(loss)(ide, batch)
    want_val, want_grads = jax.value_and_grad(oracle)(ide, batch)
    np.testing.assert_allclose(float(val), float(want_val), rtol=1e-5)
    for (gw1, gb1), (gw2, gb2) in zip(grads.net, want_grads.net):
        scale = max(1e-3, float(jnp.max(jnp.abs(gw2))))
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=5e-4, atol=5e-6 * scale)
        np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                                   rtol=5e-4, atol=5e-6 * scale)
    np.testing.assert_allclose(float(grads.lambda1[0]),
                               float(want_grads.lambda1[0]), rtol=1e-4)
    np.testing.assert_allclose(float(grads.log_lambda2[0]),
                               float(want_grads.log_lambda2[0]), rtol=1e-4)


def test_ide_loss_lambda_values_enter_residual():
    """The SMEM lambda scalars must actually drive the residual: the
    fused loss evaluated at two different (l1, l2) pairs matches the
    oracle at each."""
    ide, batch, lb, ub = _ide_setup([2, 16, 1], 512)
    loss = pallas_train.make_burgers_ide_loss(lb, ub, interpret=True)
    for l1, logl2 in [(0.0, -6.0), (1.3, -4.0)]:
        p = ide._replace(lambda1=jnp.full((1,), l1, jnp.float32),
                         log_lambda2=jnp.full((1,), logl2, jnp.float32))
        want = burgers.loss_cont_identification(
            p, batch["X_u"], batch["u"], jnp.asarray(lb), jnp.asarray(ub))
        np.testing.assert_allclose(float(loss(p, batch)), float(want),
                                   rtol=1e-5)


def test_experiment_fused_ide_hp_matches_xla_path():
    """hp["fused_residual"] routes ide_cont_burgers through the fused
    identification kernel with the same training outcome."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments"))
    import ide_cont_burgers

    hp = {"N_u": 500, "layers": [2, 20, 20, 1],
          "tf_epochs": 20, "nt_epochs": 20, "log_frequency": 100}
    base = ide_cont_burgers.run(dict(hp))
    fused = ide_cont_burgers.run({**hp, "fused_residual": True})
    # lambda1 sits near 0 this early in training, so compare with an
    # absolute tolerance: f32 summation-order differences between the
    # two engines drift the 40-step trajectories by ~1e-4.
    np.testing.assert_allclose(fused["lambdas"], base["lambdas"],
                               rtol=1e-2, atol=5e-4)


def test_fused_loss_under_global_x64():
    """Regression: the mixed-precision Trainer (nt_vector_dtype=
    float64) enables jax_enable_x64 globally; pallas index maps then
    promote to i64 and Mosaic rejects the kernel unless the call traces
    with x64 pinned off (_x64_safe_jit).  Interpret mode checks the
    trace path; the compiled path is covered by the tpu tier."""
    with jax.enable_x64(True):
        params, X_f, lb, ub = _setup([2, 16, 1], 600)
        rng = np.random.RandomState(2)
        batch = {"X_u": jnp.asarray(rng.rand(16, 2), jnp.float32),
                 "u": jnp.asarray(rng.rand(16, 1), jnp.float32),
                 "X_f": X_f}
        loss = pallas_train.make_burgers_loss(lb, ub, NU, interpret=True)
        val, grads = jax.value_and_grad(loss)(params, batch)
        want = burgers.loss_cont_inference(
            params, batch["X_u"], batch["u"], X_f,
            jnp.asarray(lb), jnp.asarray(ub), NU)
        np.testing.assert_allclose(float(val), float(want), rtol=1e-5)
        assert all(np.isfinite(np.asarray(a)).all()
                   for wb in grads for a in wb)


def test_experiment_fused_bf16_warmup_matches_f32_warmup():
    """hp["tf_net_dtype"]="bfloat16" on the fused path: Adam optimizes
    the bf16-stream kernel (f32 master weights), L-BFGS refines on the
    exact f32 kernel — equal-schedule outcome must stay in the same
    ballpark as the all-f32 run (warmup-grade precision by design)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments"))
    import inf_cont_burgers

    hp = {"N_u": 50, "N_f": 1000, "layers": [2, 20, 20, 1],
          "tf_epochs": 30, "nt_epochs": 20, "log_frequency": 100,
          "fused_residual": True}
    base = inf_cont_burgers.run(dict(hp))
    bf16 = inf_cont_burgers.run({**hp, "tf_net_dtype": "bfloat16"})
    assert np.isfinite(bf16["error"])
    assert abs(bf16["error"] - base["error"]) < 0.5 * base["error"], \
        (bf16["error"], base["error"])
