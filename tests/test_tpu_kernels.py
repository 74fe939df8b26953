"""Real-TPU Mosaic compile tier for the fused Pallas kernels.

The fast tier runs the kernels in interpret mode, which validates the
math but never reaches Mosaic — the lowering layer that rejected bf16
dots inheriting ``jax_default_matmul_precision="highest"``
("Bad lhs type" on v5e).  These tests compile each kernel variant on
the actual chip under the experiments' global precision setting and
check values/gradients against the XLA oracle.

Opt-in (one TPU process at a time on this host):

    PINN_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_kernels.py

Reference semantics under test: continuous Burgers loss
(1d-burgers/inf_cont_burgers.py:90-99) and Schrödinger loss
(1dcomplex-schrodinger/inf_cont_schrodinger.py:95-128).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn.models import mlp
from pinn.ops.pallas_train import make_burgers_loss
from pinn.ops.pallas_schrodinger import make_schrodinger_loss
from pinn.problems import burgers, schrodinger

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                       reason="needs a real TPU backend"),
]

NU = 0.01 / np.pi


@pytest.fixture(scope="module", autouse=True)
def _experiment_precision():
    """The experiments force full-f32 matmul precision globally; the
    kernels must compile under it (incl. the bf16-stream variants)."""
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


def _burgers_setup(n_f=2048, n_u=96, seed=0, layers=None):
    layers = layers or [2, 20, 20, 20, 20, 1]
    params = mlp.init_mlp(jax.random.PRNGKey(seed), layers, jnp.float32)
    lb = np.array([-1.0, 0.0], np.float32)
    ub = np.array([1.0, 1.0], np.float32)
    rng = np.random.RandomState(seed)
    batch = {
        "X_u": jnp.asarray(lb + (ub - lb) * rng.rand(n_u, 2), jnp.float32),
        "u": jnp.asarray(rng.rand(n_u, 1), jnp.float32),
        "X_f": jnp.asarray(lb + (ub - lb) * rng.rand(n_f, 2), jnp.float32),
    }

    def oracle(p, b):
        return burgers.loss_cont_inference(
            p, b["X_u"], b["u"], b["X_f"], jnp.asarray(lb),
            jnp.asarray(ub), NU)

    return layers, params, lb, ub, batch, oracle


def _flat(tree):
    return np.concatenate([np.asarray(a).ravel()
                           for a in jax.tree.leaves(tree)])


@pytest.mark.parametrize("stream", [None, "bfloat16"])
def test_burgers_fused_compiles_on_tpu(stream):
    _, params, lb, ub, batch, oracle = _burgers_setup()
    loss = make_burgers_loss(lb, ub, NU, stream_dtype=stream)
    v, g = jax.jit(jax.value_and_grad(loss))(params, batch)
    wv, wg = jax.jit(jax.value_and_grad(oracle))(params, batch)
    jax.block_until_ready(v)
    if stream is None:
        np.testing.assert_allclose(float(v), float(wv), rtol=1e-4)
        np.testing.assert_allclose(_flat(g), _flat(wg), rtol=1e-3,
                                   atol=1e-5)
    else:
        np.testing.assert_allclose(float(v), float(wv), rtol=3e-2)
        g1, g2 = _flat(g), _flat(wg)
        cos = float(g1 @ g2 / (np.linalg.norm(g1) * np.linalg.norm(g2)))
        assert cos > 0.999, cos


def test_burgers_fused_width40_compiles_on_tpu():
    """Probe-P18 capacity variant: the fused kernel's first real
    Mosaic lowering past width 20.  The interpret-mode width-40 case
    in test_pallas_train.py validates the math; this validates the
    lowering on the chip (lane dim 40 is not a multiple of the 128
    VPU lane width — padding path)."""
    _, params, lb, ub, batch, oracle = _burgers_setup(
        layers=[2] + [40] * 8 + [1])
    loss = make_burgers_loss(lb, ub, NU)
    v, g = jax.jit(jax.value_and_grad(loss))(params, batch)
    wv, wg = jax.jit(jax.value_and_grad(oracle))(params, batch)
    jax.block_until_ready(v)
    np.testing.assert_allclose(float(v), float(wv), rtol=1e-4)
    np.testing.assert_allclose(_flat(g), _flat(wg), rtol=1e-3, atol=1e-5)


def _schro_setup(n_f=2048, seed=0):
    layers = [2, 100, 100, 100, 100, 2]
    params = mlp.init_mlp(jax.random.PRNGKey(seed), layers, jnp.float32)
    lb = np.array([-5.0, 0.0], np.float32)
    ub = np.array([5.0, np.pi / 2], np.float32)
    rng = np.random.RandomState(seed)
    n0 = nb = 40
    x0 = lb[0] + (ub[0] - lb[0]) * rng.rand(n0, 1)
    tb = rng.rand(nb, 1) * (ub[1] - lb[1])
    batch = {
        "X0": jnp.asarray(np.hstack([x0, np.zeros((n0, 1))]), jnp.float32),
        "H0": jnp.asarray(rng.rand(n0, 2), jnp.float32),
        "X_lb": jnp.asarray(np.hstack([np.full((nb, 1), lb[0]), tb]),
                            jnp.float32),
        "X_ub": jnp.asarray(np.hstack([np.full((nb, 1), ub[0]), tb]),
                            jnp.float32),
        "X_f": jnp.asarray(lb + (ub - lb) * rng.rand(n_f, 2), jnp.float32),
    }

    def oracle(p, b):
        return schrodinger.loss(p, b["X0"], b["H0"], b["X_lb"], b["X_ub"],
                                b["X_f"], jnp.asarray(lb), jnp.asarray(ub))

    return layers, params, lb, ub, batch, oracle


@pytest.mark.parametrize("stream", [None, "bfloat16"])
def test_schrodinger_fused_compiles_on_tpu(stream):
    _, params, lb, ub, batch, oracle = _schro_setup()
    loss = make_schrodinger_loss(lb, ub, stream_dtype=stream)
    v, g = jax.jit(jax.value_and_grad(loss))(params, batch)
    wv, wg = jax.jit(jax.value_and_grad(oracle))(params, batch)
    jax.block_until_ready(v)
    if stream is None:
        np.testing.assert_allclose(float(v), float(wv), rtol=1e-4)
        np.testing.assert_allclose(_flat(g), _flat(wg), rtol=1e-3,
                                   atol=1e-5)
    else:
        np.testing.assert_allclose(float(v), float(wv), rtol=3e-2)
        g1, g2 = _flat(g), _flat(wg)
        cos = float(g1 @ g2 / (np.linalg.norm(g1) * np.linalg.norm(g2)))
        assert cos > 0.999, cos


def test_fused_dp_wrappers_compile_on_tpu():
    """shard_map + Mosaic: the DP compositions of both fused kernels
    compile and match their unsharded values on the chip (1-device
    mesh — the multi-device placement itself is validated on the
    virtual CPU mesh; here we check the pallas_call survives Mosaic
    lowering inside shard_map)."""
    from pinn.ops.pallas_train import make_burgers_loss, make_burgers_loss_dp
    from pinn.ops.pallas_schrodinger import make_schrodinger_loss_dp
    from pinn.parallel import make_mesh

    mesh = make_mesh(1)

    _, params, lb, ub, batch, _ = _burgers_setup()
    dp = make_burgers_loss_dp(lb, ub, NU, mesh)
    ref = make_burgers_loss(lb, ub, NU)
    v, g = jax.jit(jax.value_and_grad(dp))(params, batch)
    wv, wg = jax.jit(jax.value_and_grad(ref))(params, batch)
    np.testing.assert_allclose(float(v), float(wv), rtol=1e-6)
    np.testing.assert_allclose(_flat(g), _flat(wg), rtol=1e-5, atol=1e-7)

    _, sparams, slb, sub, sbatch, _ = _schro_setup()
    sdp = make_schrodinger_loss_dp(slb, sub, mesh)
    sref = make_schrodinger_loss(slb, sub)
    v2, g2 = jax.jit(jax.value_and_grad(sdp))(sparams, sbatch)
    wv2, wg2 = jax.jit(jax.value_and_grad(sref))(sparams, sbatch)
    np.testing.assert_allclose(float(v2), float(wv2), rtol=1e-6)
    np.testing.assert_allclose(_flat(g2), _flat(wg2), rtol=1e-5, atol=1e-7)


def test_ide_fused_compiles_on_tpu():
    """The identification kernel (SMEM lambda scalars + adjoint
    accumulators) through real Mosaic lowering, values and ALL grads
    (net + both lambdas) vs the XLA oracle."""
    from pinn.ops.pallas_train import make_burgers_ide_loss

    _, params, lb, ub, batch, _ = _burgers_setup()
    ide = burgers.IdeParams(
        net=params,
        lambda1=jnp.full((1,), 0.7, jnp.float32),
        log_lambda2=jnp.full((1,), -5.0, jnp.float32))
    b = {"X_u": batch["X_f"], "u": jnp.asarray(
        np.random.RandomState(4).rand(batch["X_f"].shape[0], 1),
        jnp.float32)}
    loss = make_burgers_ide_loss(lb, ub)

    def oracle(p, bb):
        return burgers.loss_cont_identification(
            p, bb["X_u"], bb["u"], jnp.asarray(lb), jnp.asarray(ub))

    v, g = jax.jit(jax.value_and_grad(loss))(ide, b)
    wv, wg = jax.jit(jax.value_and_grad(oracle))(ide, b)
    jax.block_until_ready(v)
    np.testing.assert_allclose(float(v), float(wv), rtol=1e-4)
    np.testing.assert_allclose(_flat(g.net), _flat(wg.net), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(float(g.lambda1[0]),
                               float(wg.lambda1[0]), rtol=1e-3)
    np.testing.assert_allclose(float(g.log_lambda2[0]),
                               float(wg.log_lambda2[0]), rtol=1e-3)


def test_fused_kernels_compile_under_global_x64_on_tpu():
    """Mosaic under jax_enable_x64 (the mixed-precision Trainer's
    global state): the r4 _x64_safe_jit fix — index maps must stay i32
    (VERDICT r3 item #1 unblocker)."""
    with jax.enable_x64(True):
        _, params, lb, ub, batch, oracle = _burgers_setup()
        loss = make_burgers_loss(lb, ub, NU)
        v, g = jax.value_and_grad(loss)(params, batch)
        wv = oracle(params, batch)
        jax.block_until_ready(v)
        np.testing.assert_allclose(float(v), float(wv), rtol=1e-4)
