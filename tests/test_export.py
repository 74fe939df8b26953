"""Tests for pinn.export — AOT serving artifacts.

Contracts: the artifact reproduces mlp.apply exactly, serves ANY batch
size from one export (symbolic batch dim), round-trips through a file
with weights baked in (no params needed at load time), records its
target platforms, and casts dtypes for TPU serving of f64-trained
models.  Residual export goes through the same generic helper.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pinn import export as pexport
from pinn.models import mlp


@pytest.fixture
def net():
    params = mlp.init_mlp(jax.random.PRNGKey(0), [2, 8, 8, 1],
                          jnp.float32)
    lb = jnp.array([-1.0, 0.0], jnp.float32)
    ub = jnp.array([1.0, 1.0], jnp.float32)
    return params, lb, ub


def test_export_predict_matches_apply_any_batch(net):
    params, lb, ub = net
    exported = pexport.export_predict(params, lb, ub)
    rng = np.random.RandomState(0)
    for n in (1, 5, 37):
        X = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
        got = exported.call(X)
        want = mlp.apply(params, X, lb, ub)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)


def test_file_roundtrip_weights_baked_in(net, tmp_path):
    params, lb, ub = net
    exported = pexport.export_predict(params, lb, ub)
    path = pexport.save(str(tmp_path / "burgers_u"), exported)
    assert path.endswith(pexport.SUFFIX)

    served = pexport.load(str(tmp_path / "burgers_u"))  # suffix inferred
    assert served.platforms == ("cpu", "tpu")
    X = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (9, 2)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(served.predict(X)),
                               np.asarray(mlp.apply(params, X, lb, ub)),
                               rtol=1e-6)
    # __call__ aliases predict; input auto-casts to the exported dtype.
    np.testing.assert_allclose(np.asarray(served(np.asarray(X, np.float64))),
                               np.asarray(served.predict(X)), rtol=1e-6)


def test_dtype_cast_for_tpu_serving():
    """f64-trained parity model exports to an f32 artifact."""
    params = mlp.init_mlp(jax.random.PRNGKey(1), [2, 6, 1], jnp.float64)
    lb = jnp.array([-1.0, 0.0], jnp.float64)
    ub = jnp.array([1.0, 1.0], jnp.float64)
    exported = pexport.export_predict(params, lb, ub, dtype=jnp.float32)
    assert exported.in_avals[0].dtype == jnp.float32
    X64 = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (7, 2)))
    got = exported.call(jnp.asarray(X64, jnp.float32))
    want = mlp.apply(params, X64, lb, ub)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


def test_residual_exports_via_generic_helper(net):
    """PDE residual f(X) exports for production physics monitoring."""
    from pinn.problems import burgers
    params, lb, ub = net
    nu = 0.01 / np.pi

    exported = pexport.export_fn(
        lambda X: burgers.residual_cont(params, X, lb, ub, nu=nu),
        n_features=2)
    X = jnp.asarray(np.random.RandomState(3).uniform(-1, 1, (11, 2)),
                    jnp.float32)
    np.testing.assert_allclose(
        np.asarray(exported.call(X)),
        np.asarray(burgers.residual_cont(params, X, lb, ub, nu=nu)),
        rtol=1e-5, atol=1e-6)


def test_facade_export_serving(tmp_path):
    """PhysicsInformedNN.export_serving writes a loadable artifact that
    matches the facade's own predict."""
    from pinn.api import PhysicsInformedNN
    hp = {"layers": [1, 6, 1]}
    m = PhysicsInformedNN(hp, None, ub=[1.0], lb=[-1.0], seed=3)
    path = m.export_serving(str(tmp_path / "model"))
    served = pexport.load(path)
    X = np.linspace(-1, 1, 13).reshape(-1, 1)
    np.testing.assert_allclose(np.asarray(served.predict(X)),
                               m.predict(X), rtol=1e-6)
