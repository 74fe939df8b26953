"""Flat codec tests (parity target: reference utils/neuralnetwork.py:68-89)."""

import jax
import jax.numpy as jnp
import numpy as np

from pinn import params as pcodec
from pinn.models import mlp


def test_ravel_unravel_roundtrip(rng):
    p = mlp.init_mlp(rng, [2, 20, 20, 1], dtype=jnp.float32)
    flat, unravel = pcodec.ravel_with_unravel(p)
    assert flat.ndim == 1
    assert flat.shape[0] == pcodec.num_params(p)
    p2 = unravel(flat)
    for (w, b), (w2, b2) in zip(p, p2):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(b2))


def test_ravel_order_matches_reference_layout(rng):
    """Element order must be W0-rowmajor, b0, W1, b1, ... (reference layout)."""
    w0 = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    b0 = jnp.array([10.0, 11.0, 12.0])
    w1 = jnp.arange(3, dtype=jnp.float32).reshape(3, 1) + 100
    b1 = jnp.array([200.0])
    flat = pcodec.ravel(((w0, b0), (w1, b1)))
    expected = np.concatenate([
        np.arange(6), [10, 11, 12], np.arange(3) + 100, [200]]).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(flat), expected)


def test_unravel_is_jittable(rng):
    p = mlp.init_mlp(rng, [2, 8, 1])
    flat, unravel = pcodec.ravel_with_unravel(p)

    @jax.jit
    def roundtrip(f):
        return pcodec.ravel(unravel(f))

    np.testing.assert_allclose(np.asarray(roundtrip(flat)), np.asarray(flat))


def test_appended_lambda_leaves():
    """Identification mode appends (lambda1, lambda2) at the tail
    (reference 1d-burgers/ide_disc_burgers.py:131-141)."""
    net = ((jnp.ones((2, 3)), jnp.zeros(3)),)
    lam = {"l1": jnp.array([0.5]), "l2": jnp.array([-6.0])}
    flat = pcodec.ravel((net, (lam["l1"], lam["l2"])))
    assert flat.shape[0] == 6 + 3 + 2
    np.testing.assert_allclose(np.asarray(flat[-2:]), [0.5, -6.0])
