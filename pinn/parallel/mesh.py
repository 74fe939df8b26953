"""Device mesh + sharding helpers.

The reference is strictly single-process/single-device (SURVEY.md §2.5:
no tf.distribute anywhere).  The TPU-native scaling dimension for a
PINN is the collocation-point axis N_f — the residual is
embarrassingly parallel over points and the loss is a mean, so the
whole training step shards by annotating the point arrays over a 1-D
``data`` mesh axis and letting GSPMD insert the ICI ``psum`` for the
reductions.  Parameters are replicated (KB-scale nets).  There is no
hand-written communication layer: XLA collectives only.

Works identically on one chip (trivial mesh) or a pod slice; tests run
on 8 virtual CPU devices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def pad_points_with_weights(X: np.ndarray, n_shards: int,
                            dtype=None) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the point axis to a multiple of ``n_shards``.

    Returns (X_padded, weights) where weights sum to 1 over real points
    and are 0 on pads, so ``sum(r**2 * w)`` equals the unpadded mean.
    """
    n = X.shape[0]
    n_pad = (-n) % n_shards
    if n_pad:
        X = np.concatenate([X, np.tile(X[-1:], (n_pad,) + (1,) * (X.ndim - 1))])
    w = np.concatenate([np.full(n, 1.0 / n), np.zeros(n_pad)])
    if dtype is not None:
        X = X.astype(dtype)
        w = w.astype(dtype)
    return X, w


def shard_points(X, mesh: Mesh, axis: str = DATA_AXIS):
    """Place an (N, ...) array sharded along its leading axis."""
    spec = P(axis, *([None] * (jnp.ndim(X) - 1)))
    return jax.device_put(X, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
