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
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_mesh_2d(n_data: Optional[int] = None, n_model: int = 1,
                 axes: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS)) -> Mesh:
    """2-D (data, model) mesh: the collocation axis shards over
    ``data`` and the MLP feature dimension over ``model``.

    The reference has no tensor parallelism (SURVEY.md §2.5 TP row:
    largest layer is 100 wide) — this exists for API completeness and
    for wide-layer configurations.  ``n_data`` defaults to
    ``device_count // n_model``.
    """
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n} devices, "
                         f"have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(n_data, n_model), axes)


def shard_params_tp(params, mesh: Mesh, axis: str = MODEL_AXIS):
    """Alternating column/row-parallel (Megatron-style) placement of an
    MLP parameter stack over the mesh's ``model`` axis.

    Even layers split the *output* features (column-parallel: bias and
    activations shard with them, tanh stays local); odd layers split
    the *input* features (row-parallel: GSPMD inserts one ICI psum per
    layer pair to re-assemble the output).  Dimensions that don't
    divide the axis (e.g. the width-1 output head) stay replicated.
    The four Taylor derivative streams share the layer weights, so the
    same placement covers ``taylor_apply`` unchanged.
    """
    n = mesh.shape[axis]

    def place(l, w, b):
        col = (l % 2 == 0)
        w_dim = 1 if col else 0
        if w.shape[w_dim] % n != 0:
            w_spec = P()
            b_spec = P()
        elif col:
            w_spec = P(None, axis)
            b_spec = P(axis) if b.shape[0] % n == 0 else P()
        else:
            w_spec = P(axis, None)
            b_spec = P()
        return (jax.device_put(w, NamedSharding(mesh, w_spec)),
                jax.device_put(b, NamedSharding(mesh, b_spec)))

    return tuple(place(l, w, b) for l, (w, b) in enumerate(params))


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
