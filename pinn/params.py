"""Flat-parameter <-> pytree codec.

The reference keeps model weights inside Keras layers and hand-rolls a
flatten/unflatten pair for its L-BFGS (reference
utils/neuralnetwork.py:40-45, :68-89: per-layer ``W.flatten()`` then
``b``, concatenated in layer order).  Here parameters are a plain
pytree (tuple of ``(W, b)`` pairs, see ``pinn.models.mlp``) and the
codec is a bijective ravel/unravel with the *same element order* as the
reference, so flat vectors (checkpoints, L-BFGS iterates) are
layout-compatible.

Extra trainable leaves (e.g. the identification-mode ``lambda1``,
``lambda2``) are appended at the tail of the flat vector, matching the
reference's ``get_weights``/``set_weights`` overrides
(1d-burgers/ide_disc_burgers.py:131-141).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ravel(params) -> jnp.ndarray:
    """Flatten a parameter pytree into a single 1-D vector.

    Leaf order is the pytree's canonical (depth-first) order; for MLP
    params stored as ``((W0, b0), (W1, b1), ...)`` this reproduces the
    reference's W-then-b per-layer ordering.
    """
    leaves = jax.tree_util.tree_leaves(params)
    return jnp.concatenate([jnp.ravel(leaf) for leaf in leaves])


def make_unravel(params) -> Callable[[jnp.ndarray], Any]:
    """Build the inverse of :func:`ravel` for pytrees shaped like ``params``."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [leaf.shape for leaf in leaves]
    sizes = [int(np.prod(shape, dtype=np.int64)) for shape in shapes]
    splits = np.cumsum(sizes)[:-1]

    def unravel(flat: jnp.ndarray):
        parts = jnp.split(flat, splits)
        new_leaves = [part.reshape(shape) for part, shape in zip(parts, shapes)]
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    return unravel


def ravel_with_unravel(params) -> Tuple[jnp.ndarray, Callable[[jnp.ndarray], Any]]:
    """Convenience: ``(flat, unravel)`` for a parameter pytree."""
    return ravel(params), make_unravel(params)


def num_params(params) -> int:
    """Total number of scalar parameters in the pytree."""
    return sum(int(np.prod(leaf.shape, dtype=np.int64))
               for leaf in jax.tree_util.tree_leaves(params))
