"""AOT serving export — serialized, batch-polymorphic StableHLO
artifacts for trained PINNs.

The reference has no deployment story: serving a trained model means
re-instantiating the Python class and calling ``predict`` under
TensorFlow eager (reference utils/neuralnetwork.py:151-153).  Here a
trained network exports to a single self-contained artifact via
``jax.export``:

* **weights baked in** — the artifact embeds the trained parameters as
  constants; no Python model code or checkpoint is needed at serving
  time, just ``pinn.export.load``;
* **batch-polymorphic** — the batch axis is exported symbolically, so
  one artifact serves any request size without retracing;
* **multi-platform** — one artifact lowers for ``("cpu", "tpu")`` by
  default and runs on whichever backend the serving host has (XLA
  picks the loaded platform's lowering);
* **stable across versions** — StableHLO serialization is JAX's
  forward-compatibility boundary, unlike pickled functions.

Both the solution network ``u(X)`` and PDE residual functions
``f(X)`` (for physics-consistency monitoring in production) export
through the same helper.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

from pinn.models import mlp

__all__ = ["export_fn", "export_predict", "save", "load", "ServingModel"]

SUFFIX = ".jaxexp"


def export_fn(fn: Callable, n_features: int, dtype=jnp.float32,
              platforms: Sequence[str] = ("cpu", "tpu")):
    """Export ``fn(X) -> array`` with a symbolic batch dimension.

    ``fn`` must close over everything else it needs (trained params,
    domain bounds, PDE coefficients) — those become constants in the
    artifact.  ``X`` is traced as ``f{dtype}[n, n_features]`` where
    ``n`` is symbolic: the exported callable accepts any batch size.
    """
    n, = jexport.symbolic_shape("n")
    spec = jax.ShapeDtypeStruct((n, int(n_features)), dtype)
    return jexport.export(jax.jit(fn), platforms=tuple(platforms))(spec)


def export_predict(params, lb, ub, dtype=None,
                   platforms: Sequence[str] = ("cpu", "tpu")):
    """Export the trained MLP's prediction function.

    Bakes the normalization ``2(X-lb)/(ub-lb)-1`` (reference
    utils/neuralnetwork.py:29-30) and the trained weights into the
    artifact.  ``dtype`` casts weights and input spec (e.g. serve an
    f64-trained parity model in f32 on TPU); default keeps the params'
    own dtype.
    """
    if dtype is not None:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    leaf = jax.tree.leaves(params)[0]
    dt = leaf.dtype
    lb = jnp.asarray(lb, dt)
    ub = jnp.asarray(ub, dt)
    n_features = lb.shape[-1]
    return export_fn(lambda X: mlp.apply(params, X, lb, ub),
                     n_features, dtype=dt, platforms=platforms)


def save(path: str, exported) -> str:
    """Serialize an ``Exported`` to ``path`` (SUFFIX appended if no
    extension). Returns the final path."""
    if not os.path.splitext(path)[1]:
        path = path + SUFFIX
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


class ServingModel:
    """A deserialized artifact: ``predict(X)`` on the local backend.

    ``platforms`` records what the artifact was lowered for; calling on
    a backend outside that set raises at execution time.
    """

    def __init__(self, exported):
        self._exported = exported
        self.platforms = tuple(exported.platforms)
        self.in_avals = exported.in_avals

    def predict(self, X):
        dt = self.in_avals[0].dtype
        return self._exported.call(jnp.asarray(X, dt))

    __call__ = predict


def load(path: str, expect_suffix: bool = True) -> ServingModel:
    if expect_suffix and not os.path.exists(path) \
            and os.path.exists(path + SUFFIX):
        path = path + SUFFIX
    with open(path, "rb") as f:
        blob = f.read()
    return ServingModel(jexport.deserialize(blob))
