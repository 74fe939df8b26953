"""Object-oriented compatibility facade.

Users of the reference subclass ``NeuralNetwork`` (reference
utils/neuralnetwork.py) and override ``loss``/``f_model``; this module
offers the same surface — ``fit(X_u, u)``, ``predict``,
``get_weights``/``set_weights`` (flat vector, same element order),
``get_params``, ``summary``, ``tensor`` — on top of the functional
core.  The one JAX-necessitated change: the overridable ``loss`` is a
*pure function of an explicit params pytree*,

    class MyPINN(PhysicsInformedNN):
        def loss(self, params, batch):
            u_pred = self.apply(params, batch["X_u"])
            return jnp.mean((batch["u"] - u_pred) ** 2) + ...

because jit/grad trace it (mutating ``self`` inside would silently not
train).  Everything else matches the reference call-for-call.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pinn import params as pcodec
from pinn.dtypes import default_dtype
from pinn.models import mlp
from pinn.train import Trainer
from pinn.utils.logger import Logger


class PhysicsInformedNN:
    """Reference-shaped base class (reference utils/neuralnetwork.py:7-159)."""

    def __init__(self, hp: dict, logger: Optional[Logger], ub, lb,
                 dtype=None, seed: int = 1234):
        self.hp = hp
        self.logger = logger
        self.dtype = dtype or default_dtype()
        self.lb = jnp.asarray(lb, self.dtype)
        self.ub = jnp.asarray(ub, self.dtype)
        self.layers = list(hp["layers"])
        self.params = mlp.init_mlp(jax.random.PRNGKey(seed), self.layers,
                                   self.dtype)
        self._unravel = pcodec.make_unravel(self.params)
        self._predict_jit = jax.jit(
            lambda p, X: mlp.apply(p, X, self.lb, self.ub))
        self.trainer: Optional[Trainer] = None

    # -- overridables ------------------------------------------------------
    def loss(self, params, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Default: plain data MSE (reference neuralnetwork.py:51-52)."""
        u_pred = self.apply(params, batch["X_u"])
        return jnp.mean(jnp.square(batch["u"] - u_pred))

    def extra_batch(self) -> Dict[str, jnp.ndarray]:
        """Additional arrays the loss needs (collocation points etc.)."""
        return {}

    def wrap_training_variables(self, params):
        """Extend the trainable set (reference neuralnetwork.py:61-63).

        The reference hook returns the list of trainable tf.Variables so
        identification subclasses can append their lambdas; here it
        returns the trainable *pytree*.  Override to wrap the network
        params with extra leaves, e.g.::

            def wrap_training_variables(self, params):
                return {"net": params, "lambda_1": jnp.zeros(())}

        and unpack in ``loss`` (``self.apply(params["net"], ...)``).
        When the tree is wrapped, also override :meth:`net_params` so
        ``predict`` can find the MLP sub-tree.  Called once, at the
        start of ``fit``; ``get_weights``/``set_weights`` operate on the
        wrapped tree (dict keys flatten alphabetically — name extra
        leaves after "net" to keep them at the flat vector's tail, the
        reference's element order, ide_cont_burgers.py:98-107).
        """
        return params

    def net_params(self, params):
        """Extract the MLP sub-tree from the (possibly wrapped)
        trainables; identity unless ``wrap_training_variables`` nests.
        """
        return params

    def epoch_extra(self, params) -> str:
        """Per-log-line suffix (identification subclasses print lambdas)."""
        return ""

    # -- building blocks for subclass losses ------------------------------
    def apply(self, params, X):
        return mlp.apply(params, X, self.lb, self.ub)

    def taylor(self, params, X, v1, v2=None, order: int = 2):
        return mlp.taylor_apply(params, X, self.lb, self.ub, v1, v2, order)

    # -- reference API surface ---------------------------------------------
    def tensor(self, X) -> jnp.ndarray:
        return jnp.asarray(X, self.dtype)

    def fit(self, X_u, u):
        batch = {"X_u": self.tensor(X_u), "u": self.tensor(u),
                 **self.extra_batch()}
        if not getattr(self, "_wrapped", False):
            self.params = self.wrap_training_variables(self.params)
            self._unravel = pcodec.make_unravel(self.params)
            self._wrapped = True
        # params_callback keeps self.params live during training so
        # error_fn closures (logger.set_error_fn) see the current
        # iterate, as in the reference where the Keras model mutates
        # in place.
        self.trainer = Trainer(
            lambda p, b: self.loss(p, b), self.params, batch, self.hp,
            self.logger,
            epoch_extra=(lambda p: self.epoch_extra(p)),
            params_callback=lambda p: setattr(self, "params", p),
            # Optional label-free validation hook: assign a callable
            # ``model.val_fn = lambda params: float`` and set
            # hp["nt_val_every"] to enable best-iterate selection over
            # the L-BFGS tail (see pinn/train.py).
            val_fn=getattr(self, "val_fn", None))
        self.params = self.trainer.fit()
        return self.params

    def predict(self, X_star) -> np.ndarray:
        return np.asarray(self._predict_jit(self.net_params(self.params),
                                            self.tensor(X_star)))

    def get_weights(self) -> jnp.ndarray:
        """Flat parameter vector, reference element order."""
        return pcodec.ravel(self.params)

    def set_weights(self, w) -> None:
        self.params = self._unravel(jnp.asarray(w, self.dtype))

    def get_params(self, numpy: bool = False):
        """PDE coefficients (empty for plain inference, as in the
        reference base class)."""
        return []

    def export_serving(self, path: str, dtype=None,
                       platforms=("cpu", "tpu")) -> str:
        """Serialize the trained network to a self-contained,
        batch-polymorphic serving artifact (see :mod:`pinn.export`).
        Returns the written path; reload with ``pinn.export.load``.
        """
        from pinn import export as pexport
        exported = pexport.export_predict(self.net_params(self.params),
                                          self.lb, self.ub, dtype=dtype,
                                          platforms=platforms)
        return pexport.save(path, exported)

    def summary(self) -> str:
        n = pcodec.num_params(self.params)
        lines = [f"PhysicsInformedNN {self.layers} "
                 f"({n} parameters, dtype={jnp.dtype(self.dtype).name})"]
        return "\n".join(lines)
