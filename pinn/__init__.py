"""pinn — a TPU-native physics-informed neural network framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
pierremtb/PINNs-TF2.0 (Raissi et al. PINNs): continuous/discrete-time
inference and identification for 1D Burgers and the 1D nonlinear
Schrödinger equation, trained with Adam warmup followed by L-BFGS.

Design notes (vs. the TF2 reference):

* The reference computes PDE residual derivatives with nested eager
  ``tf.GradientTape`` (reverse-over-reverse; reference
  utils/neuralnetwork.py and 1d-burgers/inf_cont_burgers.py:65-90).
  Here the derivative engine is *forward Taylor-mode*: value, first and
  second directional derivatives are propagated through the MLP layer
  by layer in a single pass made of MXU-friendly batched matmuls
  (``pinn.models.mlp.taylor_apply``), with ``jax.jvp`` compositions as
  the reference oracle (``pinn.ops.diff``).
* The reference's eager, Python-loop optimizers (utils/custom_lbfgs.py)
  become jitted fixed-shape ``lax.while_loop`` programs over a flat
  parameter vector (``pinn.optim.lbfgs``).
* Scaling is by sharding the collocation axis over a
  ``jax.sharding.Mesh`` (``pinn.parallel``) — XLA inserts the ICI
  collectives; there is no hand-written communication layer.
"""

from pinn import data, dtypes, ensemble, export, irk, optim, parallel, problems
from pinn.api import PhysicsInformedNN
from pinn.ensemble import EnsemblePINN
from pinn.dtypes import default_dtype, set_default_dtype
from pinn.models import mlp
from pinn.train import Trainer
from pinn.utils.config import HP, load_hp

__version__ = "0.1.0"
