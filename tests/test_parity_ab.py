"""Slow-tier A/B parity: L-BFGS trajectory vs TF2 reference semantics.

Asserts the first-K-iteration loss trajectory of this framework's
fixed-step L-BFGS (``nt_line_search="none"``, f64) agrees with a fresh
TF2-eager implementation of the reference's semantics to near machine
precision, from identical initial weights and train data.  Measured
artifact: PARITY.md §"Measured A/B" (experiments/parity_ab.py).

Run with: ``pytest -m slow tests/test_parity_ab.py``
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))


@pytest.mark.slow
def test_lbfgs_trajectory_matches_tf2_reference_semantics():
    import jax
    import jax.numpy as jnp
    import parity_ab
    from pinn import params as pcodec
    from pinn.data import burgers_cont_inference
    from pinn.models import mlp

    np.random.seed(1234)
    data = burgers_cont_inference(100, 10000)
    params0 = mlp.init_mlp(jax.random.PRNGKey(1234), parity_ab.LAYERS,
                           jnp.float64)
    flat0 = np.asarray(pcodec.ravel(params0))

    k = 15
    ours, w_a = parity_ab.run_ours(flat0, data.lb, data.ub,
                                   data.X_u_train, data.u_train,
                                   data.X_f, k)
    tf_lag, _, _ = parity_ab.build_tf_side(
        flat0, data.lb, data.ub, data.X_u_train, data.u_train, data.X_f)
    theirs, w_b = parity_ab.numpy_lbfgs_reference(tf_lag, flat0, k)

    rel = np.abs(ours - theirs) / np.abs(theirs)
    assert rel.max() < 1e-10, rel
    assert np.max(np.abs(w_a - w_b)) < 1e-10
