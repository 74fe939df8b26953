"""Production-path example: train an ensemble, export one serving
artifact, serve label-free-robust predictions.

Ties together the two deployment facilities (no counterpart in the
reference, which serves by re-running the training script's Python
class — reference utils/neuralnetwork.py:151-153):

1. train K members of the continuous-Burgers PINN from different
   ``init_seed`` values on the SAME training data — the init/basin
   lottery is the dominant error source at unknown seeds (RESULTS.md
   seed matrix);
2. combine them with :class:`pinn.ensemble.EnsemblePINN`, weighting by
   a held-out validation residual (never test labels) — the measured
   P14 recipe as a serving configuration;
3. export the ensemble-averaged predictor as ONE batch-polymorphic
   cpu+tpu StableHLO artifact (:mod:`pinn.export`) — member weights and
   combination weights baked in, no Python model code at serving time;
4. reload the artifact and check it reproduces the in-process ensemble
   and reports the rel-L2 error against the exact solution.

Usage: ``python experiments/serving_example.py [hp.json]``
(hp extras: ``members`` = ensemble size, ``artifact`` = output path).
"""

from __future__ import annotations

import os
import sys
import tempfile

from _common import setup, resolve_dtype, validate  # noqa: F401

import jax.numpy as jnp
import numpy as np

from pinn.data import burgers_cont_inference, lhs
from pinn.ensemble import EnsemblePINN, inverse_metric_weights, rel_l2
from pinn.models import mlp
from pinn.problems import burgers
from pinn.utils import Logger, load_hp
from pinn import export as pexport

DEFAULT_HP = {
    "N_u": 100,
    "N_f": 10000,
    "layers": [2, 20, 20, 20, 20, 20, 20, 20, 20, 1],
    "tf_epochs": 500,
    "tf_lr": 0.005,
    "tf_b1": 0.9,
    "tf_eps": None,
    "nt_epochs": 1000,
    "nt_lr": 0.8,
    "nt_ncorr": 50,
    "nt_line_search": "wolfe",
    "log_frequency": 500,
    "members": 3,
    "artifact": None,   # default: a temp file
}


def run(hp=None):
    hp = {**DEFAULT_HP, **(hp or {})}
    members_n = int(hp.pop("members"))
    artifact = hp.pop("artifact")
    seed = hp.get("seed", 1234)

    import inf_cont_burgers as exp

    # 1. Train members: same data seed, varying init_seed (the P11/P14
    # convention: member j inits from seed + 7919*j).
    results = []
    for j in range(members_n):
        r = exp.run({**hp, "init_seed": seed + 7919 * j}, plot=False)
        results.append(r)
        print(f"member {j}: rel-L2 {r['error']:.4e}", flush=True)

    data = results[0]["data"]
    dtype = results[0]["batch"]["X_f"].dtype
    lb = jnp.asarray(data.lb, dtype)
    ub = jnp.asarray(data.ub, dtype)

    # 2. Held-out validation residual per member (fresh LHS draw — no
    # test labels), inverse-metric combination weights.
    rng = np.random.RandomState(97531)
    X_val = jnp.asarray(data.lb + (data.ub - data.lb) * lhs(2, 20000, rng),
                        dtype)
    vals = []
    for r in results:
        f = burgers.residual_cont(r["params"], X_val, lb, ub,
                                  nu=0.01 / np.pi)
        u_fit = r["predict_u"](r["params"],
                               jnp.asarray(data.X_u_train, dtype))
        vals.append(float(jnp.mean(jnp.square(f))) + float(jnp.mean(
            jnp.square(jnp.asarray(data.u_train, dtype) - u_fit))))
    weights = inverse_metric_weights(vals)

    class _Member:
        def __init__(self, r):
            self.r = r

        def predict(self, X):
            return np.asarray(self.r["predict_u"](
                self.r["params"], jnp.asarray(X, dtype)))

    ens = EnsemblePINN([_Member(r) for r in results], weights=weights)
    err_ens = rel_l2(data.u_star, ens.predict(data.X_star))
    print(f"ensemble ({members_n} members, 1/val weights): "
          f"rel-L2 {err_ens:.4e}", flush=True)

    # 3. Export the weighted average as ONE artifact: the combination
    # is a jittable closure over all member params.
    member_params = [r["params"] for r in results]
    w = jnp.asarray(weights, dtype)

    def serve_fn(X):
        preds = [mlp.apply(p, X, lb, ub) for p in member_params]
        return sum(wi * pi for wi, pi in zip(w, preds))

    exported = pexport.export_fn(serve_fn, n_features=2, dtype=dtype)
    if artifact is None:
        fd, artifact = tempfile.mkstemp(suffix=pexport.SUFFIX)
        os.close(fd)
    path = pexport.save(artifact, exported)
    print(f"artifact: {path} ({os.path.getsize(path)} bytes, "
          f"platforms {exported.platforms})", flush=True)

    # 4. Reload + serve: matches the in-process ensemble on the full
    # grid and at arbitrary batch sizes.
    served = pexport.load(path)
    u_served = np.asarray(served.predict(data.X_star))
    err_served = rel_l2(data.u_star, u_served)
    assert np.allclose(u_served, ens.predict(data.X_star),
                       rtol=1e-5, atol=1e-6), \
        "served artifact deviates from the in-process ensemble"
    small = np.asarray(served.predict(data.X_star[:3]))
    assert small.shape == (3, 1)
    print(f"served artifact: rel-L2 {err_served:.4e} "
          f"(members: {[round(r['error'], 6) for r in results]})",
          flush=True)
    return {"error": err_served, "member_errors":
            [r["error"] for r in results], "artifact": path,
            "weights": np.asarray(weights)}


if __name__ == "__main__":
    result = run(load_hp(sys.argv, DEFAULT_HP))
    print(f"rel-L2 error (served ensemble): {result['error']:.4e}")
