"""Collocation-axis scaling sweep: training throughput vs N_f.

The collocation count N_f is the PINN scaling dimension (SURVEY.md
§2.5: the long-context analog).  This sweep measures compiled Adam
training steps/sec and residual-point evaluations/sec at growing N_f on
the current backend, optionally sharded over all local devices
(``--shard``), and appends a table to SCALING.md.

``--fused`` swaps the residual term for the fused Pallas
forward+backward kernel (pinn/ops/pallas_train.py) — one VMEM pass per
point tile, no HBM activation traffic; this is the fix for the XLA
path's throughput cliff at N_f=1e6 (four Taylor streams x 8 layers of
(N, h) activations spill to HBM between value_and_grad's forward and
backward).

Usage: python experiments/scaling_sweep.py [--shard] [--quick] [--fused]
"""

from __future__ import annotations

import os
import sys
import time

from _common import setup, resolve_dtype  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from pinn.models import mlp
from pinn.optim.adam import AdamRunner
from pinn.parallel import make_mesh, replicate, shard_points
from pinn.problems import burgers

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAYERS = [2, 20, 20, 20, 20, 20, 20, 20, 20, 1]


def measure(n_f: int, shard: bool, chunk: int = 10, reps: int = 20,
            fused: bool = False):
    dtype = jnp.float32
    params = mlp.init_mlp(jax.random.PRNGKey(0), LAYERS, dtype)
    lb = jnp.array([-1.0, 0.0], dtype)
    ub = jnp.array([1.0, 1.0], dtype)
    rng = np.random.RandomState(0)
    batch = {"X_u": jnp.asarray(rng.rand(128, 2), dtype),
             "u": jnp.asarray(rng.rand(128, 1), dtype),
             "X_f": jnp.asarray(rng.rand(n_f, 2), dtype)}
    if shard:
        mesh = make_mesh()
        batch = {k: shard_points(v, mesh) for k, v in batch.items()}
        params = replicate(params, mesh)

    if fused:
        from pinn.ops.pallas_train import make_burgers_loss
        loss_fn = make_burgers_loss(lb, ub, 0.01 / np.pi)
    else:
        def loss_fn(p, b):
            return burgers.loss_cont_inference(p, b["X_u"], b["u"],
                                               b["X_f"], lb, ub,
                                               0.01 / np.pi)

    runner = AdamRunner(loss_fn, {"tf_lr": 1e-3, "tf_b1": 0.9,
                                  "tf_eps": None})
    state = runner.init(params)
    p, s, losses = runner.run(params, state, batch, chunk)  # compile
    jax.block_until_ready(losses)
    t0 = time.time()
    for _ in range(reps):
        p, s, losses = runner.run(p, s, batch, chunk)
    jax.block_until_ready(losses)
    sps = reps * chunk / (time.time() - t0)
    return sps, sps * n_f


def main():
    shard = "--shard" in sys.argv
    quick = "--quick" in sys.argv
    fused = "--fused" in sys.argv
    sizes = [1000, 10000, 100000] if quick else [1000, 10000, 100000, 1000000]
    jax.config.update("jax_default_matmul_precision", "highest")

    rows = []
    for n_f in sizes:
        sps, evals = measure(n_f, shard, reps=5 if quick else 20,
                             fused=fused)
        rows.append((n_f, sps, evals))
        print(f"N_f={n_f:>8d}  steps/s={sps:10.1f}  "
              f"residual-pt-evals/s={evals:.3e}", flush=True)

    path = os.path.join(REPO, "SCALING.md")
    newfile = not os.path.exists(path)
    with open(path, "a") as fh:
        if newfile:
            fh.write("# SCALING — training throughput vs collocation "
                     "count N_f\n\n"
                     "| backend | devices | sharded | N_f | steps/s "
                     "| residual-pt evals/s |\n|---|---|---|---|---|---|\n")
        backend = jax.default_backend() + ("(fused)" if fused else "")
        for n_f, sps, evals in rows:
            fh.write(f"| {backend} | {jax.device_count()} "
                     f"| {shard} | {n_f} | {sps:.1f} | {evals:.3e} |\n")


if __name__ == "__main__":
    main()
