"""bf16-warmup measurement (VERDICT round-1 #10): Adam-phase step rate
with hp tf_net_dtype="bfloat16" (bf16 network/residual eval, f32 master
weights) vs the plain f32 path, at the flagship workload.

Prints one line per (N_f, mode); keep the feature only if it buys
>=1.3x step rate at unchanged final error (the error check runs the
smoke recipe both ways).
"""

from __future__ import annotations

import time

from _common import setup  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from pinn.models import mlp
from pinn.optim.adam import AdamRunner
from pinn.problems import burgers

LAYERS = [2, 20, 20, 20, 20, 20, 20, 20, 20, 1]


def steps_per_sec(n_f: int, net_dtype, reps=30, chunk=10):
    dtype = jnp.float32
    params = mlp.init_mlp(jax.random.PRNGKey(0), LAYERS, dtype)
    lb = jnp.array([-1.0, 0.0], dtype)
    ub = jnp.array([1.0, 1.0], dtype)
    rng = np.random.RandomState(0)
    batch = {"X_u": jnp.asarray(rng.rand(100, 2), dtype),
             "u": jnp.asarray(rng.rand(100, 1), dtype),
             "X_f": jnp.asarray(rng.rand(n_f, 2), dtype)}

    def loss_fn(p, b):
        return burgers.loss_cont_inference(p, b["X_u"], b["u"], b["X_f"],
                                           lb, ub, 0.01 / np.pi)

    hp = {"tf_lr": 1e-3, "tf_b1": 0.9, "tf_eps": None}
    if net_dtype:
        hp["tf_net_dtype"] = net_dtype
    runner = AdamRunner(loss_fn, hp)
    s = runner.init(params)
    p, s, losses = runner.run(params, s, batch, chunk)
    jax.block_until_ready(losses)
    t0 = time.time()
    for _ in range(reps):
        p, s, losses = runner.run(p, s, batch, chunk)
    jax.block_until_ready(losses)
    return reps * chunk / (time.time() - t0)


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    for n_f in (10000, 100000, 1000000):
        f32 = steps_per_sec(n_f, None)
        bf16 = steps_per_sec(n_f, "bfloat16")
        print(f"N_f={n_f:>8d}  f32={f32:9.1f} steps/s  "
              f"bf16={bf16:9.1f} steps/s  speedup={bf16 / f32:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
