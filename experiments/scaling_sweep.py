"""Collocation-axis scaling sweep: training throughput vs N_f.

The collocation count N_f is the PINN scaling dimension (SURVEY.md
§2.5: the long-context analog).  This sweep measures compiled Adam
training steps/sec, residual-point evaluations/sec, and achieved
TFLOP/s (analytic FLOP model below) at growing N_f on the current
backend, optionally sharded over all local devices (``--shard``), and
appends a table to SCALING.md.

``--fused`` swaps the residual term for the fused Pallas
forward+backward kernel (pinn/ops/pallas_train.py /
pallas_schrodinger.py) — one VMEM pass per point tile, no HBM
activation traffic, loss+grads in a single launch.

``--problem=schrodinger`` sweeps the 4x100 Schrödinger flagship
(reference inf_cont_schrodinger.py shapes) instead of the 8x20
Burgers net — its 100-wide layers fit the 128-lane MXU far better.

FLOP model (per collocation point per Adam step): each layer carries
four Taylor streams (value, d/dx, d2/dx2, d/dt) through one stacked
matmul — 2*4*h_in*h_out FLOPs forward; the backward adds the weight
gradient contraction (same shape, 8*S) and the input-adjoint matmul
(8*S), so ~24 * sum(h_in*h_out) per point.  Elementwise tanh/chain
terms are O(h) per point and ignored.  The XLA autodiff path executes
at least these FLOPs (its mechanical VJP of the Taylor forward adds
more elementwise terms); the fused kernel executes exactly them, so
achieved-TFLOP/s numbers are comparable floors for both.

Usage: python experiments/scaling_sweep.py [--shard] [--quick]
           [--fused] [--problem=burgers|schrodinger]
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
LAYERS_SCHRO = [2, 100, 100, 100, 100, 2]

# f32 matmuls run with jax_default_matmul_precision="highest" — 6 bf16
# MXU passes per f32 product (the training configuration).  v5e bf16
# peak is ~197 TFLOP/s, so the f32-highest ceiling is ~33 TFLOP/s
# before any shape effects.
V5E_BF16_PEAK_TFLOPS = 197.0
F32_HIGHEST_PASSES = 6.0


def flops_per_point(layers) -> float:
    s = sum(a * b for a, b in zip(layers[:-1], layers[1:]))
    return 24.0 * s


def measure(n_f: int, shard: bool, chunk: int = 10, reps: int = 20,
            fused: bool = False, problem: str = "burgers",
            stream_dtype=None):
    dtype = jnp.float32
    layers = LAYERS_SCHRO if problem == "schrodinger" else LAYERS
    params = mlp.init_mlp(jax.random.PRNGKey(0), layers, dtype)
    rng = np.random.RandomState(0)

    if problem == "schrodinger":
        lb = jnp.array([-5.0, 0.0], dtype)
        ub = jnp.array([5.0, np.pi / 2], dtype)
        lb_n, ub_n = np.asarray(lb), np.asarray(ub)
        n0, nb = 50, 50
        x0 = lb_n[0] + (ub_n[0] - lb_n[0]) * rng.rand(n0, 1)
        tb = rng.rand(nb, 1) * (ub_n[1] - lb_n[1])
        batch = {
            "X0": jnp.asarray(np.hstack([x0, np.zeros((n0, 1))]), dtype),
            "H0": jnp.asarray(rng.rand(n0, 2), dtype),
            "X_lb": jnp.asarray(
                np.hstack([np.full((nb, 1), lb_n[0]), tb]), dtype),
            "X_ub": jnp.asarray(
                np.hstack([np.full((nb, 1), ub_n[0]), tb]), dtype),
            "X_f": jnp.asarray(
                lb_n + (ub_n - lb_n) * rng.rand(n_f, 2), dtype),
        }
        if fused:
            from pinn.ops.pallas_schrodinger import make_schrodinger_loss
            loss_fn = make_schrodinger_loss(lb_n, ub_n,
                                            stream_dtype=stream_dtype)
        else:
            from pinn.problems import schrodinger as sprob

            def loss_fn(p, b):
                return sprob.loss(p, b["X0"], b["H0"], b["X_lb"],
                                  b["X_ub"], b["X_f"], lb, ub)
    else:
        lb = jnp.array([-1.0, 0.0], dtype)
        ub = jnp.array([1.0, 1.0], dtype)
        batch = {"X_u": jnp.asarray(rng.rand(128, 2), dtype),
                 "u": jnp.asarray(rng.rand(128, 1), dtype),
                 "X_f": jnp.asarray(rng.rand(n_f, 2), dtype)}
        if fused:
            from pinn.ops.pallas_train import make_burgers_loss
            loss_fn = make_burgers_loss(lb, ub, 0.01 / np.pi,
                                        stream_dtype=stream_dtype)
        else:
            def loss_fn(p, b):
                return burgers.loss_cont_inference(p, b["X_u"], b["u"],
                                                   b["X_f"], lb, ub,
                                                   0.01 / np.pi)

    if shard:
        mesh = make_mesh()
        batch = {k: shard_points(v, mesh) for k, v in batch.items()}
        params = replicate(params, mesh)

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
    tflops = sps * n_f * flops_per_point(layers) / 1e12
    return sps, sps * n_f, tflops


def main():
    shard = "--shard" in sys.argv
    quick = "--quick" in sys.argv
    fused = "--fused" in sys.argv
    problem = "burgers"
    stream = None
    for a in sys.argv[1:]:
        if a.startswith("--problem="):
            problem = a.split("=", 1)[1]
        if a.startswith("--stream="):  # e.g. --stream=bfloat16 (+ --fused)
            stream = a.split("=", 1)[1]
    sizes = [1000, 10000, 100000] if quick else [1000, 10000, 100000, 1000000]
    if problem == "schrodinger" and not quick:
        # 4x100 net: 1e6 points x 729 kFLOP/pt is ~12 GB of stream
        # state on the XLA path; cap the sweep at the flagship 2e4 and
        # 1e5/3e5 extremes.
        sizes = [1000, 20000, 100000, 300000]
    jax.config.update("jax_default_matmul_precision", "highest")

    # bf16-stream dots run one MXU pass (no 6-pass f32 algorithm), so
    # their arithmetic ceiling is the raw bf16 peak, not peak/6.
    if stream:
        ceiling, ceiling_label = V5E_BF16_PEAK_TFLOPS, "bf16 peak"
    else:
        ceiling = V5E_BF16_PEAK_TFLOPS / F32_HIGHEST_PASSES
        ceiling_label = "f32 ceiling"
    rows = []
    for n_f in sizes:
        sps, evals, tflops = measure(n_f, shard, reps=5 if quick else 20,
                                     fused=fused, problem=problem,
                                     stream_dtype=stream)
        rows.append((n_f, sps, evals, tflops))
        print(f"N_f={n_f:>8d}  steps/s={sps:10.1f}  "
              f"residual-pt-evals/s={evals:.3e}  "
              f"TFLOP/s={tflops:6.2f}  ({100*tflops/ceiling:.1f}% of "
              f"{ceiling_label})", flush=True)

    path = os.path.join(REPO, "SCALING.md")
    newfile = not os.path.exists(path)
    with open(path, "a") as fh:
        if newfile:
            fh.write("# SCALING — training throughput vs collocation "
                     "count N_f\n\n")
        fh.write("\n| backend | problem | devices | sharded | N_f "
                 "| steps/s | residual-pt evals/s | TFLOP/s "
                 f"| % {ceiling_label} |\n|---|---|---|---|---|---|---|---|---|\n")
        backend = jax.default_backend() + (
            "(fused-bf16)" if fused and stream else
            "(fused)" if fused else "")
        for n_f, sps, evals, tflops in rows:
            fh.write(f"| {backend} | {problem} | {jax.device_count()} "
                     f"| {shard} | {n_f} | {sps:.1f} | {evals:.3e} "
                     f"| {tflops:.2f} | {100*tflops/ceiling:.1f}% |\n")


if __name__ == "__main__":
    main()
