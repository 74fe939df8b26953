"""Controlled A/B of refinement tails from ONE shared stage-1 checkpoint.

Round-5 diagnosis of the P16 df32 gap (VERDICT r4 item 1): the df32
tail reaches the same training-loss floor as the emulated-f64 tail
(2.24e-6 vs 2.12e-6, logs/p16_df32.log vs logs/campaign_p5_fused.log)
yet lands at 8.3e-4 vs 4.26e-4 rel-L2 — which smells like basin /
generalization lottery, not backward-precision stall.  Prior P16/P5
runs are NOT same-checkpoint comparable (their stage-1 trajectories
differed).  This driver removes the confound:

  stage 1 (fused mixed, Adam 1k + L-BFGS 15k, resample) runs ONCE and
  is cached at logs/ab_stage1.npz; every tail warm-starts from it.

Tails (select by name on argv; each prints one PROBE JSON line):
  f64_10k    emulated-f64 reference tail (the P5 configuration)
  df32_10k   df32 tail, warm-cache timing (VERDICT item 7 data point)
  hy_4k4k    df32 to its ~4k-iter plateau, then a short f64 tail
  df32_n30   df32 tail on a 3x collocation draw (N_f=30000, fixed) —
             converts df32's ~5.4x/iter speed into a lower SSE floor
  df32_n30_rar  same but the 30k draw is one-shot RAR (rar_init)
  gradcheck  no training: relative error + cosine of the df32 gradient
             vs the f64 oracle gradient at the stage-1 iterate and at
             a tail iterate if logs/ab_tail_df32.npz exists

Usage: python experiments/df32_ab.py [tail ...] [--seed=1234]
"""

from __future__ import annotations

import json
import os
import sys
import time

from _common import setup  # noqa: F401 (path side effect)

import jax

import inf_cont_burgers as exp

LOGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "logs")

MIXED = {"nt_vector_dtype": "float64", "log_frequency": 2000,
         "fused_residual": True, "nt_dir_impl": "matrix",
         "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000}

# Stage-1 basins (all deterministic at a seed; tails must be compared
# within ONE basin).  Forensics from the logged hp + step-0 losses
# (the bf16 warmup key is popped before logging, so step-0 Adam loss
# is the fingerprint — f32 streams 3.8490e-1, bf16 3.8662e-1):
#   f32       f32 warmup + matrix direction (stage-1 err 2.7741e-3);
#             measured df32 tails: 4k 6.7261e-4, 10k 8.3015e-4,
#             hybrid 7.8384e-4.  No f64-10k anchor measured.
#   bf16      bf16 warmup + matrix — the CURRENT campaign default
#             (stage-1 err 5.0581e-3).  In-basin f64-10k anchor:
#             5.5984e-4 @ ~2356s tail (logs/campaign_p5_matrix.log).
#   headline  f32 warmup + SCAN direction, the exact config whose
#             f64-10k (scan) tail is the 4.2566e-4 headline
#             (stage-1 err 7.0635e-3, logs/campaign_p5_fused.log).
#             Tails here drop nt_dir_impl=matrix for basin purity.
MIXED_BF16 = {**MIXED, "tf_net_dtype": "bfloat16"}
MIXED_HEADLINE = {k: v for k, v in MIXED.items() if k != "nt_dir_impl"}
STAGE1 = {"f32": MIXED, "bf16": MIXED_BF16, "headline": MIXED_HEADLINE}

F64 = {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0,
       "log_frequency": 2000, "nt_line_search": "wolfe"}
DF32 = {**F64, "net_impl": "df32"}

TAILS = {
    "f64_10k": [{**F64, "nt_epochs": 10000}],
    "df32_10k": [{**DF32, "nt_epochs": 10000,
                  "save_checkpoint": os.path.join(LOGS, "ab_tail_df32.npz")}],
    "df32_4k": [{**DF32, "nt_epochs": 4000}],
    "hy_4k4k": [{**DF32, "nt_epochs": 4000},
                {**F64, "nt_epochs": 4000}],
    # Tail overshoot control (nt_val_every, pinn/train.py): same 10k
    # df32 tail but the returned iterate is the best scorer on a
    # held-out residual draw — should land at/below the 4k tail's
    # error without hand-tuning the stop point.
    "df32_10k_vs": [{**DF32, "nt_epochs": 10000, "nt_val_every": 500}],
    # Tail-resampling variants: every f64/df32 tail so far ran on a
    # FIXED collocation draw, and the measured failure mode is exactly
    # fixed-draw overfitting (df32 reaches LOWER train loss than the
    # in-basin f64 anchor — 2.29e-6 vs 2.48e-6 — yet tests 1.4x worse,
    # logs/df32_ab_bf16.log vs campaign_p5_matrix.log).  The mixed
    # stage already resamples every 1k; these extend that to the tail,
    # optionally with best-iterate selection on top.
    "df32_10k_rs": [{**DF32, "nt_epochs": 10000, "nt_resample": 1000}],
    "df32_10k_rsvs": [{**DF32, "nt_epochs": 10000, "nt_resample": 1000,
                       "nt_val_every": 500}],
    # Round-5 follow-ups to the measured rsvs win (4.7880e-4 in the
    # headline basin): (a) does rs+vs ALSO lift the emulated-f64 tail
    # past the 4.2566e-4 fixed-draw headline? (b) does a 2x longer
    # df32 rsvs tail keep digging (resampling removed the overfit
    # cliff that made long fixed-draw tails regress)?
    "f64_10k_rsvs": [{**F64, "nt_epochs": 10000, "nt_resample": 1000,
                      "nt_val_every": 500}],
    # f64_10k_rsvs measured NEGATIVE (1.1950e-3 — resampling thrashes
    # the deterministic f64 tail's curvature model).  Val-select ALONE
    # is trajectory-neutral (pure observation, pinn/train.py:272-281):
    # in the headline basin this probe retraces the exact 4.2566e-4
    # f64-10k trajectory and can only restore an iterate with lower
    # held-out residual — an almost-free option on the error floor.
    "f64_10k_vs": [{**F64, "nt_epochs": 10000, "nt_val_every": 500}],
    "df32_20k_rsvs": [{**DF32, "nt_epochs": 20000, "nt_resample": 1000,
                       "nt_val_every": 500}],
    "df32_n30": [{**DF32, "nt_epochs": 10000, "N_f": 30000}],
    "df32_n30_rar": [{**DF32, "nt_epochs": 10000, "N_f": 30000,
                      "rar_init": True, "rar_pool": 200000}],
}


def _hp_for_platform(hp: dict) -> dict:
    if jax.default_backend() != "tpu":
        hp = {k: v for k, v in hp.items() if k != "fused_residual"}
    return hp


def stage1_ckpt(seed: int, basin: str = "f32") -> str:
    tag = {"f32": "stage1", "bf16": "stage1b", "headline": "stage1h"}[basin]
    path = os.path.join(LOGS, f"ab_{tag}_seed{seed}.npz")
    if os.path.exists(path):
        print(f"[ab] reusing stage-1 checkpoint {path}", flush=True)
        return path
    t0 = time.time()
    hp = _hp_for_platform(dict(STAGE1[basin], seed=seed,
                               save_checkpoint=path))
    r = exp.run(hp, plot=False)
    print(f"[ab] stage 1 done: error {r['error']:.4e} "
          f"in {time.time() - t0:.1f}s -> {path}", flush=True)
    return path


def run_tail(name: str, seed: int, basin: str = "f32") -> dict:
    ckpt = stage1_ckpt(seed, basin)
    t0 = time.time()
    stages = TAILS[name]
    result = None
    for i, stage in enumerate(stages):
        hp = dict(stage, seed=seed, init_checkpoint=ckpt)
        if basin == "headline":
            # The 4.2566e-4 anchor's tail ran the scan direction.
            hp.pop("nt_dir_impl", None)
        if i + 1 < len(stages):
            nxt = os.path.join(LOGS, f"ab_chain_{name}_{i}.npz")
            hp["save_checkpoint"] = nxt
        result = exp.run(_hp_for_platform(hp), plot=False)
        if i + 1 < len(stages):
            ckpt = nxt
    suffix = {"f32": "", "bf16": "_bf16s1", "headline": "_hls1"}[basin]
    return {"probe": f"AB_{name}{suffix}",
            "seed": seed, "error": result["error"],
            "tail_duration_s": round(time.time() - t0, 1)}


def gradcheck(seed: int) -> dict:
    """Relative error and cosine of the df32 gradient vs the f64 oracle
    at the shared stage-1 iterate (and the df32-tail iterate if saved).
    Pins down whether backward arithmetic is the binding error source."""
    import jax.numpy as jnp
    import numpy as np
    from pinn.data import burgers_cont_inference
    from pinn.ops.df32 import make_burgers_loss_df32
    from pinn.problems import burgers as bprob
    from pinn.utils import checkpoint as ck
    from pinn.models import mlp

    jax.config.update("jax_enable_x64", True)
    np.random.seed(seed)
    data = burgers_cont_inference(100, 10000)
    nu = 0.01 / np.pi
    lb = jnp.asarray(data.lb, jnp.float64)
    ub = jnp.asarray(data.ub, jnp.float64)
    batch = {"X_u": jnp.asarray(data.X_u_train, jnp.float64),
             "u": jnp.asarray(data.u_train, jnp.float64),
             "X_f": jnp.asarray(data.X_f, jnp.float64)}
    dd_loss = make_burgers_loss_df32(np.asarray(data.lb),
                                     np.asarray(data.ub), nu)

    def f64_loss(p, b):
        return bprob.loss_cont_inference(p, b["X_u"], b["u"], b["X_f"],
                                         lb, ub, nu)

    like = mlp.init_mlp(jax.random.PRNGKey(seed),
                        [2] + [20] * 8 + [1], jnp.float64)
    out = {"probe": "AB_gradcheck", "seed": seed}
    points = [("stage1", os.path.join(LOGS, f"ab_stage1_seed{seed}.npz"))]
    tailp = os.path.join(LOGS, "ab_tail_df32.npz")
    if os.path.exists(tailp):
        points.append(("df32_tail", tailp))
    for tag, path in points:
        if not os.path.exists(path):
            continue
        params, _ = ck.load_npz(path, like=like)
        g_dd = jax.jit(jax.grad(dd_loss))(params, batch)
        g_64 = jax.jit(jax.grad(f64_loss))(params, batch)
        gd = jnp.concatenate([x.reshape(-1) for pr in g_dd for x in pr])
        g6 = jnp.concatenate([x.reshape(-1) for pr in g_64 for x in pr])
        rel = float(jnp.linalg.norm(gd - g6) / jnp.linalg.norm(g6))
        cos = float(jnp.vdot(gd, g6)
                    / (jnp.linalg.norm(gd) * jnp.linalg.norm(g6)))
        l_dd = float(dd_loss(params, batch))
        l_64 = float(f64_loss(params, batch))
        out[tag] = {"grad_rel_err": rel, "grad_cos": cos,
                    "loss_df32": l_dd, "loss_f64": l_64,
                    "loss_rel_err": abs(l_dd - l_64) / abs(l_64)}
        print(f"[gradcheck {tag}] rel {rel:.3e} cos {cos:.12f} "
              f"loss_rel {out[tag]['loss_rel_err']:.3e}", flush=True)
    return out


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    seeds = [int(a.split("=")[1]) for a in sys.argv[1:]
             if a.startswith("--seed=")] or [1234]
    basin = "f32"
    if "--bf16" in sys.argv:
        basin = "bf16"
    for a in sys.argv[1:]:
        if a.startswith("--stage1="):
            basin = a.split("=")[1]
    for seed in seeds:
        for name in names:
            if name == "gradcheck":
                row = gradcheck(seed)
            else:
                row = run_tail(name, seed, basin)
            print("PROBE " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
