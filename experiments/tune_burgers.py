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

import inf_cont_burgers as exp

MIXED = {"nt_vector_dtype": "float64", "log_frequency": 2000}

PROBES = {
    # flagship (round-1 recipe) but with weak-Wolfe line search
    "P1": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe"},
        {"dtype": "float64", "tf_epochs": 0, "nt_epochs": 3000,
         "log_frequency": 1000, "nt_line_search": "wolfe"},
    ]},
    # + collocation resampling every 1000 L-BFGS iters in stage 1
    "P2": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "tf_epochs": 0, "nt_epochs": 3000,
         "log_frequency": 1000, "nt_line_search": "wolfe"},
    ]},
    # resampling through the refinement stage too
    "P3": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "tf_epochs": 0, "nt_epochs": 3000,
         "log_frequency": 1000, "nt_line_search": "wolfe",
         "nt_resample": 1000},
    ]},
    # armijo + resampling (isolate the resampling effect)
    "P4": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_resample": 1000},
        {"dtype": "float64", "tf_epochs": 0, "nt_epochs": 3000,
         "log_frequency": 1000},
    ]},
    # P5 with 3-way multi-start on the mixed stage: the basin lottery
    # is decided at init, so run the cheap stage from 3 inits (same
    # train data), pick the champion by training loss, refine only it.
    "P8": {"multi_start": 3, "stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe"},
    ]},
    # P5 but the f64 refinement runs on a one-shot RAR draw (half the
    # collocation budget on the current net's highest-residual points —
    # the shock line), targeting the bad-basin generalization gap.
    "P9": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe",
         "rar_init": True, "rar_pool": 200000},
    ]},
    # P2 with a long f64 refinement (the paper's L-BFGS ran ~50k iters)
    "P5": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe"},
    ]},
    # long refinement + resampled big draws (approximates the continuum
    # loss instead of converging into one draw's floor)
    "P7": {"stages": [
        {**MIXED, "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe",
         "nt_resample": 2000, "N_f": 30000},
    ]},
}


def run_probe(name: str, seed: int = 1234) -> dict:
    stages = PROBES[name]["stages"]
    n_starts = PROBES[name].get("multi_start", 1)
    t0 = time.time()
    ckpt = None
    for i, stage in enumerate(stages):
        hp = dict(stage)
        hp["seed"] = seed
        if ckpt:
            hp["init_checkpoint"] = ckpt
        if i + 1 < len(stages):
            fd, ckpt = tempfile.mkstemp(suffix=".npz")
            os.close(fd)
            hp["save_checkpoint"] = ckpt
        if i == 0 and n_starts > 1:
            # Multi-start: run the cheap first stage from n_starts
            # inits (same train data — init_seed varies, seed fixed),
            # keep the champion by TRAINING loss (never test error),
            # refine only the champion in later stages.
            best = None
            start_ckpts = []
            for j in range(n_starts):
                hp_j = dict(hp, init_seed=seed + 7919 * j)
                fd, ck_j = tempfile.mkstemp(suffix=".npz")
                os.close(fd)
                start_ckpts.append(ck_j)
                hp_j["save_checkpoint"] = ck_j
                r = exp.run(hp_j, plot=False)
                train_loss = float(r["loss_fn"](r["params"], r["batch"]))
                print(f"  start {j}: train loss {train_loss:.4e} "
                      f"(error {r['error']:.4e})", flush=True)
                if best is None or train_loss < best[0]:
                    best = (train_loss, ck_j)
            os.replace(best[1], ckpt)
            for ck_j in start_ckpts:  # losing starts: drop the tempfiles
                if ck_j != best[1] and os.path.exists(ck_j):
                    os.remove(ck_j)
            continue
        result = exp.run(hp, plot=False)
    if ckpt and os.path.exists(ckpt):
        os.remove(ckpt)
    return {"probe": name, "seed": seed, "error": result["error"],
            "duration_s": round(time.time() - t0, 1)}


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
