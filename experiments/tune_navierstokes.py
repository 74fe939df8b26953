"""Recipe probes for Navier–Stokes identification accuracy (VERDICT r4
items 2/3: fix λ1 — 4.25% clean error vs the paper's sub-1% — and
deploy the df32 engine on the family's dominant f64 tail).

Each probe chains stages through per-case checkpoints (the experiment
trains clean AND 1%-noise models per run) and prints one PROBE JSON
line with both λ pairs, per-λ relative errors, and field errors.

Usage: python experiments/tune_navierstokes.py N1 N2 ... [--seed=1234]

Probe map (measured rows land in RESULTS.md):
  N0   the round-4 campaign recipe (mixed 5k+15k → f64 8k) — anchor
  N1   equal-schedule A/B: the f64 tail swapped for df32 (speed + λ)
  N2   df32 tail at 30k iters (what the ~5x/iter buys: a λ1 tail 3.75x
       longer than round 4's at a fraction of the wall-clock)
  N3   N2 + N_u=10000 (data-size lever)
  N4   mixed-only at N_u=2000 (sweep point, no tail)
  N5   mixed-only at N_u=10000 (sweep point, no tail)
  N6   capacity probe: width-40 psi-p net (4x the 20-wide default's
       per-layer FLOPs — free on the MXU), mixed → df32 20k.  At
       convergence λ is exactly the lstsq solution GIVEN the net
       (∂loss/∂λ = 0), so the ~3-4% λ1 bias at width 20 must come from
       the net's field misfit; this probes that mechanism directly.
  N7   N6 + N_u=10000 (capacity and data together)
  N8   residual-collocation probe at width 20: residual on the data
       points + a 20k LHS draw (hp N_f; pinn.problems.navierstokes
       loss X_f) — attacks the measured derivative-misfit bias by
       forcing PDE consistency BETWEEN the data samples (ns_diag.py:
       noisy runs beat clean ⇒ the net overfits the 5k draw)
"""

from __future__ import annotations

import json
import os
import sys
import time

from _common import setup  # noqa: F401 (path side effect)

import ide_cont_navierstokes as exp

LOGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "logs")

MIXED = {"nt_vector_dtype": "float64", "nt_dir_impl": "matrix",
         "tf_epochs": 5000, "nt_epochs": 15000, "log_frequency": 1000}
F64_TAIL = {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0,
            "log_frequency": 500}
DF32_TAIL = {**F64_TAIL, "net_impl": "df32", "log_frequency": 2000}

PROBES = {
    "N0": {"stages": [dict(MIXED), {**F64_TAIL, "nt_epochs": 8000}]},
    "N1": {"stages": [dict(MIXED), {**DF32_TAIL, "nt_epochs": 8000}]},
    "N2": {"stages": [dict(MIXED), {**DF32_TAIL, "nt_epochs": 30000}]},
    "N3": {"stages": [{**MIXED, "N_u": 10000},
                      {**DF32_TAIL, "nt_epochs": 30000, "N_u": 10000}]},
    "N4": {"stages": [{**MIXED, "N_u": 2000}]},
    "N5": {"stages": [{**MIXED, "N_u": 10000}]},
}

WIDE = [3] + [40] * 8 + [2]
PROBES["N6"] = {"stages": [{**MIXED, "layers": WIDE},
                           {**DF32_TAIL, "nt_epochs": 20000,
                            "layers": WIDE}]}
PROBES["N7"] = {"stages": [{**MIXED, "layers": WIDE, "N_u": 10000},
                           {**DF32_TAIL, "nt_epochs": 20000,
                            "layers": WIDE, "N_u": 10000}]}
PROBES["N8"] = {"stages": [{**MIXED, "N_f": 20000},
                           {**DF32_TAIL, "nt_epochs": 10000,
                            "N_f": 20000}]}
# N7s: N7 with the tail cut 20k → 6k.  The first (contended, timed
# out) N7 run showed the width-40 tail plateaus by ~2k iters
# (λ1 0.990479 @ 2k → 0.990483 @ 6k, loss flat at 6.42e-6 —
# logs/ns_n7.log), so 20k buys nothing at ~5x the width-20 tail's
# per-iter cost; 6k keeps 3x margin past the plateau.
PROBES["N7s"] = {"stages": [{**MIXED, "layers": WIDE, "N_u": 10000},
                            {**DF32_TAIL, "nt_epochs": 6000,
                             "layers": WIDE, "N_u": 10000}]}
# N9: every measured λ-bias lever at once — width-40 capacity (N6),
# N_u=10k data (N5/N7), residual collocation between the samples (N8).
# Stage 0 is BIT-IDENTICAL to N7's (copy its checkpoint + --reuse), so
# the tail is a controlled A/B vs N7s: same basin, + a 20k-LHS X_f
# collocation set in the df32 tail only.  Tail 5k (width-40 X_f steps
# are ~0.5 s/iter; N8's collocation tail was still improving at 10k,
# but capacity should buy earlier convergence as it did for N7).
PROBES["N9"] = {"stages": [{**MIXED, "layers": WIDE, "N_u": 10000},
                           {**DF32_TAIL, "nt_epochs": 5000,
                            "layers": WIDE, "N_u": 10000,
                            "N_f": 20000}]}
# N10/N11: cheap mixed-only extensions of the measured capacity x data
# lever after N7 stage 0 landed λ1 0.952%/1.031% with NO tail (tails
# measured exhausted — N7s row).  N10 doubles the data again
# (N5→N7 halved the error twice along this axis); N11 keeps N_u=10k
# and instead adds a 20k-LHS residual collocation set to the MIXED
# stage — PDE consistency between the samples where the optimizer
# actually moves, not in a post-hoc tail.
PROBES["N10"] = {"stages": [{**MIXED, "layers": WIDE, "N_u": 20000}]}
PROBES["N11"] = {"stages": [{**MIXED, "layers": WIDE, "N_u": 10000,
                             "N_f": 20000}]}


def run_probe(name: str, seed: int, reuse: bool = False) -> dict:
    spec = PROBES[name]
    stages = spec["stages"]
    t0 = time.time()
    ckpt = None
    result = None
    for i, stage in enumerate(stages):
        hp = dict(stage, seed=seed)
        if ckpt:
            hp["init_checkpoint"] = ckpt
        if i + 1 < len(stages):
            ckpt = os.path.join(LOGS, f"ns_{name}_stage{i}.npz")
            hp["save_checkpoint"] = ckpt
            if (reuse and os.path.exists(ckpt)
                    and os.path.exists(ckpt[:-4] + "-noisy.npz")):
                # Timed-out retries skip the already-checkpointed stage
                # (runs are deterministic, so the saved iterate equals a
                # replay); duration_s then covers the later stages only
                # — annotate the RESULTS.md row accordingly.
                print(f"reusing stage-{i} checkpoint {ckpt}", flush=True)
                continue
        result = exp.run(hp, plot=False)
    l1, l2 = result["lambdas"]
    l1n, l2n = result["lambdas_noisy"]
    l1s, l2s = exp.LAMBDAS_STAR
    return {"probe": name, "seed": seed,
            "error": result["error"],
            "lambda1": l1, "lambda2": l2,
            "lambda1_noisy": l1n, "lambda2_noisy": l2n,
            "l1_err_pct": round(100 * abs(l1 - l1s) / l1s, 4),
            "l2_err_pct": round(100 * abs(l2 - l2s) / l2s, 4),
            "l1_noisy_err_pct": round(100 * abs(l1n - l1s) / l1s, 4),
            "l2_noisy_err_pct": round(100 * abs(l2n - l2s) / l2s, 4),
            "field_errors": result["field_errors"],
            "duration_s": round(time.time() - t0, 1)}


def main():
    names = [a for a in sys.argv[1:] if a in PROBES]
    seeds = [int(a.split("=")[1]) for a in sys.argv[1:]
             if a.startswith("--seed=")] or [1234]
    reuse = "--reuse" in sys.argv[1:]
    for seed in seeds:
        for name in names:
            row = run_probe(name, seed, reuse=reuse)
            print("PROBE " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
