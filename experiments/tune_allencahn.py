"""Recipe probes for discrete Allen–Cahn wall-clock (VERDICT r4 item 4:
the 3.3364e-3 flagship row is a 3.1h single-CPU-core f64 run; apply the
disc-family mixed→f64 warm-start pattern on the chip — target ≤3.4e-3
at ≤30 min).

Usage: python experiments/tune_allencahn.py A1 A2 ... [--seed=1234]

  A1  mixed f32/f64vec 20k → f64 warm-start 5k (the D1/D2 pattern)
  A2  mixed 30k → f64 3k (if the f64 stage dominates)
  A3  mixed 20k → f64 10k (if A1's tail is too short for 3.4e-3)
"""

from __future__ import annotations

import json
import os
import sys
import time

from _common import setup  # noqa: F401 (path side effect)

import inf_disc_allencahn as exp

LOGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "logs")

MIXED = {"nt_vector_dtype": "float64", "nt_dir_impl": "matrix",
         "tf_epochs": 1000, "nt_epochs": 20000, "log_frequency": 2000}
F64 = {"dtype": "float64", "nt_dir_impl": "matrix", "tf_epochs": 0,
       "log_frequency": 1000}

PROBES = {
    "A1": {"stages": [dict(MIXED), {**F64, "nt_epochs": 5000}]},
    "A2": {"stages": [{**MIXED, "nt_epochs": 30000},
                      {**F64, "nt_epochs": 3000}]},
    "A3": {"stages": [dict(MIXED), {**F64, "nt_epochs": 10000}]},
    # df32 tail (pinn/ops/df32.py): the emulated-f64 stage swapped for
    # the compensated-f32 engine, tail 2x A1's at a fraction of the cost
    "A1d": {"stages": [dict(MIXED),
                       {**F64, "net_impl": "df32", "nt_epochs": 10000}]},
    # Tail-only replay: reuse A1's committed mixed-stage checkpoint
    # (logs/ac_A1_stage0.npz, the measured 20k mixed iterate) and run a
    # LONG df32 tail — A1's f64-5k tail landed 5.38e-3 (PARTIAL, target
    # 3.4e-3) and the 3.34e-3 CPU flagship needed 40k f64 iters with the
    # loss still descending, so the tail length is the binding lever and
    # df32's ~8x disc step makes 30k iters cheaper than A1's 5k f64.
    "A1t": {"stages": [
        {**F64, "net_impl": "df32", "nt_epochs": 30000,
         "log_frequency": 2000,
         "init_checkpoint": os.path.join(LOGS, "ac_A1_stage0.npz")}]},
}


def run_probe(name: str, seed: int) -> dict:
    stages = PROBES[name]["stages"]
    t0 = time.time()
    ckpt = None
    result = None
    for i, stage in enumerate(stages):
        hp = dict(stage, seed=seed)
        if ckpt:
            hp["init_checkpoint"] = ckpt
        if i + 1 < len(stages):
            ckpt = os.path.join(LOGS, f"ac_{name}_stage{i}.npz")
            hp["save_checkpoint"] = ckpt
        result = exp.run(hp, plot=False)
    return {"probe": name, "seed": seed, "error": result["error"],
            "duration_s": round(time.time() - t0, 1)}


def main():
    names = [a for a in sys.argv[1:] if a in PROBES]
    seeds = [int(a.split("=")[1]) for a in sys.argv[1:]
             if a.startswith("--seed=")] or [1234]
    for seed in seeds:
        for name in names:
            row = run_probe(name, seed)
            print("PROBE " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
