"""Recipe probes for the discrete-IRK Burgers families (VERDICT r4
item 9: swap the D1/D2 recipes' emulated-f64 warm-start tails for the
df32 engine).

Round-4 anchors (RESULTS.md):
  D1  mixed 3k → f64 2k       1.7967e-3 @ 444.3s (tail too short)
  D1b mixed 3k → f64 3k       1.3952e-3 @ 294.3s (matrix both stages)
  D2  mixed 6k → f64 4k       λ1 err 0.0049% @ 670.2s
  D2b mixed 6k → f64 3k       NEGATIVE (λ2 drift)

Usage: python experiments/tune_disc.py D1d D2d ... [--seed=1234]

  D1d  inf_disc: mixed 3k → df32 6k (tail 2x D1b's at df32 cost)
  D2d  ide_disc: mixed 6k → df32 8k (tail 2x D2's — λ2 gets the
       iterations D2b lacked, at df32 speed)
"""

from __future__ import annotations

import json
import os
import sys
import time

from _common import setup  # noqa: F401 (path side effect)

LOGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "logs")

MIXED = {"nt_vector_dtype": "float64", "nt_dir_impl": "matrix",
         "tf_epochs": 1000, "log_frequency": 1000}
DF32 = {"dtype": "float64", "net_impl": "df32", "nt_dir_impl": "matrix",
        "tf_epochs": 0, "log_frequency": 1000}

PROBES = {
    "D1d": {"exp": "inf_disc_burgers", "stages": [
        {**MIXED, "nt_epochs": 3000},
        {**DF32, "nt_epochs": 6000},
    ]},
    "D2d": {"exp": "ide_disc_burgers", "stages": [
        {**MIXED, "nt_epochs": 6000},
        {**DF32, "nt_epochs": 8000},
    ]},
}


def run_probe(name: str, seed: int) -> dict:
    spec = PROBES[name]
    exp = __import__(spec["exp"])
    t0 = time.time()
    ckpt = None
    result = None
    for i, stage in enumerate(spec["stages"]):
        hp = dict(stage, seed=seed)
        if ckpt:
            hp["init_checkpoint"] = ckpt
        if i + 1 < len(spec["stages"]):
            ckpt = os.path.join(LOGS, f"disc_{name}_stage{i}.npz")
            hp["save_checkpoint"] = ckpt
        result = exp.run(hp, plot=False)
    row = {"probe": name, "seed": seed, "error": result["error"],
           "duration_s": round(time.time() - t0, 1)}
    if result.get("lambdas"):
        row["lambdas"] = result["lambdas"]
        row["lambdas_noisy"] = result.get("lambdas_noisy")
    return row


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
