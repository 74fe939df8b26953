"""Figure creation and results persistence.

Parity target: reference utils/plotting.py — golden-ratio figure
sizing, ``newfig``/``savefig`` (pdf + png), and ``save_result_dir``
writing ``results/<timestamp>-<script>/{graph.pdf, graph.png, hp.json}``.
Differences: no LaTeX/pgf dependency (mathtext renders the same labels
without a TeX install) and a non-interactive Agg backend so experiments
run headless on TPU hosts.
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_MEAN = (np.sqrt(5.0) - 1.0) / 2.0
_TEXT_WIDTH_IN = 390.0 / 72.27  # LaTeX textwidth in inches

# Relative save paths resolve against the repo root, not the process
# cwd: experiments pass save_path="experiments", and invoking run()
# from inside experiments/ must not create experiments/experiments/.
_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def figsize(scale: float, nplots: float = 1.0):
    width = _TEXT_WIDTH_IN * scale
    return [width, nplots * width * GOLDEN_MEAN]


def newfig(width: float, nplots: float = 1.0):
    fig = plt.figure(figsize=figsize(width, nplots))
    ax = fig.add_subplot(111)
    return fig, ax


def savefig(filename: str, crop: bool = True):
    kw = dict(bbox_inches="tight", pad_inches=0.02) if crop else {}
    plt.savefig(f"{filename}.pdf", **kw)
    plt.savefig(f"{filename}.png", dpi=150, **kw)


def save_result_dir(save_path: str, save_hp: dict) -> str:
    """Persist current figure + hp next to the experiment
    (reference utils/plotting.py:8-16 layout)."""
    if not os.path.isabs(save_path):
        save_path = os.path.join(_REPO_ROOT, save_path)
    script = os.path.splitext(os.path.basename(sys.argv[0]))[0] or "run"
    stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    res_dir = os.path.join(save_path, "results", f"{stamp}-{script}")
    os.makedirs(res_dir, exist_ok=True)
    print("Saving results to directory ", res_dir)
    savefig(os.path.join(res_dir, "graph"))
    with open(os.path.join(res_dir, "hp.json"), "w") as fh:
        json.dump(save_hp, fh)
    return res_dir
