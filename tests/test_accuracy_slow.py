"""Slow-tier accuracy regression: re-runs the flagship continuous-
Burgers recipe (the RESULTS.md headline row) under ``pytest -m slow``
so the campaign numbers are reproducible on demand instead of
archaeological (VERDICT round-1 item #9).

Runtime: ~17 min on the TPU chip, longer on CPU — excluded from the
default test run by the ``slow`` marker (pytest.ini).
"""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))

pytestmark = pytest.mark.slow


def test_flagship_burgers_recipe_hits_headline_error():
    import inf_cont_burgers as exp

    stages = [
        {"nt_vector_dtype": "float64", "log_frequency": 2000,
         "tf_epochs": 1000, "nt_epochs": 15000,
         "nt_line_search": "wolfe", "nt_resample": 1000},
        {"dtype": "float64", "tf_epochs": 0, "nt_epochs": 10000,
         "log_frequency": 2000, "nt_line_search": "wolfe"},
    ]
    ckpt = None
    for i, stage in enumerate(stages):
        hp = dict(stage, seed=1234)
        if ckpt:
            hp["init_checkpoint"] = ckpt
        if i + 1 < len(stages):
            fd, ckpt = tempfile.mkstemp(suffix=".npz")
            os.close(fd)
            hp["save_checkpoint"] = ckpt
        result = exp.run(hp, plot=False)
    # Paper-grade budget (Raissi Part I reports ~6.7e-4; BASELINE.md).
    # The flagship recipe must stay at or below this on any backend.
    assert result["error"] <= 8e-4, (
        f"flagship Burgers recipe regressed: rel-L2 {result['error']:.4e}")
