"""Slow-tier accuracy regression: re-runs every campaign recipe (the
RESULTS.md headline rows) under ``pytest -m slow`` so the campaign
numbers are reproducible on demand instead of archaeological (VERDICT
round-1 item #9, round-2 item #5 — the whole table, not just the
flagship).

The recipes and budgets live in ``experiments/run_campaign.py``
(CAMPAIGN / BUDGETS — single source of truth, also behind
``run_campaign.py --verify``); this module is a thin pytest wrapper.

Runtime: ~17 min for the Burgers flagship, ~1.5 h for the full table on
the TPU chip (longer on CPU) — excluded from the default run by the
``slow`` marker (pytest.ini).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))

pytestmark = pytest.mark.slow

import run_campaign  # noqa: E402


@pytest.mark.parametrize("name", list(run_campaign.CAMPAIGN))
def test_campaign_recipe_hits_headline_error(name):
    budget = run_campaign.BUDGETS.get(name)
    if budget is None:
        pytest.skip(f"{name}: no recorded budget yet (new recipe)")
    row = run_campaign.run_one(name, quick=False, f32=False)
    assert row["error"] <= budget, (
        f"{name} campaign recipe regressed: error {row['error']:.4e} "
        f"(budget {budget:.1e}, ~1.5x the RESULTS.md headline)")
