"""Unit tests for the probe-driver selection/averaging machinery
(experiments/tune_burgers.py).

The probes themselves are convergence-grade TPU campaigns (hours); what
can regress silently is the *driver logic* — champion selection by
held-out metric, two-arm selection (P13), two-arm prediction averaging
(P14), ensemble weighting — so these tests monkeypatch ``_execute`` /
``val_metric`` with synthetic arms and check the math: which arm is
picked, how predictions combine, what the emitted row contains.

Reference context: the recipes close VERDICT round-2 item #2 (seed
lottery) against the error metric of reference
1d-burgers/inf_cont_burgers.py:114-116.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))


@pytest.fixture
def tb():
    import tune_burgers
    return tune_burgers


class _FakeData:
    def __init__(self, u_star):
        self.u_star = u_star


def _fake_result(u_star, u_pred, error=None):
    err = (float(np.linalg.norm(u_star - u_pred) / np.linalg.norm(u_star))
           if error is None else error)
    return {"data": _FakeData(u_star), "u_pred": u_pred, "error": err}


def test_p14_avg_arms_math(tb, monkeypatch):
    """P14 averages the two arms' grid predictions; uniform error obeys
    the triangle-inequality bound rel_l2(mean) <= mean(rel_l2), and the
    weighted variant uses 1/val_residual weights."""
    rng = np.random.RandomState(0)
    u_star = rng.randn(50, 1)
    # Opposite-signed perturbations: the average should nearly cancel.
    eps = 0.01 * rng.randn(50, 1)
    arms = {"P5": _fake_result(u_star, u_star + eps),
            "P10": _fake_result(u_star, u_star - eps)}
    vals = {"P5": 1e-6, "P10": 3e-6}

    monkeypatch.setattr(tb, "_execute", lambda name, seed: arms[name])
    monkeypatch.setattr(tb, "val_metric",
                        lambda r: vals["P5" if r is arms["P5"] else "P10"])

    row = tb.run_probe("P14", seed=77)
    assert row["probe"] == "P14"
    assert set(row["arm_errors"]) == {"P5", "P10"}
    # Exact cancellation for the uniform average of +eps/-eps arms.
    assert row["error_uniform"] < 1e-12
    assert row["error"] == row["error_uniform"]
    # Weighted average keeps a (1/1e-6 - 1/3e-6)-proportional residue of
    # eps: w5 - w10 = (1 - 1/3)/(1 + 1/3) = 1/2 of the perturbation.
    expected_wtd = 0.5 * np.linalg.norm(eps) / np.linalg.norm(u_star)
    assert row["error_weighted"] == pytest.approx(expected_wtd, rel=1e-6)
    # Triangle-inequality bound vs the arm errors.
    bound = np.mean([r["error"] for r in arms.values()])
    assert row["error_uniform"] <= bound + 1e-12


def test_p13_two_arm_selection_picks_min_val(tb, monkeypatch):
    """P13 keeps the arm with the smaller held-out validation residual
    (NOT the smaller test error — that would peek at labels)."""
    u_star = np.ones((10, 1))
    arms = {"P5": _fake_result(u_star, 1.1 * u_star),   # error 0.1
            "P10": _fake_result(u_star, 1.3 * u_star)}  # error 0.3
    # val metric mis-ranks on purpose: P10 looks better held-out.
    vals = {"P5": 5e-6, "P10": 4e-6}
    monkeypatch.setattr(tb, "_execute", lambda name, seed: arms[name])
    monkeypatch.setattr(tb, "val_metric",
                        lambda r: vals["P5" if r is arms["P5"] else "P10"])

    row = tb.run_probe("P13", seed=77)
    assert row["picked_arm"] == "P10"
    assert row["error"] == pytest.approx(arms["P10"]["error"])
    assert row["arm_errors"]["P5"] == pytest.approx(arms["P5"]["error"])


def test_val_metric_uses_no_test_data(tb):
    """The held-out selection metric must be computable from the
    training batch + a fresh collocation draw only — it must not touch
    ``data.u_star``/``X_star`` (the test labels)."""
    import inspect
    src = inspect.getsource(tb.val_metric)
    assert "u_star" not in src and "X_star" not in src


def test_p15_median_arms_votes_out_one_bad_arm(tb, monkeypatch):
    """P15 combines three arms by pointwise median: with two good arms
    and one bad-basin arm, the median must track the good pair (the
    regime where P14's uniform average dilutes, RESULTS.md seed
    matrix)."""
    rng = np.random.RandomState(0)
    u_star = rng.randn(400)
    good1 = u_star + 5e-4 * rng.randn(400)
    good2 = u_star + 6e-4 * rng.randn(400)
    bad = u_star + 3e-3 * rng.randn(400)
    arms = {"P5": _fake_result(u_star, good1),
            "P10": _fake_result(u_star, bad),
            "P10b": _fake_result(u_star, good2)}
    monkeypatch.setattr(tb, "_execute", lambda name, seed: arms[name])
    monkeypatch.setattr(tb, "val_metric", lambda r: r["error"] ** 2)

    row = tb.run_probe("P15", seed=1)
    assert set(row["arm_errors"]) == {"P5", "P10", "P10b"}
    # Median beats the uniform average AND every bound the average has.
    assert row["error_median"] < row["error_uniform"]
    assert row["error"] == row["error_median"]
    # The bad arm is voted out: median error lands near the good arms.
    assert row["error_median"] < 1.5 * arms["P5"]["error"]


def test_p10b_uses_salted_start_pool(tb):
    """P10b must decorrelate its multi-start pool from P10 via
    start_salt (otherwise the 'independent' third arm is a replay)."""
    assert tb.PROBES["P10b"]["start_salt"] != 0
    assert tb.PROBES["P10"].get("start_salt", 0) == 0
    assert tb.PROBES["P15"]["median_arms"] == ["P5", "P10", "P10b"]


def test_median_predictions_shape_and_majority():
    from pinn import ensemble as ens
    a = np.zeros((5,))
    b = np.ones((5,))
    c = np.full((5,), 0.1)
    med = ens.median_predictions([a, b, c])
    np.testing.assert_allclose(med, c)  # middle value pointwise
    with pytest.raises(ValueError):
        ens.median_predictions([a, np.zeros((4,))])
    with pytest.raises(ValueError):
        ens.median_predictions([])
