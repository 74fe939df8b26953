"""Tests for pinn.ensemble — the prediction-averaging facility.

The math contracts (convex combination, triangle-inequality bound,
inverse-metric weighting) are what the measured P14 recipe relies on
(RESULTS.md seed matrix); the EnsemblePINN facade is additionally
exercised end-to-end over two tiny trained PhysicsInformedNN members.
"""

import numpy as np
import pytest

from pinn import ensemble as ens


def test_rel_l2_matches_reference_metric():
    """Same formula as reference 1d-burgers/inf_cont_burgers.py:114-116."""
    rng = np.random.RandomState(0)
    u, v = rng.randn(40, 1), rng.randn(40, 1)
    expect = np.linalg.norm(u - v, 2) / np.linalg.norm(u, 2)
    assert ens.rel_l2(u, v) == pytest.approx(expect, rel=1e-12)
    assert ens.rel_l2(u, u) == 0.0


def test_average_predictions_uniform_and_weighted():
    a = np.full((5, 1), 1.0)
    b = np.full((5, 1), 3.0)
    np.testing.assert_allclose(ens.average_predictions([a, b]), 2.0)
    # Unnormalized weights are projected onto the simplex.
    np.testing.assert_allclose(
        ens.average_predictions([a, b], [3.0, 1.0]), 1.5)
    np.testing.assert_allclose(
        ens.average_predictions([a, b], [6.0, 2.0]), 1.5)


def test_average_predictions_validates_inputs():
    a = np.zeros((4, 1))
    with pytest.raises(ValueError):
        ens.average_predictions([])
    with pytest.raises(ValueError):
        ens.average_predictions([a, np.zeros((3, 1))])
    with pytest.raises(ValueError):
        ens.average_predictions([a, a], [1.0])
    with pytest.raises(ValueError):
        ens.average_predictions([a, a], [-1.0, 2.0])
    with pytest.raises(ValueError):
        ens.average_predictions([a, a], [0.0, 0.0])


def test_inverse_metric_weights():
    w = ens.inverse_metric_weights([1e-6, 3e-6])
    np.testing.assert_allclose(w.sum(), 1.0)
    np.testing.assert_allclose(w[0] / w[1], 3.0)
    with pytest.raises(ValueError):
        ens.inverse_metric_weights([1.0, 0.0])
    with pytest.raises(ValueError):
        ens.inverse_metric_weights([])


def test_triangle_bound_holds_for_averaged_prediction():
    """rel_l2(convex avg) <= weighted mean of member rel_l2 — the
    guarantee that lets recorded arm errors bound an averaging recipe
    without re-running it (RESULTS.md P14 bounds at seeds 7/42)."""
    rng = np.random.RandomState(3)
    u_star = rng.randn(64, 1)
    preds = [u_star + 0.02 * rng.randn(64, 1) for _ in range(3)]
    errors = [ens.rel_l2(u_star, p) for p in preds]
    for weights in (None, [0.5, 0.3, 0.2], [2.0, 1.0, 1.0]):
        avg = ens.average_predictions(preds, weights)
        bound = ens.triangle_bound(errors, weights)
        assert ens.rel_l2(u_star, avg) <= bound + 1e-12
    # Measured sanity anchor: P14 seed-1234 arms (deterministic reruns).
    assert ens.triangle_bound([5.9348e-4, 2.6982e-3]) == pytest.approx(
        1.6458e-3, rel=1e-3)


def test_ensemble_pinn_facade_end_to_end():
    """Two tiny facade members trained from different init seeds:
    EnsemblePINN.predict is the convex combination of member
    predictions, uniform and val_metric-weighted."""
    from pinn.api import PhysicsInformedNN

    rng = np.random.RandomState(1)
    X = rng.uniform(-1.0, 1.0, (32, 1))
    y = np.sin(np.pi * X)
    hp = {"layers": [1, 8, 1], "tf_epochs": 30, "tf_lr": 0.02,
          "tf_b1": 0.9, "tf_eps": 1e-8, "nt_epochs": 0,
          "log_frequency": 100}

    members = [PhysicsInformedNN(hp, None, ub=[1.0], lb=[-1.0], seed=s)
               for s in (0, 1)]
    for m in members:
        m.fit(X, y)

    ens_uni = ens.EnsemblePINN(members)
    got = ens_uni.predict(X)
    expect = np.mean([m.predict(X) for m in members], axis=0)
    np.testing.assert_allclose(got, expect, rtol=1e-6)

    def val(m):
        return float(np.mean((m.predict(X) - y) ** 2))

    ens_wtd = ens.EnsemblePINN(members, val_metric=val)
    w = ens_wtd.weights
    np.testing.assert_allclose(w.sum(), 1.0)
    expect_w = sum(wi * m.predict(X) for wi, m in zip(w, members))
    np.testing.assert_allclose(ens_wtd.predict(X), expect_w, rtol=1e-6)

    with pytest.raises(ValueError):
        ens.EnsemblePINN([])
    with pytest.raises(ValueError):
        ens.EnsemblePINN(members, weights=[1, 1], val_metric=val)


def test_ensemble_pinn_median_combine():
    """combine="median" routes through median_predictions (the P15
    recipe): the pointwise median of three members votes out a single
    outlier arm; weights are rejected (the median takes none)."""

    class Fake:
        def __init__(self, u):
            self.u = np.asarray(u)

        def predict(self, X):
            return self.u

    good = np.linspace(0.0, 1.0, 16).reshape(-1, 1)
    members = [Fake(good), Fake(good + 1e-3), Fake(good + 10.0)]  # one bad arm
    med = ens.EnsemblePINN(members, combine="median")
    np.testing.assert_allclose(med.predict(None), good + 1e-3)

    with pytest.raises(ValueError):
        ens.EnsemblePINN(members, combine="median", weights=[1, 1, 1])
    with pytest.raises(ValueError):
        ens.EnsemblePINN(members, combine="median",
                         val_metric=lambda m: 1.0)
    with pytest.raises(ValueError):
        ens.EnsemblePINN(members, combine="mode")
