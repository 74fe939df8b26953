"""Smoke tests for the figure builders and plot persistence.

These cover the parity surface of the reference's plot functions
(reference 1d-burgers/burgersutil.py:133-407 — four builders — and
1dcomplex-schrodinger/schrodingerutil.py:64-147) plus
``pinn.utils.plotting``'s results-dir layout (reference
utils/plotting.py:8-16): each builder must render synthetic inputs of
the real shapes and persist ``graph.pdf``/``graph.png``/``hp.json``
under ``results/<stamp>-<script>/``.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))

import matplotlib.pyplot as plt  # noqa: E402

from pinn.utils import plotting  # noqa: E402
import viz  # noqa: E402

NX, NT = 24, 130  # t-axis covers the slice indices (25/50/75/100/125)


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


@pytest.fixture
def grid():
    x = np.linspace(-1.0, 1.0, NX)[:, None]
    t = np.linspace(0.0, 1.0, NT)[:, None]
    X, T = np.meshgrid(x[:, 0], t[:, 0])          # (NT, NX)
    X_star = np.hstack([X.reshape(-1, 1), T.reshape(-1, 1)])
    Exact_u = np.sin(np.pi * X) * np.exp(-T)      # (NT, NX)
    u_pred = Exact_u.reshape(-1, 1)
    return x, t, X, T, X_star, Exact_u, u_pred


def _assert_result_dir(res_dir):
    assert os.path.isdir(res_dir)
    for name in ("graph.pdf", "graph.png", "hp.json"):
        path = os.path.join(res_dir, name)
        assert os.path.isfile(path) and os.path.getsize(path) > 0, name


def test_figsize_and_newfig():
    w, h = plotting.figsize(1.0, 2.0)
    assert h == pytest.approx(2.0 * w * plotting.GOLDEN_MEAN)
    fig, ax = plotting.newfig(1.0)
    assert tuple(fig.get_size_inches()) == pytest.approx(
        tuple(plotting.figsize(1.0)), rel=1e-6)


def test_save_result_dir_layout(tmp_path):
    fig, ax = plotting.newfig(1.0)
    ax.plot([0, 1], [0, 1])
    res_dir = plotting.save_result_dir(str(tmp_path), {"N_u": 7})
    _assert_result_dir(res_dir)
    # layout: <save_path>/results/<stamp>-<script>
    assert os.path.dirname(os.path.dirname(res_dir)) == str(tmp_path)
    assert os.path.basename(os.path.dirname(res_dir)) == "results"
    import json
    with open(os.path.join(res_dir, "hp.json")) as fh:
        assert json.load(fh) == {"N_u": 7}


def test_plot_inf_cont_results(tmp_path, grid):
    x, t, X, T, X_star, Exact_u, u_pred = grid
    X_u_train = X_star[:: NX * 10]
    u_train = u_pred[:: NX * 10]
    res_dir = viz.plot_inf_cont_results(
        X_star, u_pred, X_u_train, u_train, Exact_u, X, T, x, t,
        save_path=str(tmp_path), save_hp={"N_u": len(u_train)})
    _assert_result_dir(res_dir)


def test_plot_ide_cont_results(tmp_path, grid):
    x, t, X, T, X_star, Exact_u, u_pred = grid
    X_u_train = X_star[:: NX * 10]
    u_train = u_pred[:: NX * 10]
    res_dir = viz.plot_ide_cont_results(
        X_star, u_pred, X_u_train, u_train, Exact_u, X, T, x, t,
        1.0001, 0.999, 0.0032, 0.0031,
        save_path=str(tmp_path), save_hp={})
    _assert_result_dir(res_dir)


def test_plot_inf_disc_results(tmp_path, grid):
    x, t, X, T, X_star, Exact_u, u_pred = grid
    idx0, idx1 = 10, 90
    x_0 = x[::2]
    u_0 = Exact_u[idx0, ::2][:, None]
    u_1_pred = Exact_u[idx1, :][:, None]
    res_dir = viz.plot_inf_disc_results(
        x[:, 0], idx0, idx1, x_0, u_0, np.array([1.0]), np.array([-1.0]),
        u_1_pred, Exact_u, x, t,
        save_path=str(tmp_path), save_hp={})
    _assert_result_dir(res_dir)


def test_plot_ide_disc_results(tmp_path, grid):
    x, t, X, T, X_star, Exact_u, u_pred = grid
    idx0, idx1 = 10, 90
    Exact = Exact_u.T  # (NX, NT)
    x_0, u_0 = x[::2], Exact[::2, idx0][:, None]
    x_1, u_1 = x[1::2], Exact[1::2, idx1][:, None]
    res_dir = viz.plot_ide_disc_results(
        x[:, 0], t[:, 0], idx0, idx1, x_0, u_0, x_1, u_1,
        np.array([1.0]), np.array([-1.0]), Exact,
        1.0001, 0.999, 0.0032, 0.0031,
        save_path=str(tmp_path), save_hp={})
    _assert_result_dir(res_dir)


def test_plot_ide_disc_results_kdv_variant(tmp_path, grid):
    # The dispersive-term variant used by experiments/ide_disc_kdv.py.
    x, t, X, T, X_star, Exact_u, u_pred = grid
    idx0, idx1 = 10, 90
    Exact = Exact_u.T
    x_0, u_0 = x[::2], Exact[::2, idx0][:, None]
    x_1, u_1 = x[1::2], Exact[1::2, idx1][:, None]
    res_dir = viz.plot_ide_disc_results(
        x[:, 0], t[:, 0], idx0, idx1, x_0, u_0, x_1, u_1,
        np.array([1.0]), np.array([-1.0]), Exact,
        1.0003, 0.999, 0.0025, 0.0025,
        save_path=str(tmp_path), save_hp={},
        lambda2_star=0.0025, deriv="u_{xxx}")
    _assert_result_dir(res_dir)


def test_plot_schrodinger_results(tmp_path, grid):
    x, t, X, T, X_star, Exact_u, u_pred = grid
    Exact_h = np.abs(Exact_u).T + 1.0  # (NX, NT)
    h_pred = (np.abs(Exact_u) + 1.0).reshape(-1, 1)
    x0 = x[::3]
    tb = t[::10]
    lb = np.array([-1.0, 0.0])
    ub = np.array([1.0, 1.0])
    res_dir = viz.plot_schrodinger_results(
        X_star, u_pred, u_pred, h_pred, Exact_h, X, T, x, t,
        lb, ub, x0, tb,
        save_path=str(tmp_path), save_hp={})
    _assert_result_dir(res_dir)


def test_plot_ide_navierstokes_results(tmp_path):
    from datagen.navierstokes_exact import generate
    d = generate(nx=12, ny=12, nt=3)
    n = d.X_star.shape[0]
    rng = np.random.RandomState(0)
    res_dir = viz.plot_ide_navierstokes_results(
        d, d.u_star + 0.01 * rng.randn(n, 1),
        d.v_star + 0.01 * rng.randn(n, 1),
        d.p_star + 0.01 * rng.randn(n, 1),
        1.0001, 0.998, 0.0099, 0.0102,
        save_path=str(tmp_path), save_hp={})
    _assert_result_dir(res_dir)
