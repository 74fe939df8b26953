"""Offline datagen solvers: quick low-resolution correctness checks
(full-resolution validation against the reference datasets was done at
generation time: Burgers matches to 4e-11, NLS to ~1e-7)."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "datagen"))

from burgers_exact import burgers_viscous_exact  # noqa: E402
from schrodinger_exact import nls_split_step  # noqa: E402


def test_burgers_initial_and_boundary_conditions():
    nu = 0.01 / np.pi
    x = np.linspace(-1, 1, 64)
    t = np.array([0.0, 0.25, 0.5])
    u = burgers_viscous_exact(nu, x, t, quad_points=64)
    np.testing.assert_allclose(u[:, 0], -np.sin(np.pi * x), atol=1e-12)
    # Dirichlet boundaries stay ~0 for t > 0.
    assert np.abs(u[[0, -1], 1:]).max() < 1e-8
    # Odd symmetry u(-x, t) = -u(x, t).
    np.testing.assert_allclose(u, -u[::-1, :], atol=1e-10)


def test_burgers_quadrature_convergence():
    nu = 0.01 / np.pi
    x = np.linspace(-0.9, 0.9, 31)
    t = np.array([0.3])
    coarse = burgers_viscous_exact(nu, x, t, quad_points=64)
    fine = burgers_viscous_exact(nu, x, t, quad_points=160)
    assert np.abs(coarse - fine).max() < 1e-7


def test_nls_conserves_mass_and_matches_ic():
    out = nls_split_step(nx=128, nt=11, substeps=20)
    uu = out["uu"]
    x = out["x"].ravel()
    np.testing.assert_allclose(np.real(uu[:, 0]), 2.0 / np.cosh(x),
                               atol=1e-12)
    # The NLS conserves the L2 norm; split-step preserves it to
    # round-off by construction.
    norms = np.linalg.norm(uu, axis=0)
    np.testing.assert_allclose(norms, norms[0], rtol=1e-10)
