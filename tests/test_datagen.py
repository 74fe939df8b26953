"""Offline datagen solvers: quick low-resolution correctness checks
(full-resolution validation against the reference datasets was done at
generation time: Burgers matches to 4e-11, NLS to ~1e-7)."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "datagen"))

from burgers_exact import (burgers_viscous_exact,  # noqa: E402
                           burgers_viscous_periodic_exact)
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


def test_burgers_periodic_exact_solves_the_pde():
    # Independent check: the closed form must satisfy u_t + u u_x =
    # nu u_xx (finite differences on a fine grid) and be 2*pi-periodic.
    # Large-ish viscosity: the front must be resolved by the FD grid
    # for the residual check to converge at O(dx^2).
    nu = 0.5
    nx, nt = 801, 801
    x = np.linspace(0.0, 2 * np.pi, nx)
    t = np.linspace(0.0, 1.0, nt)
    u = burgers_viscous_periodic_exact(nu, x, t)
    assert u.shape == (nx, nt)
    np.testing.assert_allclose(u[0], u[-1], rtol=1e-12)
    dx, dt = x[1] - x[0], t[1] - t[0]
    u_t = (u[1:-1, 2:] - u[1:-1, :-2]) / (2 * dt)
    u_x = (u[2:, 1:-1] - u[:-2, 1:-1]) / (2 * dx)
    u_xx = (u[2:, 1:-1] - 2 * u[1:-1, 1:-1] + u[:-2, 1:-1]) / dx**2
    resid = u_t + u[1:-1, 1:-1] * u_x - nu * u_xx
    assert np.abs(resid).max() < 6e-3  # O(dx^2 + dt^2) discretization


def test_burgers_periodic_exact_matches_cole_hopf_quotient():
    # The value must equal 4 - 2 nu phi_x / phi with phi evaluated
    # directly and phi_x by a numerical derivative (independent of the
    # algebraic simplification used in the implementation).
    nu = 0.1
    x = np.linspace(0.3, 5.9, 41)
    t = np.array([0.0, 0.5])
    u = burgers_viscous_periodic_exact(nu, x, t)

    def phi(xv, tv):
        c = 4.0 * nu * (tv + 1.0)
        return (np.exp(-((xv - 4 * tv) ** 2) / c)
                + np.exp(-((xv - 4 * tv - 2 * np.pi) ** 2) / c))

    h = 1e-6
    for j, tv in enumerate(t):
        phi_x = (phi(x + h, tv) - phi(x - h, tv)) / (2 * h)
        expect = 4.0 - 2.0 * nu * phi_x / phi(x, tv)
        np.testing.assert_allclose(u[:, j], expect, rtol=1e-8)


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


def test_sympy_generator_matches_image_summed_solver():
    # The symbolic (sympy-derived) generator with auto image coverage
    # must agree with the independent image-summed closed form on the
    # reference's sampling grid (x in [-1,1], t in [0,1], nu=0.01/pi —
    # reference datagen/1d-burgers/datagen.py:22-29).
    from burgers_sympy import sample_grid
    nu = 0.01 / np.pi
    x, t, u = sample_grid(nu=nu, nx=48, nt=25)
    ref = burgers_viscous_periodic_exact(nu, x, t)
    assert np.isfinite(u).all()
    np.testing.assert_allclose(u, ref, rtol=1e-9, atol=1e-9)


def test_sympy_generator_two_image_reference_contract():
    # n_images=2 reproduces the reference's hard-coded phi (two
    # Gaussians at 4t and 4t + 2pi): exact agreement at early times,
    # and the documented breakdown (NaN from 0/0 underflow) once the
    # front x - 4t has moved past the retained images.
    from burgers_sympy import sample_grid
    nu = 0.01 / np.pi
    x, t, u2 = sample_grid(nu=nu, nx=32, nt=25, n_images=2)
    _, _, u_auto = sample_grid(nu=nu, nx=32, nt=25)
    early = t <= 0.4  # front stays within one period of the window
    np.testing.assert_allclose(u2[:, early], u_auto[:, early],
                               rtol=1e-10, atol=1e-10)
    assert not np.isfinite(u2[:, t > 0.9]).all()
