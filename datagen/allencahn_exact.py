"""1D Allen–Cahn dataset via ETDRK4 spectral integration.

Beyond-reference model family: pierremtb/PINNs-TF2.0 ships only Burgers
and Schrödinger; the original PINNs paper's *other* discrete-time
flagship is Allen–Cahn,

    u_t - 0.0001 u_xx + 5 u^3 - 5 u = 0,
    u(0, x) = x^2 cos(pi x),   periodic on [-1, 1),   t in [0, 1],

whose dataset (AC.mat there) is not bundled anywhere in the reference.
This is a self-contained generator for the same problem: stiff linear
part L = 0.0001 d_xx + 5 handled exactly in Fourier space, cubic
nonlinearity N(u) = -5 u^3 by Kassam–Trefethen ETDRK4 (fourth order in
dt), with the phi-function coefficients evaluated by their
contour-integral mean — the standard cure for the 0/0 cancellation at
small |L dt|.

Validation lives in tests/test_allencahn.py: self-convergence in dt
(fourth-order collapse) and in nx, exact-IC and periodicity checks, and
monotone decay of the Ginzburg–Landau energy
E[u] = ∫ 0.0001/2 u_x^2 + 5/4 (u^2-1)^2 dx (Allen–Cahn is its L2
gradient flow, so dE/dt <= 0 is a structural invariant of the true
solution).
"""

from __future__ import annotations

import numpy as np


def _etdrk4_coeffs(Lk: np.ndarray, dt: float, M: int = 32,
                   real: bool = True):
    """E, E2, Q, f1, f2, f3 for ETDRK4 with diagonal linear part Lk.

    Contour-integral evaluation (Kassam & Trefethen 2005, SISC): mean of
    the phi-expressions over M points on a unit circle around each
    dt*Lk — removes the catastrophic cancellation of the closed forms
    near dt*Lk = 0.  For real Lk (``real=True``, e.g. Allen–Cahn's
    diffusion+reaction) a HALF-circle suffices: conjugate-symmetry makes
    the real part of the half-circle mean equal the full-circle mean,
    which is exact by the mean-value property.  For complex Lk
    (``real=False``, e.g. KdV's dispersive i*k^3) that symmetry is
    gone, so the contour must be the FULL circle of roots of unity —
    only then does the point mean equal the Cauchy integral for an
    arbitrary complex center.  (A half-circle here carries O(1e-2)
    coefficient errors that happen to cancel for purely imaginary Lk
    but would silently corrupt e.g. complex Ginzburg–Landau.)
    """
    E = np.exp(dt * Lk)
    E2 = np.exp(0.5 * dt * Lk)
    if real:
        r = np.exp(1j * np.pi * (np.arange(1, M + 1) - 0.5) / M)
    else:
        r = np.exp(2j * np.pi * (np.arange(1, M + 1) - 0.5) / M)
    LR = dt * Lk[:, None] + r[None, :]
    eLR = np.exp(LR)
    Q = dt * np.mean((np.exp(LR / 2) - 1.0) / LR, axis=1)
    f1 = dt * np.mean(
        (-4.0 - LR + eLR * (4.0 - 3.0 * LR + LR ** 2)) / LR ** 3, axis=1)
    f2 = dt * np.mean(
        (2.0 + LR + eLR * (-2.0 + LR)) / LR ** 3, axis=1)
    f3 = dt * np.mean(
        (-4.0 - 3.0 * LR - LR ** 2 + eLR * (4.0 - LR)) / LR ** 3, axis=1)
    if real:
        Q, f1, f2, f3 = Q.real, f1.real, f2.real, f3.real
    return E, E2, Q, f1, f2, f3


def allencahn_etdrk4(nx: int = 512, nt: int = 201, substeps: int = 4,
                     t_final: float = 1.0, diff: float = 1e-4,
                     react: float = 5.0) -> dict:
    """Integrate u_t = diff*u_xx + react*(u - u^3) on the periodic grid
    x = -1 + 2 j/nx, saving nt frames on t = linspace(0, t_final, nt).
    Returns the reference-style dict layout {x (1,nx), tt (1,nt),
    uu (nx, nt) float64}."""
    x = -1.0 + 2.0 * np.arange(nx) / nx
    t = np.linspace(0.0, t_final, nt)
    k = 2.0 * np.pi * np.fft.fftfreq(nx, d=2.0 / nx)
    Lk = -diff * k ** 2 + react

    u = x ** 2 * np.cos(np.pi * x)
    v = np.fft.fft(u)
    uu = np.empty((nx, nt), dtype=np.float64)
    uu[:, 0] = u

    def N(vhat):
        return -react * np.fft.fft(np.fft.ifft(vhat).real ** 3)

    dt = (t[1] - t[0]) / substeps
    E, E2, Q, f1, f2, f3 = _etdrk4_coeffs(Lk, dt)
    for j in range(1, nt):
        for _ in range(substeps):
            Nv = N(v)
            a = E2 * v + Q * Nv
            Na = N(a)
            b = E2 * v + Q * Na
            Nb = N(b)
            c = E2 * a + Q * (2.0 * Nb - Nv)
            Nc = N(c)
            v = E * v + f1 * Nv + 2.0 * f2 * (Na + Nb) + f3 * Nc
        uu[:, j] = np.fft.ifft(v).real
        v = np.fft.fft(uu[:, j])  # discard imaginary round-off drift

    return {"x": x[None, :], "tt": t[None, :], "uu": uu}


def ginzburg_landau_energy(u: np.ndarray, diff: float = 1e-4,
                           react: float = 5.0, L: float = 2.0) -> float:
    """E[u] = ∫ diff/2 u_x^2 + react/4 (u^2-1)^2 dx on the periodic grid
    (spectral derivative; the mean-value quadrature is exact for
    trigonometric polynomials)."""
    u = np.asarray(u, dtype=np.float64)
    nx = u.shape[0]
    k = 2.0 * np.pi * np.fft.fftfreq(nx, d=L / nx)
    u_x = np.fft.ifft(1j * k * np.fft.fft(u)).real
    dens = 0.5 * diff * u_x ** 2 + 0.25 * react * (u ** 2 - 1.0) ** 2
    return float(dens.mean() * L)


def generate(path: str = "data/AC.npz", **kw) -> dict:
    out = allencahn_etdrk4(**kw)
    if path:
        np.savez_compressed(path, **out)
    return out


if __name__ == "__main__":
    import sys
    path = sys.argv[1] if len(sys.argv) > 1 else "data/AC.npz"
    data = generate(path)
    print(f"wrote {path}: x{data['x'].shape} tt{data['tt'].shape} "
          f"uu{data['uu'].shape}")
