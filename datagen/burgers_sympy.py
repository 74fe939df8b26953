"""Symbolic Cole–Hopf Burgers data generator (sympy).

Parity target: reference datagen/1d-burgers/datagen.py:5-29 — the
reference builds the periodic traveling-wave solution symbolically
(phi as a sum of two Gaussian images, u = -2 nu phi_x / phi + 4 via
sympy.diff + lambdify) and samples it on a 256x100 grid over
x in [-1, 1], t in [0, 1], saving burgers_{x,t,u}.npy.

This port keeps the symbolic derivation (the point of the generator:
the derivative of phi is taken by the CAS, not by hand) but fixes two
things about the reference's realization:

- The image count is a parameter.  The reference hard-codes the two
  images k in {0, 1}; on this grid the front x - 4t walks left to -5
  while the nearest image center can be at 2 pi k with k = -1, so for
  t >~ 0.8 both retained Gaussians underflow to zero and u = 0/0 + 4
  evaluates to NaN.  ``n_images=2`` reproduces the reference contract;
  the default ``n_images="auto"`` includes every image whose center the
  front approaches (cross-checked against the non-symbolic image-summed
  solver in burgers_exact.burgers_viscous_periodic_exact).
- Sampling is a vectorized lambdify call over the meshgrid instead of a
  Python double loop.
"""

from __future__ import annotations

import numpy as np
import sympy as sp


def build_symbolic_u(k_lo: int = 0, k_hi: int = 1):
    """Return (u_expr, (t, x, nu)) for the Cole–Hopf potential summed
    over images k in [k_lo, k_hi]:

        phi = sum_k exp(-(x - 4 t - 2 pi k)^2 / (4 nu (t + 1)))
        u   = -2 nu phi_x / phi + 4
    """
    x, nu, t = sp.symbols("x nu t")
    c = 4 * nu * (t + 1)
    phi = sum(sp.exp(-((x - 4 * t - 2 * sp.pi * k) ** 2) / c)
              for k in range(k_lo, k_hi + 1))
    u = -2 * nu * phi.diff(x) / phi + 4
    return u, (t, x, nu)


def sample_grid(nu: float = 0.01 / np.pi, nx: int = 256, nt: int = 100,
                x_span=(-1.0, 1.0), t_span=(0.0, 1.0),
                n_images: int | str = "auto"):
    """Sample u on the grid; returns (x[nx], t[nt], u[nx, nt])."""
    x = np.linspace(x_span[0], x_span[1], nx)
    t = np.linspace(t_span[0], t_span[1], nt)
    if n_images == "auto":
        # Cover every image center the front x - 4t can come near.
        front_min = x_span[0] - 4.0 * t_span[1]
        front_max = x_span[1] - 4.0 * t_span[0]
        k_lo = int(np.floor(front_min / (2 * np.pi))) - 1
        k_hi = int(np.ceil(front_max / (2 * np.pi))) + 1
    else:
        k_lo, k_hi = 0, int(n_images) - 1
    expr, syms = build_symbolic_u(k_lo, k_hi)
    ufunc = sp.lambdify(syms, expr, modules="numpy")
    X, T = np.meshgrid(x, t, indexing="ij")
    with np.errstate(invalid="ignore", divide="ignore", under="ignore"):
        u = np.asarray(ufunc(T, X, nu), dtype=np.float64)
    return x, t, u


def generate(out_dir: str = "data", n_images: int | str = "auto") -> dict:
    """Write burgers_{x,t,u}.npy like the reference generator does."""
    x, t, u = sample_grid(n_images=n_images)
    np.save(f"{out_dir}/burgers_x", x)
    np.save(f"{out_dir}/burgers_t", t)
    np.save(f"{out_dir}/burgers_u", u)
    return {"x": x, "t": t, "u": u}


if __name__ == "__main__":
    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "data"
    d = generate(out)
    print(f"wrote {out}/burgers_{{x,t,u}}.npy: "
          f"x{d['x'].shape} t{d['t'].shape} u{d['u'].shape}")
