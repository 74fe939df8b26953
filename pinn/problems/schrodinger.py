"""1D nonlinear Schrödinger residual and loss (continuous inference).

The complex field h = u + iv is represented by a 2-output real network
(reference 1dcomplex-schrodinger/inf_cont_schrodinger.py:60-105).
PDE: i h_t + 0.5 h_xx + |h|² h = 0, split into real/imag residuals

    f_u = u_t + 0.5 v_xx + (u² + v²) v
    f_v = v_t - 0.5 u_xx - (u² + v²) u

Loss = MSE(initial data) + MSE(periodic BCs: value AND x-derivative
matched between x = lb and x = ub) + MSE(residual)
(reference inf_cont_schrodinger.py:107-129).

One Taylor-mode pass per point set delivers (h, h_x, h_xx, h_t) for
both outputs simultaneously — the reference needed four separate
``tape.gradient`` calls plus a persistent nested tape.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from pinn.models import mlp


def _vx(dtype):
    return jnp.array([1.0, 0.0], dtype=dtype)


def _vt(dtype):
    return jnp.array([0.0, 1.0], dtype=dtype)


def mse(x):
    return jnp.mean(jnp.square(x))


def residual(net_params, X_f, lb, ub):
    """(f_u, f_v) at collocation points."""
    dt_ = X_f.dtype
    out = mlp.taylor_apply(net_params, X_f, lb, ub, _vx(dt_), _vt(dt_))
    u, v = out.value[:, 0:1], out.value[:, 1:2]
    u_xx, v_xx = out.d11[:, 0:1], out.d11[:, 1:2]
    u_t, v_t = out.d2[:, 0:1], out.d2[:, 1:2]
    h2 = u * u + v * v
    f_u = u_t + 0.5 * v_xx + h2 * v
    f_v = v_t - 0.5 * u_xx - h2 * u
    return f_u, f_v


class SchrodingerLossTerms(NamedTuple):
    mse_0: jnp.ndarray
    mse_b: jnp.ndarray
    mse_f: jnp.ndarray

    @property
    def total(self):
        return self.mse_0 + self.mse_b + self.mse_f


def ic_bc_terms(net_params, X0, H0, X_lb, X_ub, lb, ub):
    """(mse_0, mse_b): the initial-condition and periodic-boundary
    terms alone — shared by the XLA loss and the fused-kernel loss
    (pinn/ops/pallas_schrodinger.py), where only the residual term is
    replaced."""
    dt_ = X0.dtype
    # Initial condition: per-column means, as the reference sums
    # mean(u err) + mean(v err) (inf_cont_schrodinger.py:117-118) — a
    # block mean over (N, 2) would halve the term's weight.
    H0_pred = mlp.apply(net_params, X0, lb, ub)
    mse_0 = mse(H0[:, 0] - H0_pred[:, 0]) + mse(H0[:, 1] - H0_pred[:, 1])

    # Periodic BCs: match value and x-derivative across the boundary.
    out_lo = mlp.taylor_apply(net_params, X_lb, lb, ub, _vx(dt_), order=1)
    out_hi = mlp.taylor_apply(net_params, X_ub, lb, ub, _vx(dt_), order=1)
    mse_b = (mse(out_lo.value[:, 0] - out_hi.value[:, 0])
             + mse(out_lo.value[:, 1] - out_hi.value[:, 1])
             + mse(out_lo.d1[:, 0] - out_hi.d1[:, 0])
             + mse(out_lo.d1[:, 1] - out_hi.d1[:, 1]))
    return mse_0, mse_b


def loss_terms(net_params, X0, H0, X_lb, X_ub, X_f, lb, ub,
               f_weights: Optional[jnp.ndarray] = None) -> SchrodingerLossTerms:
    """The three loss terms; the reference prints them every step
    (inf_cont_schrodinger.py:128), so they are exposed separately.

    X0: (N_0, 2) initial points (x0, 0); H0: (N_0, 2) their (u, v).
    X_lb/X_ub: (N_b, 2) boundary points at x=lb/x=ub, shared times.
    """
    mse_0, mse_b = ic_bc_terms(net_params, X0, H0, X_lb, X_ub, lb, ub)

    # PDE residual.
    f_u, f_v = residual(net_params, X_f, lb, ub)
    if f_weights is None:
        mse_f = mse(f_u) + mse(f_v)
    else:
        mse_f = (jnp.sum(jnp.square(f_u[:, 0]) * f_weights)
                 + jnp.sum(jnp.square(f_v[:, 0]) * f_weights))
    return SchrodingerLossTerms(mse_0, mse_b, mse_f)


def loss(net_params, X0, H0, X_lb, X_ub, X_f, lb, ub, f_weights=None):
    return loss_terms(net_params, X0, H0, X_lb, X_ub, X_f, lb, ub,
                      f_weights).total
