"""Allen–Cahn discrete-time (q-stage IRK) residual and loss.

Beyond-reference model family (pierremtb/PINNs-TF2.0 ships Burgers and
Schrödinger only): the original PINNs paper's other discrete-time
flagship,

    u_t - 0.0001 u_xx + 5 u^3 - 5 u = 0,   x in [-1, 1), periodic,

solved as one large IRK step from the t0 snapshot to t1.  The structure
mirrors :mod:`pinn.problems.burgers`'s discrete-inference mode
(reference 1d-burgers/inf_disc_burgers.py:61-94) with two differences:

* nonlinearity ``F = 5 U^3 - 5 U - diff * U_xx`` (no advection, cubic
  reaction) — still one Taylor-mode pass for (U, U_xx) and one
  MXU-shaped ``F @ W^T`` stage coupling;
* **periodic** boundary conditions instead of homogeneous Dirichlet:
  all q+1 stage values AND their x-derivatives must match between
  x = lb and x = ub (the same periodic contract as continuous
  Schrödinger, reference 1dcomplex-schrodinger/inf_cont_schrodinger.py
  :112-123, lifted to the stage matrix).

Losses are SSE (sum, not mean) like the other discrete modes.
"""

from __future__ import annotations

import jax.numpy as jnp

from pinn.models import mlp
from pinn.problems.burgers import sse, _stage_derivs

DIFF = 1e-4   # diffusion coefficient
REACT = 5.0   # reaction coefficient


def u0_pred_disc_inference(net_params, x_0, lb, ub, dt, irk_weights,
                           diff=DIFF, react=REACT):
    """Backward IRK map: U1(x) (q+1 outputs) -> predicted u at t0.

    U_0 = U_1 + dt * F @ W^T with F = react*(U^3 - U) + diff*(-U_xx)
    evaluated on the first q (stage) columns; W is the (q+1, q) stacked
    [A; b].  Sign convention: u_t = -F, exactly as the Burgers
    N = U U_x - nu U_xx (pinn/problems/burgers.py:120-128)."""
    U1, _, U1_xx = _stage_derivs(net_params, x_0, lb, ub)
    U, U_xx = U1[:, :-1], U1_xx[:, :-1]
    F = react * (U ** 3 - U) - diff * U_xx
    return U1 + dt * F @ irk_weights.T


def periodic_bc_terms(net_params, x_bnd, lb, ub):
    """(value gap, derivative gap) across the periodic boundary.

    ``x_bnd`` is the (2, 1) stack [lb; ub]; returns the (q+1,)-column
    differences U(lb)-U(ub) and U_x(lb)-U_x(ub)."""
    Ub, Ub_x, _ = _stage_derivs(net_params, x_bnd, lb, ub)
    return Ub[0] - Ub[1], Ub_x[0] - Ub_x[1]


def loss_disc_inference(net_params, x_0, u_0, x_bnd, lb, ub, dt,
                        irk_weights, diff=DIFF, react=REACT):
    """SSE(t0 snapshot) + SSE(periodic value gap) + SSE(periodic
    derivative gap) — the discrete-AC analogue of the Burgers
    loss_disc_inference (SSE contract: reference
    inf_disc_burgers.py:91-94)."""
    u_0_pred = u0_pred_disc_inference(net_params, x_0, lb, ub, dt,
                                      irk_weights, diff, react)
    gap_u, gap_ux = periodic_bc_terms(net_params, x_bnd, lb, ub)
    return sse(u_0_pred - u_0) + sse(gap_u) + sse(gap_ux)


def predict_u1(net_params, x, lb, ub):
    """u(t1, x) = the network's last output column (reference
    inf_disc_burgers.py:125-127)."""
    return mlp.apply(net_params, x, lb, ub)[:, -1]
