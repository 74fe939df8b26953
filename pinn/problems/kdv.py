"""Korteweg–de Vries discrete-time (q-stage IRK) identification.

Beyond-reference model family (pierremtb/PINNs-TF2.0 ships Burgers and
Schrödinger only): the original PINNs paper's *dispersive*
identification showcase,

    u_t + lambda1 u u_x + lambda2 u_xxx = 0,   x in [-1, 1) periodic,

with trainable (lambda1, exp(log_lambda2)) recovered from two snapshots
bridged by one large Gauss–Legendre IRK step.  The structure mirrors
:mod:`pinn.problems.burgers`'s discrete-identification mode (reference
1d-burgers/ide_disc_burgers.py:81-108) with one difference: the
nonlinearity needs the THIRD spatial derivative, which comes from the
same single Taylor-mode pass (``taylor_apply(order=3)`` carries the
extra Faà-di-Bruno stream — one more MXU matmul per layer, no nested
tapes).  Parameter conventions (lambda1 raw, lambda2 in log space,
init 0 / -6) follow the reference's Burgers identification contract.

Losses are SSE (sum, not mean) like the other discrete modes.
"""

from __future__ import annotations

import jax.numpy as jnp

from pinn.models import mlp
from pinn.problems.burgers import IdeParams, init_ide_params, sse  # noqa: F401

LAMBDA1_STAR = 1.0
LAMBDA2_STAR = 0.0025


def _stage_derivs3(net_params, x, lb, ub):
    """(U, U_x, U_xxx) stage matrices in one order-3 Taylor pass."""
    dt_ = x.dtype
    out = mlp.taylor_apply(net_params, x, lb, ub,
                           jnp.array([1.0], dtype=dt_), order=3)
    return out.value, out.d1, out.d111


def disc_ide_stage_maps(params: IdeParams, x, lb, ub, dt,
                        irk_alpha, irk_beta):
    """(U_0, U_1) stage maps for identification across two snapshots.

    N = lambda1 U U_x + e^{log_lambda2} U_xxx, so u_t = -N;
    U_0 = U + dt N alphaᵀ and U_1 = U + dt (-N)(beta - alpha)ᵀ — the
    same forward/backward IRK contract as the Burgers mode
    (pinn/problems/burgers.py:disc_ide_stage_maps, reference
    ide_disc_burgers.py:81-108), with the dispersive term in place of
    diffusion."""
    U, U_x, U_xxx = _stage_derivs3(params.net, x, lb, ub)
    l1 = params.lambda1
    l2 = jnp.exp(params.log_lambda2)
    N = l1 * U * U_x + l2 * U_xxx
    U_0 = U + dt * N @ irk_alpha.T
    U_1 = U + dt * (-N) @ (irk_beta - irk_alpha).T
    return U_0, U_1


def loss_disc_identification(params: IdeParams, x_0, u_0, x_1, u_1,
                             lb, ub, dt, irk_alpha, irk_beta):
    """SSE to both snapshots (same contract as the Burgers
    discrete-identification loss)."""
    U_0_pred, _ = disc_ide_stage_maps(params, x_0, lb, ub, dt,
                                      irk_alpha, irk_beta)
    _, U_1_pred = disc_ide_stage_maps(params, x_1, lb, ub, dt,
                                      irk_alpha, irk_beta)
    return sse(U_0_pred - u_0) + sse(U_1_pred - u_1)


def lambda_error(params: IdeParams) -> float:
    """Mean relative error of the recovered coefficients."""
    l1 = float(params.lambda1[0])
    l2 = float(jnp.exp(params.log_lambda2[0]))
    return 0.5 * (abs(l1 - LAMBDA1_STAR) / LAMBDA1_STAR
                  + abs(l2 - LAMBDA2_STAR) / LAMBDA2_STAR)
