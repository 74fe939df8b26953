"""1D viscous Burgers residuals and losses (all four reference modes).

Continuous time: residual ``u_t + u u_x - nu u_xx`` evaluated at
collocation points (inference: reference
1d-burgers/inf_cont_burgers.py:59-90; identification with trainable
``lambda1``/``exp(lambda2)``: reference 1d-burgers/ide_cont_burgers.py).

Discrete time: q-stage IRK stage form.  The network maps x to the q(+1)
stage values; spatial stage derivatives come from one Taylor-mode pass
(the input is 1-D, so the full (N, q) Jacobian slice costs a single
forward stream — replacing the reference's double-vjp dummy-gradient
trick, 1d-burgers/inf_disc_burgers.py:74-80).  The stage coupling
``N @ Wᵀ`` is a (N, q)x(q, q+1) matmul — MXU-shaped by construction
(reference inf_disc_burgers.py:86-88, ide_disc_burgers.py:81-108).

All losses are pure jit-traceable functions of a parameter pytree;
identification-mode pytrees carry ``lambda1`` and ``log_lambda2``
leaves (the ``exp`` reparameterization keeps the diffusion coefficient
positive, as in reference ide_cont_burgers.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from pinn.models import mlp

def _vx(dtype):
    return jnp.array([1.0, 0.0], dtype=dtype)


def _vt(dtype):
    return jnp.array([0.0, 1.0], dtype=dtype)


def mse(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(x))


def sse(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.square(x))


# ---------------------------------------------------------------------------
# Continuous time
# ---------------------------------------------------------------------------

def residual_cont(net_params, X_f, lb, ub, lambda1=1.0, lambda2=None, nu=None):
    """f = u_t + lambda1 * u u_x - lambda2 * u_xx at collocation points.

    For inference mode pass ``nu`` (fixed 0.01/pi in the reference);
    for identification pass the trainable coefficients.
    """
    if lambda2 is None:
        lambda2 = nu
    dt_ = X_f.dtype
    out = mlp.taylor_apply(net_params, X_f, lb, ub, _vx(dt_), _vt(dt_))
    return out.d2 + lambda1 * out.value * out.d1 - lambda2 * out.d11


def loss_cont_inference(net_params, X_u, u, X_f, lb, ub, nu,
                        f_weights: Optional[jnp.ndarray] = None):
    """MSE(data) + MSE(residual) (reference inf_cont_burgers.py:59-62).

    ``f_weights`` (optional, shape (N_f,)) supports masked padding when
    the collocation axis is sharded: weights are 1/N_real for real
    points and 0 for pads.
    """
    u_pred = mlp.apply(net_params, X_u, lb, ub)
    f = residual_cont(net_params, X_f, lb, ub, nu=nu)
    if f_weights is None:
        mse_f = mse(f)
    else:
        mse_f = jnp.sum(jnp.square(f[:, 0]) * f_weights)
    return mse(u - u_pred) + mse_f


class IdeParams(NamedTuple):
    """Identification-mode trainables: net weights + PDE coefficients.

    Tail position of (lambda1, log_lambda2) in the flat vector matches
    the reference's get_weights/set_weights extension
    (reference ide_disc_burgers.py:131-141)."""
    net: tuple
    lambda1: jnp.ndarray      # (1,)
    log_lambda2: jnp.ndarray  # (1,)


def init_ide_params(net_params, dtype=None) -> IdeParams:
    dtype = dtype or net_params[0][0].dtype
    # Reference inits: lambda1 = 0.0, lambda2 stored as log, init -6.0
    # (reference ide_cont_burgers.py / ide_disc_burgers.py fit()).
    return IdeParams(net=net_params,
                     lambda1=jnp.zeros((1,), dtype),
                     log_lambda2=jnp.full((1,), -6.0, dtype))


def loss_cont_identification(params: IdeParams, X_u, u, lb, ub):
    """Data MSE + residual MSE *at the data points* (no separate
    collocation set — reference ide_cont_burgers.py loss)."""
    u_pred = mlp.apply(params.net, X_u, lb, ub)
    f = residual_cont(params.net, X_u, lb, ub,
                      lambda1=params.lambda1,
                      lambda2=jnp.exp(params.log_lambda2))
    return mse(u - u_pred) + mse(f)


# ---------------------------------------------------------------------------
# Discrete time (q-stage IRK)
# ---------------------------------------------------------------------------

def _stage_derivs(net_params, x, lb, ub):
    dt_ = x.dtype
    out = mlp.taylor_apply(net_params, x, lb, ub, jnp.array([1.0], dtype=dt_))
    return out.value, out.d1, out.d11


def u0_pred_disc_inference(net_params, x_0, lb, ub, nu, dt, irk_weights):
    """Backward IRK map: U1(x) (q+1 outputs) -> predicted u at t0.

    U_0 = U_1 + dt * (U ∘ U_x - nu U_xx) @ Wᵀ with W the (q+1, q)
    stacked [A; b] (reference inf_disc_burgers.py:61-88)."""
    U1, U1_x, U1_xx = _stage_derivs(net_params, x_0, lb, ub)
    U, U_x, U_xx = U1[:, :-1], U1_x[:, :-1], U1_xx[:, :-1]
    N = U * U_x - nu * U_xx
    return U1 + dt * N @ irk_weights.T


def loss_disc_inference(net_params, x_0, u_0, x_1, lb, ub, nu, dt, irk_weights):
    """SSE to the t0 snapshot + homogeneous-Dirichlet SSE at x = ±1
    (reference inf_disc_burgers.py:91-94; note *sum*, not mean)."""
    u_0_pred = u0_pred_disc_inference(net_params, x_0, lb, ub, nu, dt,
                                      irk_weights)
    u_1_bnd = mlp.apply(net_params, x_1, lb, ub)
    return sse(u_0_pred - u_0) + sse(u_1_bnd)


def disc_ide_stage_maps(params: IdeParams, x, lb, ub, dt, irk_alpha, irk_beta):
    """(U_0, U_1) stage maps for identification across two snapshots
    (reference ide_disc_burgers.py:81-108)."""
    U, U_x, U_xx = _stage_derivs(params.net, x, lb, ub)
    l1 = params.lambda1
    l2 = jnp.exp(params.log_lambda2)
    N = l1 * U * U_x - l2 * U_xx
    U_0 = U + dt * N @ irk_alpha.T
    U_1 = U + dt * (-N) @ (irk_beta - irk_alpha).T
    return U_0, U_1


def loss_disc_identification(params: IdeParams, x_0, u_0, x_1, u_1,
                             lb, ub, dt, irk_alpha, irk_beta):
    U_0_pred, _ = disc_ide_stage_maps(params, x_0, lb, ub, dt,
                                      irk_alpha, irk_beta)
    _, U_1_pred = disc_ide_stage_maps(params, x_1, lb, ub, dt,
                                      irk_alpha, irk_beta)
    return sse(U_0_pred - u_0) + sse(U_1_pred - u_1)
