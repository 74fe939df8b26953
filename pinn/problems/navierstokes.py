"""2D incompressible Navier–Stokes identification (psi–p formulation).

Beyond-reference model family (pierremtb/PINNs-TF2.0 ships Burgers and
Schrödinger only): the original PINNs paper's flagship system
identification — discover (lambda1, lambda2) in

    u_t + lambda1 (u u_x + v u_y) = -p_x + lambda2 (u_xx + u_yy)
    v_t + lambda1 (u v_x + v v_y) = -p_y + lambda2 (v_xx + v_yy)

from velocity samples alone (Raissi et al. 2019 §4.1.1).  The network
maps (x, y, t) -> (psi, p); velocities derive from the stream function
(u = psi_y, v = -psi_x) so continuity u_x + v_y = 0 holds *exactly* by
construction, and pressure is learned up to the gauge constant.

TPU-first derivative computation: the residual needs mixed partials of
psi up to third order (u_xx = psi_xxy, v_yy = -psi_xyy, ...) — the
torch/TF idiom is a pyramid of nested tapes (cf. the reference's nested
``tf.GradientTape`` for Burgers, 1d-burgers/inf_cont_burgers.py:65-90,
which this module generalizes to 2+1 dims and order 3).  Here a single
forward pass carries all 13 required derivative streams (value; x, y,
t; xx, xy, yy, xt, yt; xxx, xxy, xyy, yyy) through the tanh layers by
the multivariate Faà-di-Bruno rules

    a_i   = s' z_i
    a_ij  = s'' z_i z_j + s' z_ij
    a_ijk = s''' z_i z_j z_k
            + s'' (z_ij z_k + z_ik z_j + z_jk z_i) + s' z_ijk

so each hidden layer costs 13 batched (N,h)x(h,h) matmuls (MXU) plus
VPU elementwise work — one HBM pass over the weights, no tapes, no
second reverse sweep.  An outer ``jax.grad`` differentiates straight
through it for the loss gradient.  Verified against nested ``jacfwd``
oracles in tests/test_navierstokes.py.

Parameter conventions follow Raissi's Navier–Stokes code: lambda1 and
lambda2 are both RAW trainables initialized to 0 (no log
reparameterization — unlike the Burgers identification contract, the
paper's NS lambda2 is not sign-constrained).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pinn.models import mlp
from pinn.problems.burgers import mse


class NSStreams(NamedTuple):
    """Network output and its (x, y, t) mixed partials, each (N, dout)."""

    v: jnp.ndarray      # H
    x: jnp.ndarray      # H_x
    y: jnp.ndarray      # H_y
    t: jnp.ndarray      # H_t
    xx: jnp.ndarray
    xy: jnp.ndarray
    yy: jnp.ndarray
    xt: jnp.ndarray
    yt: jnp.ndarray
    xxx: jnp.ndarray
    xxy: jnp.ndarray
    xyy: jnp.ndarray
    yyy: jnp.ndarray


def ns_taylor_apply(params: mlp.Params, X: jnp.ndarray, lb, ub) -> NSStreams:
    """Forward pass carrying the 13 NS derivative streams.

    ``X`` is (N, 3) with columns (x, y, t).  The first (affine) layer is
    special-cased exactly like :func:`pinn.models.mlp.taylor_apply`: the
    normalized-input tangents are constant rows (one (din,) @ (din, h)
    vector broadcast over the batch) and every second/third z-stream of
    that layer is identically zero.
    """
    scale = 2.0 / (ub - lb)
    a = mlp.normalize(X, lb, ub)

    w, b = params[0]
    z = a @ w + b
    # Constant first-layer tangents along each coordinate direction.
    zx = jnp.broadcast_to(scale[0] * w[0], z.shape)
    zy = jnp.broadcast_to(scale[1] * w[1], z.shape)
    zt = jnp.broadcast_to(scale[2] * w[2], z.shape)

    if len(params) == 1:  # single linear layer: all curvature is zero
        zero = jnp.zeros_like(z)
        return NSStreams(z, zx, zy, zt, *([zero] * 9))

    a = jnp.tanh(z)
    sp = 1.0 - a * a                       # tanh'
    spp = -2.0 * a * sp                    # tanh''
    sppp = -2.0 * sp * (1.0 - 3.0 * a * a)  # tanh'''
    ax, ay, at = sp * zx, sp * zy, sp * zt
    axx = spp * zx * zx
    axy = spp * zx * zy
    ayy = spp * zy * zy
    axt = spp * zx * zt
    ayt = spp * zy * zt
    axxx = sppp * zx * zx * zx
    axxy = sppp * zx * zx * zy
    axyy = sppp * zx * zy * zy
    ayyy = sppp * zy * zy * zy

    for w, b in params[1:-1]:
        z = a @ w + b
        zx, zy, zt = ax @ w, ay @ w, at @ w
        zxx, zxy, zyy = axx @ w, axy @ w, ayy @ w
        zxt, zyt = axt @ w, ayt @ w
        zxxx, zxxy, zxyy, zyyy = axxx @ w, axxy @ w, axyy @ w, ayyy @ w

        a = jnp.tanh(z)
        sp = 1.0 - a * a
        spp = -2.0 * a * sp
        sppp = -2.0 * sp * (1.0 - 3.0 * a * a)

        ax, ay, at = sp * zx, sp * zy, sp * zt
        axx = spp * zx * zx + sp * zxx
        axy = spp * zx * zy + sp * zxy
        ayy = spp * zy * zy + sp * zyy
        axt = spp * zx * zt + sp * zxt
        ayt = spp * zy * zt + sp * zyt
        axxx = sppp * zx * zx * zx + 3.0 * spp * zx * zxx + sp * zxxx
        axxy = (sppp * zx * zx * zy
                + spp * (zxx * zy + 2.0 * zxy * zx) + sp * zxxy)
        axyy = (sppp * zx * zy * zy
                + spp * (zyy * zx + 2.0 * zxy * zy) + sp * zxyy)
        ayyy = sppp * zy * zy * zy + 3.0 * spp * zy * zyy + sp * zyyy

    w, b = params[-1]
    return NSStreams(
        v=a @ w + b, x=ax @ w, y=ay @ w, t=at @ w,
        xx=axx @ w, xy=axy @ w, yy=ayy @ w, xt=axt @ w, yt=ayt @ w,
        xxx=axxx @ w, xxy=axxy @ w, xyy=axyy @ w, yyy=ayyy @ w)


class NSIdeParams(NamedTuple):
    """Identification trainables: net weights + raw (lambda1, lambda2).

    Tail position of the lambdas in the flat vector matches the
    reference's get_weights/set_weights extension contract
    (reference 1d-burgers/ide_disc_burgers.py:131-141)."""

    net: tuple
    lambda1: jnp.ndarray  # (1,)
    lambda2: jnp.ndarray  # (1,)


def init_ide_params(net_params, dtype=None) -> NSIdeParams:
    dtype = dtype or net_params[0][0].dtype
    return NSIdeParams(net=net_params,
                       lambda1=jnp.zeros((1,), dtype),
                       lambda2=jnp.zeros((1,), dtype))


def uvp_and_residual(net_params, X, lb, ub, lambda1, lambda2):
    """(u, v, p, f_u, f_v) at points X — one fused stream pass.

    u = psi_y, v = -psi_x; the momentum residuals take every mixed
    partial from the same :func:`ns_taylor_apply` call."""
    s = ns_taylor_apply(net_params, X, lb, ub)

    def psi(st):
        return st[:, 0:1]

    u, v = psi(s.y), -psi(s.x)
    u_t, u_x, u_y = psi(s.yt), psi(s.xy), psi(s.yy)
    u_xx, u_yy = psi(s.xxy), psi(s.yyy)
    v_t, v_x, v_y = -psi(s.xt), -psi(s.xx), -psi(s.xy)
    v_xx, v_yy = -psi(s.xxx), -psi(s.xyy)
    p, p_x, p_y = s.v[:, 1:2], s.x[:, 1:2], s.y[:, 1:2]

    f_u = u_t + lambda1 * (u * u_x + v * u_y) + p_x \
        - lambda2 * (u_xx + u_yy)
    f_v = v_t + lambda1 * (u * v_x + v * v_y) + p_y \
        - lambda2 * (v_xx + v_yy)
    return u, v, p, f_u, f_v


def predict_uvp(net_params, X, lb, ub):
    """(u, v, p) only — first-order streams would suffice, but sharing
    the full pass keeps one code path (prediction is cold)."""
    u, v, p, _, _ = uvp_and_residual(net_params, X, lb, ub, 0.0, 0.0)
    return u, v, p


def loss_identification(params: NSIdeParams, X, u, v, lb, ub, X_f=None):
    """MSE(u) + MSE(v) + MSE(f_u) + MSE(f_v) — the Raissi NS loss
    (velocity data only, residual at the data points; mirroring the
    continuous-identification contract of reference
    1d-burgers/ide_cont_burgers.py).

    ``X_f`` (optional) evaluates the momentum residuals on a SEPARATE
    collocation set instead of the data points.  Rationale (round-5
    forensics, experiments/ns_diag.py): at convergence λ is exactly the
    residual lstsq GIVEN the net, and the measured λ1 bias tracks the
    net's derivative-field misfit *between* the N_u samples — noisy
    runs beat clean ones because noise suppresses that overfit.  A
    dense residual draw forces PDE consistency where there is no data,
    attacking the bias at its source (and feeding the MXU a bigger
    fused-stream batch per step)."""
    if X_f is None:
        u_pred, v_pred, _, f_u, f_v = uvp_and_residual(
            params.net, X, lb, ub, params.lambda1, params.lambda2)
    else:
        u_pred, v_pred, _, _, _ = uvp_and_residual(
            params.net, X, lb, ub, params.lambda1, params.lambda2)
        _, _, _, f_u, f_v = uvp_and_residual(
            params.net, X_f, lb, ub, params.lambda1, params.lambda2)
    return (mse(u - u_pred) + mse(v - v_pred)
            + mse(f_u) + mse(f_v))
