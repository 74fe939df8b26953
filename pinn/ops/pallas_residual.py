"""Pallas TPU kernel: fused Burgers residual evaluation.

One kernel evaluates the full PINN residual ``u_t + u u_x - nu u_xx``
for a tile of collocation points: the MLP forward pass and all three
Taylor-mode derivative streams (see ``pinn.models.mlp.taylor_apply``)
run back-to-back in VMEM — weights are loaded once per tile and every
intermediate stays on-chip, i.e. a single HBM pass over the points
(the XLA version materializes inter-layer activations through HBM when
fusion breaks across the 4 parallel streams).

Forward/eval path only: training uses the differentiable pure-JAX
Taylor engine; this kernel serves the residual-throughput eval path
(the BASELINE.md "residual evals/sec/chip" metric) and is
correctness-tested against the JAX engine (tests/test_pallas.py).

Measured on one TPU v5e chip (10,240 points, 8x20 net, f32): XLA's
fused Taylor engine evaluates in ~229 us, the features-major kernel in
~378 us, the points-major one in ~843 us — the workload is
launch/VPU-overhead-bound (0.26 GFLOP/eval), so XLA's automatic fusion
is already at the overhead floor and remains the production path; the
kernels are kept as verified references for future fusion work (e.g.
folding the loss reduction or the backward pass into the same VMEM
pass, where XLA *does* break fusion).

Kernel checklist per the Pallas TPU guide: tiles of 512 points on the
second-to-last dim, full weights in VMEM (KB-scale), grid over point
tiles, biases/direction rows kept 2-D, ``preferred_element_type`` on
every MXU dot.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _map_rows(i):
    """Index map for row-tiled blocks; the constant is pinned to i32
    for the same Mosaic mixed-width reason as
    :func:`pinn.ops.pallas_train._map_tile`."""
    return i, jnp.int32(0)


# Shared i32-pinned index maps (single definition — the Mosaic x64
# workaround lives in one place, pallas_train).
from pinn.ops.pallas_train import _map_tile, _x64_safe_jit  # noqa: E402

TILE = 2048


def _residual_kernel(n_hidden: int, nu: float, x_ref, *refs):
    """refs layout: [scale(1,2), lbub(2,2)] + [W_i, b_i]*L + [out]."""
    scale_ref = refs[0]
    lbub_ref = refs[1]
    wref = refs[2:-1]
    out_ref = refs[-1]

    lb = lbub_ref[0:1, :]   # (1, 2)
    ub = lbub_ref[1:2, :]
    x = x_ref[:]            # (TILE, 2)
    a = 2.0 * (x - lb) / (ub - lb) - 1.0

    scale = scale_ref[:]    # (1, 2) = 2/(ub-lb)
    # Unit-direction rows via iota masks (scatter isn't lowerable on TPU).
    col = jax.lax.broadcasted_iota(jnp.int32, scale.shape, 1)
    vx = jnp.where(col == 0, scale, 0.0)
    vt = jnp.where(col == 1, scale, 0.0)

    # First affine layer: constant-row tangents fold into (1,din)@W.
    w, b = wref[0][:], wref[1][:]
    z = jnp.dot(a, w, preferred_element_type=jnp.float32) + b
    z1 = jnp.dot(vx, w, preferred_element_type=jnp.float32)
    z2 = jnp.dot(vt, w, preferred_element_type=jnp.float32)

    a = jnp.tanh(z)
    sp = 1.0 - a * a
    a1 = sp * z1
    a11 = (-2.0 * a * sp) * z1 * z1
    a2 = sp * z2

    for i in range(1, n_hidden):
        w, b = wref[2 * i][:], wref[2 * i + 1][:]
        z = jnp.dot(a, w, preferred_element_type=jnp.float32) + b
        z1 = jnp.dot(a1, w, preferred_element_type=jnp.float32)
        z11 = jnp.dot(a11, w, preferred_element_type=jnp.float32)
        z2 = jnp.dot(a2, w, preferred_element_type=jnp.float32)
        a = jnp.tanh(z)
        sp = 1.0 - a * a
        spp = -2.0 * a * sp
        a1 = sp * z1
        a11 = spp * z1 * z1 + sp * z11
        a2 = sp * z2

    w, b = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
    u = jnp.dot(a, w, preferred_element_type=jnp.float32) + b
    u_x = jnp.dot(a1, w, preferred_element_type=jnp.float32)
    u_xx = jnp.dot(a11, w, preferred_element_type=jnp.float32)
    u_t = jnp.dot(a2, w, preferred_element_type=jnp.float32)

    out_ref[:] = u_t + u * u_x - nu * u_xx


def _residual_kernel_fmajor(n_hidden: int, nu: float, x_ref, *refs):
    """Features-major variant: activations laid out (features, points).

    Points ride the 128-lane dimension (fully utilized at TILE=512) and
    the narrow feature dimension sits on sublanes — the natural TPU
    layout for these 20-wide MLPs, where the points-major layout wastes
    6.4x of each lane group.  refs: [scale(2,1), lbub(2,2)] +
    [Wt_i (h_out, h_in), b_i (h_out, 1)]*L + [out (1, TILE)].
    """
    scale_ref = refs[0]
    lbub_ref = refs[1]
    wref = refs[2:-1]
    out_ref = refs[-1]

    lb = lbub_ref[:, 0:1]   # (2, 1)
    ub = lbub_ref[:, 1:2]
    x = x_ref[:]            # (2, TILE)
    a = 2.0 * (x - lb) / (ub - lb) - 1.0

    scale = scale_ref[:]    # (2, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, scale.shape, 0)
    vx = jnp.where(row == 0, scale, 0.0)
    vt = jnp.where(row == 1, scale, 0.0)

    wt, b = wref[0][:], wref[1][:]
    z = jnp.dot(wt, a, preferred_element_type=jnp.float32) + b
    z1 = jnp.broadcast_to(
        jnp.dot(wt, vx, preferred_element_type=jnp.float32), z.shape)
    z2 = jnp.broadcast_to(
        jnp.dot(wt, vt, preferred_element_type=jnp.float32), z.shape)

    a = jnp.tanh(z)
    sp = 1.0 - a * a
    a1 = sp * z1
    a11 = (-2.0 * a * sp) * z1 * z1
    a2 = sp * z2

    for i in range(1, n_hidden):
        wt, b = wref[2 * i][:], wref[2 * i + 1][:]
        z = jnp.dot(wt, a, preferred_element_type=jnp.float32) + b
        z1 = jnp.dot(wt, a1, preferred_element_type=jnp.float32)
        z11 = jnp.dot(wt, a11, preferred_element_type=jnp.float32)
        z2 = jnp.dot(wt, a2, preferred_element_type=jnp.float32)
        a = jnp.tanh(z)
        sp = 1.0 - a * a
        spp = -2.0 * a * sp
        a1 = sp * z1
        a11 = spp * z1 * z1 + sp * z11
        a2 = sp * z2

    wt, b = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
    u = jnp.dot(wt, a, preferred_element_type=jnp.float32) + b
    u_x = jnp.dot(wt, a1, preferred_element_type=jnp.float32)
    u_xx = jnp.dot(wt, a11, preferred_element_type=jnp.float32)
    u_t = jnp.dot(wt, a2, preferred_element_type=jnp.float32)

    out_ref[:] = u_t + u * u_x - nu * u_xx


@_x64_safe_jit(static_argnames=("nu", "interpret"))
def burgers_residual_fmajor(params, X_f, lb, ub, nu: float,
                            interpret: bool = False) -> jnp.ndarray:
    """Features-major fused residual (see kernel docstring), (N, 1)."""
    n = X_f.shape[0]
    n_pad = (-n) % TILE
    Xp = jnp.pad(X_f, ((0, n_pad), (0, 0))).T       # (2, n_total)
    n_total = n + n_pad
    n_hidden = len(params) - 1

    lbub = jnp.stack([jnp.asarray(lb, X_f.dtype),
                      jnp.asarray(ub, X_f.dtype)], axis=1)  # (2, 2)
    scale = (2.0 / (lbub[:, 1] - lbub[:, 0]))[:, None]      # (2, 1)

    weight_args = []
    weight_specs = []
    for w, b in params:
        weight_args += [w.T, b.reshape(-1, 1)]
        weight_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                         pl.BlockSpec(memory_space=pltpu.VMEM)]

    kernel = functools.partial(_residual_kernel_fmajor, n_hidden, nu)
    out = pl.pallas_call(
        kernel,
        grid=(n_total // TILE,),
        in_specs=[
            pl.BlockSpec((2, TILE), _map_tile,
                         memory_space=pltpu.VMEM),            # X tile
            pl.BlockSpec(memory_space=pltpu.VMEM),            # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),            # lbub
        ] + weight_specs,
        out_specs=pl.BlockSpec((1, TILE), _map_tile,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_total), X_f.dtype),
        interpret=interpret,
    )(Xp, scale, lbub, *weight_args)
    return out[0, :n, None]


@_x64_safe_jit(static_argnames=("nu", "interpret"))
def burgers_residual(params, X_f, lb, ub, nu: float,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused residual at collocation points, (N, 1).

    N is padded to a TILE multiple internally; callers get the first N
    rows back.  float32 only (the kernel is the TPU fast path).
    """
    n = X_f.shape[0]
    n_pad = (-n) % TILE
    Xp = jnp.pad(X_f, ((0, n_pad), (0, 0)))
    n_total = n + n_pad
    n_hidden = len(params) - 1

    lbub = jnp.stack([jnp.asarray(lb, X_f.dtype),
                      jnp.asarray(ub, X_f.dtype)])           # (2, 2)
    scale = (2.0 / (lbub[1] - lbub[0]))[None, :]             # (1, 2)

    weight_args = []
    weight_specs = []
    for w, b in params:
        weight_args += [w, b.reshape(1, -1)]
        weight_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                         pl.BlockSpec(memory_space=pltpu.VMEM)]

    kernel = functools.partial(_residual_kernel, n_hidden, nu)
    out = pl.pallas_call(
        kernel,
        grid=(n_total // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 2), _map_rows,
                         memory_space=pltpu.VMEM),            # X tile
            pl.BlockSpec(memory_space=pltpu.VMEM),            # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),            # lbub
        ] + weight_specs,
        out_specs=pl.BlockSpec((TILE, 1), _map_rows,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_total, 1), X_f.dtype),
        interpret=interpret,
    )(Xp, scale, lbub, *weight_args)
    return out[:n]


def _schrodinger_kernel_fmajor(n_hidden: int, x_ref, *refs):
    """Fused NLS residual, features-major: out rows = (f_u, f_v).

    f_u = u_t + 0.5 v_xx + (u²+v²) v ;  f_v = v_t - 0.5 u_xx - (u²+v²) u
    (reference 1dcomplex-schrodinger/inf_cont_schrodinger.py:101-104).
    """
    scale_ref = refs[0]
    lbub_ref = refs[1]
    wref = refs[2:-1]
    out_ref = refs[-1]

    lb = lbub_ref[:, 0:1]
    ub = lbub_ref[:, 1:2]
    x = x_ref[:]
    a = 2.0 * (x - lb) / (ub - lb) - 1.0

    scale = scale_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, scale.shape, 0)
    vx = jnp.where(row == 0, scale, 0.0)
    vt = jnp.where(row == 1, scale, 0.0)

    wt, b = wref[0][:], wref[1][:]
    z = jnp.dot(wt, a, preferred_element_type=jnp.float32) + b
    z1 = jnp.broadcast_to(
        jnp.dot(wt, vx, preferred_element_type=jnp.float32), z.shape)
    z2 = jnp.broadcast_to(
        jnp.dot(wt, vt, preferred_element_type=jnp.float32), z.shape)

    a = jnp.tanh(z)
    sp = 1.0 - a * a
    a1 = sp * z1
    a11 = (-2.0 * a * sp) * z1 * z1
    a2 = sp * z2

    for i in range(1, n_hidden):
        wt, b = wref[2 * i][:], wref[2 * i + 1][:]
        z = jnp.dot(wt, a, preferred_element_type=jnp.float32) + b
        z1 = jnp.dot(wt, a1, preferred_element_type=jnp.float32)
        z11 = jnp.dot(wt, a11, preferred_element_type=jnp.float32)
        z2 = jnp.dot(wt, a2, preferred_element_type=jnp.float32)
        a = jnp.tanh(z)
        sp = 1.0 - a * a
        spp = -2.0 * a * sp
        a1 = sp * z1
        a11 = spp * z1 * z1 + sp * z11
        a2 = sp * z2

    wt, b = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
    H = jnp.dot(wt, a, preferred_element_type=jnp.float32) + b      # (2, T)
    H_xx = jnp.dot(wt, a11, preferred_element_type=jnp.float32)
    H_t = jnp.dot(wt, a2, preferred_element_type=jnp.float32)

    u, v = H[0:1, :], H[1:2, :]
    u_xx, v_xx = H_xx[0:1, :], H_xx[1:2, :]
    u_t, v_t = H_t[0:1, :], H_t[1:2, :]
    h2 = u * u + v * v
    f_u = u_t + 0.5 * v_xx + h2 * v
    f_v = v_t - 0.5 * u_xx - h2 * u
    out_ref[:] = jnp.concatenate([f_u, f_v], axis=0)


@_x64_safe_jit(static_argnames=("interpret",))
def schrodinger_residual(params, X_f, lb, ub,
                         interpret: bool = False):
    """Fused NLS residual at collocation points -> (f_u, f_v), each (N, 1)."""
    n = X_f.shape[0]
    n_pad = (-n) % TILE
    Xp = jnp.pad(X_f, ((0, n_pad), (0, 0))).T
    n_total = n + n_pad
    n_hidden = len(params) - 1

    lbub = jnp.stack([jnp.asarray(lb, X_f.dtype),
                      jnp.asarray(ub, X_f.dtype)], axis=1)
    scale = (2.0 / (lbub[:, 1] - lbub[:, 0]))[:, None]

    weight_args = []
    weight_specs = []
    for w, b in params:
        weight_args += [w.T, b.reshape(-1, 1)]
        weight_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                         pl.BlockSpec(memory_space=pltpu.VMEM)]

    kernel = functools.partial(_schrodinger_kernel_fmajor, n_hidden)
    out = pl.pallas_call(
        kernel,
        grid=(n_total // TILE,),
        in_specs=[
            pl.BlockSpec((2, TILE), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + weight_specs,
        out_specs=pl.BlockSpec((2, TILE), _map_tile,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n_total), X_f.dtype),
        interpret=interpret,
    )(Xp, scale, lbub, *weight_args)
    return out[0, :n, None], out[1, :n, None]
