"""Pallas TPU kernel: fused nonlinear-Schrödinger residual SSE
forward + backward (VERDICT round-2 item #4).

The other large-N_f flagship (reference
1dcomplex-schrodinger/inf_cont_schrodinger.py: N_f=20,000, 4x100 tanh
net — 100-wide layers sit far better on the 128-lane MXU than the
Burgers 20) gets the same treatment as the Burgers training kernel
(pinn/ops/pallas_train.py): all four Taylor streams (value, d/dx,
d2/dx2, d/dt) of BOTH real outputs (u, v) = (Re h, Im h) ride one
stacked (h, 4T) matmul per layer, the whole forward + loss + backward
runs per point-tile inside VMEM, and the custom_vjp forward computes
the parameter gradients alongside the value so one kernel launch per
step covers the residual term.

Residual semantics (reference inf_cont_schrodinger.py:101-104,
oracle ``pinn.problems.schrodinger.residual``):

    f_u = u_t + 0.5 v_xx + (u^2 + v^2) v
    f_v = v_t - 0.5 u_xx - (u^2 + v^2) u
    sse = sum_i (f_u^2 + f_v^2)_i

The IC/periodic-BC terms (N_0 = N_b = 50 points) stay in XLA — they
are 400x smaller than the residual term and share no work with it.

float32 only (the TPU fast path; f64 parity runs use the XLA engine).
Gradient-tested against the jax.grad oracle in interpret mode
(tests/test_pallas_schrodinger.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinn.ops.pallas_train import _layer_fwd, _layer_bwd, _prep, _pad_points, _dot

# 100-wide layers: saved stream buffers are (100, 4T) f32 per hidden
# layer; T=512 keeps the whole working set (~6 MB) comfortably in VMEM.

# Shared i32-pinned index maps (single definition — the Mosaic x64
# workaround lives in one place, pallas_train).
from pinn.ops.pallas_train import (  # noqa: E402
    _map_tile, _map_whole, _x64_safe_jit)

TILE = 512


def _head(U, b_out, T, i, n_real):
    """Values/derivative rows + masked residuals for one tile."""
    V = U[:, 0 * T:1 * T] + b_out          # (2, T) values
    Dxx = U[:, 2 * T:3 * T]
    Dt = U[:, 3 * T:4 * T]
    u, v = V[0:1, :], V[1:2, :]
    u_xx, v_xx = Dxx[0:1, :], Dxx[1:2, :]
    u_t, v_t = Dt[0:1, :], Dt[1:2, :]
    h2 = u * u + v * v
    f_u = u_t + 0.5 * v_xx + h2 * v
    f_v = v_t - 0.5 * u_xx - h2 * u
    col = jax.lax.broadcasted_iota(jnp.int32, f_u.shape, 1)
    m = (i * T + col < n_real).astype(f_u.dtype)
    return u, v, f_u * m, f_v * m


def _fwd_kernel(n_hidden: int, n_real: int, T: int, sdt,
                x_ref, z1row_ref, z2row_ref, *refs):
    """Forward only: accumulate SSE over tiles."""
    wref = refs[:-1]
    sse_ref = refs[-1]
    i = pl.program_id(0)

    a_cat, *_ = _layer_fwd(wref[0][:], wref[1][:], x_ref[:], T,
                           first=True, z1row=z1row_ref[:],
                           z2row=z2row_ref[:], sdt=sdt)
    for l in range(1, n_hidden):
        a_cat, *_ = _layer_fwd(wref[2 * l][:], wref[2 * l + 1][:], a_cat, T,
                               sdt=sdt)

    wt, b = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
    U = _dot(wt, a_cat)
    _, _, f_u, f_v = _head(U, b.astype(jnp.float32), T, i, n_real)

    @pl.when(i == 0)
    def _():
        sse_ref[0, 0] = 0.0

    sse_ref[0, 0] += jnp.sum(f_u * f_u) + jnp.sum(f_v * f_v)


def _make_fwd_bwd_kernel(n_hidden: int, n_real: int, T: int,
                         sdt=jnp.float32):
    n_layers = n_hidden + 1

    def kernel(x_ref, z1row_ref, z2row_ref, *refs):
        wref = refs[:2 * n_layers]
        sse_ref = refs[2 * n_layers]
        gw_refs = refs[2 * n_layers + 1: 4 * n_layers + 1]
        gz1row_ref = refs[4 * n_layers + 1]
        gz2row_ref = refs[4 * n_layers + 2]
        saved = refs[4 * n_layers + 3:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sse_ref[0, 0] = 0.0
            for r in gw_refs:
                r[:] = jnp.zeros_like(r)
            gz1row_ref[:] = jnp.zeros_like(gz1row_ref)
            gz2row_ref[:] = jnp.zeros_like(gz2row_ref)

        a0 = x_ref[:]
        a_cat, t, z1, z11, z2 = _layer_fwd(
            wref[0][:], wref[1][:], a0, T,
            first=True, z1row=z1row_ref[:], z2row=z2row_ref[:], sdt=sdt)
        saved[0][:] = jnp.concatenate([t, z1, z11, z2], axis=1).astype(sdt)
        for l in range(1, n_hidden):
            a_cat, t, z1, z11, z2 = _layer_fwd(
                wref[2 * l][:], wref[2 * l + 1][:], a_cat, T, sdt=sdt)
            saved[l][:] = jnp.concatenate([t, z1, z11, z2],
                                          axis=1).astype(sdt)

        wt_out, b_out = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
        U = _dot(wt_out, a_cat)
        u, v, f_u, f_v = _head(U, b_out.astype(jnp.float32), T, i, n_real)
        sse_ref[0, 0] += jnp.sum(f_u * f_u) + jnp.sum(f_v * f_v)

        # ---- residual adjoints (2, T) per stream ----
        g_fu = 2.0 * f_u
        g_fv = 2.0 * f_v
        h2 = u * u + v * v
        gV = jnp.concatenate(
            [g_fu * (2.0 * u * v) - g_fv * (3.0 * u * u + v * v),
             g_fu * (u * u + 3.0 * v * v) - g_fv * (2.0 * u * v)],
            axis=0)                                        # (2, T)
        gDxx = jnp.concatenate([-0.5 * g_fv, 0.5 * g_fu], axis=0)
        gDt = jnp.concatenate([g_fu, g_fv], axis=0)
        gU = jnp.concatenate(
            [gV, jnp.zeros_like(gV), gDxx, gDt],
            axis=1).astype(sdt)                            # (2, 4T)

        gw_refs[2 * n_hidden][:] += _dot(gU, a_cat.T)
        gw_refs[2 * n_hidden + 1][:] += jnp.sum(gV, axis=1, keepdims=True)
        g_cat = _dot(wt_out.T, gU)

        for l in range(n_hidden - 1, 0, -1):
            S = saved[l][:]
            t = S[:, 0 * T:1 * T]
            z1 = S[:, 1 * T:2 * T]
            z11 = S[:, 2 * T:3 * T]
            z2 = S[:, 3 * T:4 * T]
            gZ_cat, g_cat = _layer_bwd(wref[2 * l][:], t, z1, z11, z2,
                                       g_cat, T, sdt=sdt)
            Sp = saved[l - 1][:]
            tp = Sp[:, 0 * T:1 * T].astype(jnp.float32)
            z1p = Sp[:, 1 * T:2 * T].astype(jnp.float32)
            z11p = Sp[:, 2 * T:3 * T].astype(jnp.float32)
            z2p = Sp[:, 3 * T:4 * T].astype(jnp.float32)
            spp_ = 1.0 - tp * tp
            sppp = -2.0 * tp * spp_
            a_in = jnp.concatenate(
                [tp, spp_ * z1p, sppp * z1p * z1p + spp_ * z11p,
                 spp_ * z2p], axis=1).astype(sdt)
            gw_refs[2 * l][:] += _dot(gZ_cat, a_in.T)
            gw_refs[2 * l + 1][:] += jnp.sum(
                gZ_cat[:, 0:T].astype(jnp.float32), axis=1, keepdims=True)

        S = saved[0][:]
        t = S[:, 0 * T:1 * T]
        z1 = S[:, 1 * T:2 * T]
        z11 = S[:, 2 * T:3 * T]
        z2 = S[:, 3 * T:4 * T]
        gZ_cat, _ = _layer_bwd(wref[0][:], t, z1, z11, z2, g_cat, T,
                               sdt=sdt)
        gz_v = gZ_cat[:, 0:T]
        gw_refs[0][:] += _dot(gz_v, a0.T)
        gw_refs[1][:] += jnp.sum(gz_v.astype(jnp.float32), axis=1,
                                 keepdims=True)
        gz1row_ref[:] += jnp.sum(
            gZ_cat[:, T:2 * T].astype(jnp.float32), axis=1, keepdims=True)
        gz2row_ref[:] += jnp.sum(
            gZ_cat[:, 3 * T:4 * T].astype(jnp.float32), axis=1,
            keepdims=True)

    return kernel


@_x64_safe_jit(static_argnames=("n_real", "interpret", "sdt_name"))
def _sse_fwd_call(wt_args, a0p, z1row, z2row, n_real, interpret=False,
                  sdt_name="float32"):
    sdt = jnp.dtype(sdt_name)
    n_total = a0p.shape[1]
    n_layers = len(wt_args) // 2
    kernel = functools.partial(_fwd_kernel, n_layers - 1, n_real, TILE,
                               sdt)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(wt_args)
    sse = pl.pallas_call(
        kernel,
        grid=(n_total // TILE,),
        in_specs=[
            pl.BlockSpec((a0p.shape[0], TILE), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, 1), _map_whole,
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(a0p, z1row, z2row, *wt_args)
    return sse[0, 0]


@_x64_safe_jit(static_argnames=("n_real", "interpret", "sdt_name"))
def _sse_fwd_bwd_call(wt_args, a0p, z1row, z2row, n_real, interpret=False,
                      sdt_name="float32"):
    sdt = jnp.dtype(sdt_name)
    n_total = a0p.shape[1]
    n_layers = len(wt_args) // 2
    n_hidden = n_layers - 1
    kernel = _make_fwd_bwd_kernel(n_hidden, n_real, TILE, sdt=sdt)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(wt_args)

    # Loss and every gradient accumulate in f32 regardless of sdt.
    out_shapes = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1), _map_whole,
                              memory_space=pltpu.SMEM)]
    for wt in wt_args:
        out_shapes.append(jax.ShapeDtypeStruct(wt.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(wt.shape, _map_whole,
                                      memory_space=pltpu.VMEM))
    for zrow in (z1row, z2row):
        out_shapes.append(jax.ShapeDtypeStruct(zrow.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(zrow.shape, _map_whole,
                                      memory_space=pltpu.VMEM))

    scratch = [pltpu.VMEM((wt_args[2 * l].shape[0], 4 * TILE), sdt)
               for l in range(n_hidden)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_total // TILE,),
        in_specs=[
            pl.BlockSpec((a0p.shape[0], TILE), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(a0p, z1row, z2row, *wt_args)
    sse = outs[0][0, 0]
    gwt = outs[1:1 + len(wt_args)]
    gz1row, gz2row = outs[-2], outs[-1]
    return sse, gwt, gz1row, gz2row


def make_schrodinger_sse(lb, ub, interpret: bool = False,
                         stream_dtype=None):
    """Differentiable fused ``sse(params, X_f) -> sum(f_u^2 + f_v^2)``.

    custom_vjp: the forward runs the fused forward+backward kernel ONCE
    and stashes the parameter gradients as residuals (one launch per
    training step — the Burgers v1 lesson, pallas_train.py); the
    backward is a scalar rescale.  X_f receives a zero cotangent.
    """
    lb_arr = np.asarray(lb, np.float32)
    ub_arr = np.asarray(ub, np.float32)
    sdt_name = str(jnp.dtype(stream_dtype or jnp.float32))

    def _cast_streams(a0p, z1row, z2row, wt_args):
        sdt = jnp.dtype(sdt_name)
        if sdt != a0p.dtype:  # bf16 streams: cast kernel inputs once
            a0p = a0p.astype(sdt)
            z1row = z1row.astype(sdt)
            z2row = z2row.astype(sdt)
            wt_args = [a.astype(sdt) for a in wt_args]
        return a0p, z1row, z2row, wt_args

    def _assemble(params, gwt, gz1row, gz2row, vx, vt, g):
        grads = []
        for l, (wl, bl) in enumerate(params):
            gw = gwt[2 * l].T
            gb = gwt[2 * l + 1][:, 0] if bl.ndim == 1 else gwt[2 * l + 1]
            if l == 0:
                gw = gw + jnp.outer(vx, gz1row[:, 0]) \
                        + jnp.outer(vt, gz2row[:, 0])
            grads.append((g * gw, g * gb))
        return tuple(grads)

    @jax.custom_vjp
    def sse(params, X_f):
        dtype = X_f.dtype
        a0, z1row, z2row, wt_args, _, _ = _prep(params, X_f, lb_arr,
                                                ub_arr, dtype)
        a0p, _ = _pad_points(a0, X_f.shape[0], TILE)
        a0p, z1row, z2row, wt_args = _cast_streams(a0p, z1row, z2row,
                                                   wt_args)
        return _sse_fwd_call(tuple(wt_args), a0p, z1row, z2row,
                             X_f.shape[0], interpret=interpret,
                             sdt_name=sdt_name)

    def sse_fwd(params, X_f):
        dtype = X_f.dtype
        a0, z1row, z2row, wt_args, vx, vt = _prep(params, X_f, lb_arr,
                                                  ub_arr, dtype)
        a0p, _ = _pad_points(a0, X_f.shape[0], TILE)
        a0p, z1row, z2row, wt_args = _cast_streams(a0p, z1row, z2row,
                                                   wt_args)
        val, gwt, gz1row, gz2row = _sse_fwd_bwd_call(
            tuple(wt_args), a0p, z1row, z2row, X_f.shape[0],
            interpret=interpret, sdt_name=sdt_name)
        return val, (params, X_f, gwt, gz1row, gz2row, vx, vt)

    def sse_bwd(res, g):
        params, X_f, gwt, gz1row, gz2row, vx, vt = res
        return (_assemble(params, gwt, gz1row, gz2row, vx, vt, g),
                jnp.zeros_like(X_f))

    sse.defvjp(sse_fwd, sse_bwd)
    return sse


def make_schrodinger_loss(lb, ub, interpret: bool = False,
                          stream_dtype=None):
    """Full reference loss with the fused kernel on the residual term:
    ``mse_0 + mse_b + sse_f / N_f`` (reference
    inf_cont_schrodinger.py:107-129; IC/BC terms stay XLA — 50 points
    each).  Batch keys: X0, H0, X_lb, X_ub, X_f.
    """
    from pinn.problems import schrodinger as sprob

    fused = make_schrodinger_sse(lb, ub, interpret=interpret,
                                 stream_dtype=stream_dtype)
    lb_j = jnp.asarray(lb, jnp.float32)
    ub_j = jnp.asarray(ub, jnp.float32)

    def loss(params, batch):
        mse_0, mse_b = sprob.ic_bc_terms(
            params, batch["X0"], batch["H0"], batch["X_lb"],
            batch["X_ub"], lb_j, ub_j)
        n_f = batch["X_f"].shape[0]
        return mse_0 + mse_b + fused(params, batch["X_f"]) / n_f

    return loss


def make_schrodinger_loss_dp(lb, ub, mesh, axis: str = "data",
                             interpret: bool = False, stream_dtype=None):
    """Data-parallel composition of the fused Schrödinger loss: every
    device runs :func:`make_schrodinger_loss` on its shard of the
    collocation axis and one ``psum`` reassembles the global loss (and,
    through shard_map's transpose, the parameter gradients).

    Exactness mirrors ``make_burgers_loss_dp`` (pallas_train.py): the
    local loss is ``mse_0 + mse_b + sse_local / (N_f/D)``, so
    ``psum(·)/D = mse_0 + mse_b + sse_global/N_f`` — the exact
    reference loss (inf_cont_schrodinger.py:107-129) up to f32
    summation order.  The tiny IC/BC stacks (50 points each) are
    computed redundantly per device; only X_f shards.  ``N_f % D == 0``
    is enforced at call time.
    """
    local = make_schrodinger_loss(lb, ub, interpret=interpret,
                                  stream_dtype=stream_dtype)
    n_dev = int(mesh.shape[axis])
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    # check_vma=False: pallas_call's out_shape carries no varying-mesh
    # annotation, so shard_map's vma checker cannot see through it.
    sharded = shard_map(
        lambda p, b: jax.lax.psum(local(p, b), axis) / n_dev,
        mesh=mesh,
        in_specs=(P(), {"X0": P(), "H0": P(), "X_lb": P(),
                        "X_ub": P(), "X_f": P(axis)}),
        out_specs=P(), check_vma=False)

    def loss(params, batch):
        if batch["X_f"].shape[0] % n_dev:
            raise ValueError(
                f"batch['X_f'] leading dim {batch['X_f'].shape[0]} must "
                f"divide the mesh '{axis}' axis ({n_dev}) — choose N_f "
                "as a multiple of the device count for the fused DP path")
        return sharded(params, batch)

    return loss
