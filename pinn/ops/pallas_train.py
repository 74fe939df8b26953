"""Pallas TPU kernel: fused Burgers residual-loss FORWARD + BACKWARD.

The training hot loop (SURVEY.md §3.1) is dominated by the gradient of
the residual sum-of-squares

    SSE_f(params) = sum_i f(x_i)^2,   f = u_t + u u_x - nu u_xx

where u and its input derivatives come from the Taylor-mode forward
(``pinn.models.mlp.taylor_apply``).  XLA differentiates that forward
mechanically: every layer's four derivative streams (value, d/dx,
d2/dx2, d/dt) are separate (N, h) matmuls in both passes, and the
saved activations round-trip through HBM between the forward and
backward halves of ``value_and_grad``.

This kernel does what the autodiff cannot:

- **Stream stacking**: all four streams multiply the *same* weight
  matrix, so each layer's four (h, T) matmuls become one (h, 4T) MXU
  call — 4x fewer MXU launches, same FLOPs, and the weight-gradient
  contraction becomes a single (h, 4T) @ (4T, h) matmul with the big
  dimension on K, where the MXU is most efficient.
- **Full fusion + rematerialization**: forward streams, the loss
  reduction, and the entire backward run per point-tile inside VMEM;
  no activation is ever written to HBM (the backward rematerializes
  the forward from the tile's saved tanh/tangent buffers in VMEM).
- **Features-major layout**: points ride the 128-lane axis, the
  20-wide feature dimension sits on sublanes (see
  pallas_residual.py measurements).

Public entries: :func:`make_burgers_loss` — the v2 single-launch
training loss (data term folded into the point stream, loss + all
parameter gradients in ONE kernel launch per step; the fastest path at
every N_f, SCALING.md) — and :func:`make_burgers_sse`, the
residual-SSE-only building block (v1 design: separate fwd and fwd+bwd
kernels).  Both are ``jax.custom_vjp``-wrapped and gradient-tested
against the ``jax.grad`` oracle of the pure Taylor-engine loss
(tests/test_pallas_train.py).

float32 streams by default (the TPU fast path; f64 parity runs use the
XLA engine); ``stream_dtype="bfloat16"`` is available on
make_burgers_loss for warmup-grade bf16 streams with f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _map_tile(i):
    """Index map for point-tiled blocks.  The constant is pinned to
    i32: under jax_enable_x64 a Python-int 0 in an index map traces as
    i64 while the program id stays i32, and Mosaic rejects the mixed-
    width return ("failed to legalize \'func.return\'") — hit whenever
    the mixed-precision Trainer (nt_vector_dtype=float64) enables x64
    globally around a fused-kernel loss."""
    return jnp.int32(0), i


def _map_whole(i):
    """Index map for whole-array (weight/accumulator) blocks; same
    i32-pinning rationale as :func:`_map_tile`."""
    del i
    return jnp.int32(0), jnp.int32(0)


def _x64_safe_jit(**jit_kw):
    """``jax.jit`` that traces its function with x64 DISABLED.

    Every kernel input/output here is explicitly typed (f32/bf16/i32),
    but pallas promotes BlockSpec index-map outputs to the *default*
    int width — under ``jax_enable_x64`` (which the mixed-precision
    Trainer turns on globally for its f64 L-BFGS vector algebra) they
    become i64 and Mosaic refuses the kernel ("failed to legalize
    \'func.return\'").  Tracing with x64 off pins the lowering to i32
    without affecting the caller\'s dtypes.
    """
    def deco(fn):
        @functools.wraps(fn)
        def traced(*a, **k):
            with jax.enable_x64(False):
                return fn(*a, **k)
        return jax.jit(traced, **jit_kw)
    return deco


TILE = 1024


def _tile_for(wt_args) -> int:
    """Point-tile size that keeps the kernel's Mosaic scoped-VMEM
    footprint at or below the proven flagship point.

    The VMEM stack scales ~linearly in width x n_hidden x tile: the
    width-20 x 8-hidden flagship compiles at TILE=1024 (~14.4 MB of the
    16 MB scoped limit), while width-40 x 8-hidden at 1024 was measured
    OOM at 28.83 MB on v5e (logs/tpu_tier_r5c.log, probe-P18 de-risk).
    Halving the tile until width x n_hidden x tile <= 20 x 8 x 1024
    holds the footprint at the proven level; the grid gets
    correspondingly longer (same FLOPs, same accumulators, identical
    results — the tile is a pure scheduling choice).
    """
    n_layers = len(wt_args) // 2
    n_hidden = n_layers - 1
    if n_hidden < 1:
        return TILE
    width = max(wt_args[2 * l].shape[0] for l in range(n_hidden))
    t = TILE
    while width * n_hidden * t > 20 * 8 * TILE and t > 128:
        t //= 2
    return t


def _dot(a, b):
    """MXU dot with f32 accumulation and dtype-appropriate precision.

    bf16 operands must NOT inherit ``jax_default_matmul_precision=
    "highest"`` (the experiments' global f32 setting): Mosaic rejects a
    ``tpu.matmul`` with ``contract_precision<fp32>`` on bf16 inputs
    ("Bad lhs type"), and the request is meaningless anyway — bf16
    inputs are consumed exactly by the MXU in one pass.  f32 operands
    keep whatever precision the caller configured globally.
    """
    if a.dtype == jnp.bfloat16 or b.dtype == jnp.bfloat16:
        return jnp.dot(a, b, precision=jax.lax.Precision.DEFAULT,
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _layer_fwd(wt, b, a_cat, T, first=False, z1row=None, z2row=None,
               sdt=jnp.float32):
    """One stacked-stream layer: Z_cat = wt @ a_cat (+ bias on the value
    columns), then the tanh/tangent recombination.

    Returns (a_cat_out, t, z1, z11, z2) — the latter four are what the
    backward needs to rematerialize this layer.

    ``sdt`` is the stream dtype: float32 (exact) or bfloat16 (MXU-native
    inputs; every dot still accumulates in f32 via
    preferred_element_type, and the recombination math runs in f32).
    """
    if first:
        # a_cat is just a0 (din, T); the tangent rows are constant:
        # z1/z2 are (h, 1) broadcasts and z11 is exactly zero.
        zv = _dot(wt, a_cat) + b.astype(jnp.float32)
        z1 = jnp.broadcast_to(z1row.astype(jnp.float32), zv.shape)
        z11 = jnp.zeros_like(zv)
        z2 = jnp.broadcast_to(z2row.astype(jnp.float32), zv.shape)
    else:
        Z = _dot(wt, a_cat)
        zv = Z[:, 0 * T:1 * T] + b.astype(jnp.float32)
        z1 = Z[:, 1 * T:2 * T]
        z11 = Z[:, 2 * T:3 * T]
        z2 = Z[:, 3 * T:4 * T]
    t = jnp.tanh(zv)
    sp = 1.0 - t * t
    spp = -2.0 * t * sp
    a_cat_out = jnp.concatenate(
        [t, sp * z1, spp * z1 * z1 + sp * z11, sp * z2], axis=1).astype(sdt)
    return a_cat_out, t, z1, z11, z2


def _layer_bwd(wt, t, z1, z11, z2, g_cat, T, sdt=jnp.float32):
    """Backward of the tanh/tangent recombination + the stacked matmul.

    ``g_cat`` (h, 4T) holds the adjoints of this layer's four outputs.
    Returns (gZ_cat, g_in_cat) where gZ_cat are the adjoints of the
    pre-activation streams (for the weight gradient, in ``sdt`` so the
    weight-grad dot runs on MXU-native inputs) and g_in_cat the
    adjoints of the layer inputs (f32 accumulated).
    """
    t = t.astype(jnp.float32)
    z1 = z1.astype(jnp.float32)
    z11 = z11.astype(jnp.float32)
    z2 = z2.astype(jnp.float32)
    g0 = g_cat[:, 0 * T:1 * T]
    g1 = g_cat[:, 1 * T:2 * T]
    g2 = g_cat[:, 2 * T:3 * T]
    g3 = g_cat[:, 3 * T:4 * T]
    sp = 1.0 - t * t
    spp = -2.0 * t * sp
    # d(outputs)/dt summed over the four streams, then through tanh'.
    gt = (g0
          + g1 * (-2.0 * t * z1)
          + g2 * ((6.0 * t * t - 2.0) * z1 * z1 - 2.0 * t * z11)
          + g3 * (-2.0 * t * z2))
    gz_v = sp * gt
    gz_1 = g1 * sp + g2 * (2.0 * spp * z1)
    gz_11 = g2 * sp
    gz_2 = g3 * sp
    gZ_cat = jnp.concatenate([gz_v, gz_1, gz_11, gz_2], axis=1).astype(sdt)
    g_in_cat = _dot(wt.T, gZ_cat)
    return gZ_cat, g_in_cat


def _run_forward(wref, a0, z1row, z2row, n_hidden: int, T: int,
                 sdt=jnp.float32, saved=None):
    """Shared forward over the hidden stack: layer-0 (broadcast tangent
    rows) then the stacked-stream hidden layers; optionally save each
    layer's (t | z1 | z11 | z2) block into ``saved`` VMEM scratch for
    the backward's rematerialization.  Returns the last hidden
    activation streams ``a_cat`` (h, 4T)."""
    a_cat, t, z1, z11, z2 = _layer_fwd(
        wref[0][:], wref[1][:], a0, T, first=True,
        z1row=z1row, z2row=z2row, sdt=sdt)
    if saved is not None:
        saved[0][:] = jnp.concatenate([t, z1, z11, z2], axis=1).astype(sdt)
    for l in range(1, n_hidden):
        a_cat, t, z1, z11, z2 = _layer_fwd(
            wref[2 * l][:], wref[2 * l + 1][:], a_cat, T, sdt=sdt)
        if saved is not None:
            saved[l][:] = jnp.concatenate([t, z1, z11, z2],
                                          axis=1).astype(sdt)
    return a_cat


def _run_backward(wref, gw_refs, gz1row_ref, gz2row_ref, saved,
                  a0, a_cat, gU, n_hidden: int, T: int, sdt=jnp.float32):
    """Shared backward tail: from the output-stream adjoints ``gU``
    (h_out, 4T) back through every layer, accumulating all parameter
    gradients plus the first-layer tangent-row adjoints.  Activations
    are rematerialized from the ``saved`` VMEM blocks — nothing
    round-trips HBM."""
    wt_out = wref[2 * n_hidden][:]
    gw_refs[2 * n_hidden][:] += _dot(gU, a_cat.T)
    gw_refs[2 * n_hidden + 1][:] += jnp.sum(
        gU[:, 0:T].astype(jnp.float32), axis=1, keepdims=True)
    g_cat = _dot(wt_out.T, gU)

    for l in range(n_hidden - 1, 0, -1):
        S = saved[l][:]
        t = S[:, 0 * T:1 * T]
        z1 = S[:, 1 * T:2 * T]
        z11 = S[:, 2 * T:3 * T]
        z2 = S[:, 3 * T:4 * T]
        gZ_cat, g_cat = _layer_bwd(wref[2 * l][:], t, z1, z11, z2,
                                   g_cat, T, sdt=sdt)
        # Layer input = previous layer's outputs, rematerialized.
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
    gZ_cat, _ = _layer_bwd(wref[0][:], t, z1, z11, z2, g_cat, T, sdt=sdt)
    gz_v = gZ_cat[:, 0:T]
    gw_refs[0][:] += _dot(gz_v, a0.T)
    gw_refs[1][:] += jnp.sum(gz_v.astype(jnp.float32), axis=1,
                             keepdims=True)
    # z1/z2 were broadcast rows: their adjoints are column sums.
    gz1row_ref[:] += jnp.sum(
        gZ_cat[:, T:2 * T].astype(jnp.float32), axis=1, keepdims=True)
    gz2row_ref[:] += jnp.sum(
        gZ_cat[:, 3 * T:4 * T].astype(jnp.float32), axis=1, keepdims=True)


def _fwd_kernel(n_hidden: int, nu: float, n_real: int, T: int,
                x_ref, z1row_ref, z2row_ref, *refs):
    """Forward only: accumulate SSE over tiles.  refs: [Wt,b]*L + [sse]."""
    wref = refs[:-1]
    sse_ref = refs[-1]
    i = pl.program_id(0)

    a0 = x_ref[:]  # (din, T), layer-0 input (pre-normalized by caller)
    a_cat = _run_forward(wref, a0, z1row_ref[:], z2row_ref[:], n_hidden, T)

    wt, b = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
    U = _dot(wt, a_cat)
    u = U[:, 0 * T:1 * T] + b
    u_x = U[:, 1 * T:2 * T]
    u_xx = U[:, 2 * T:3 * T]
    u_t = U[:, 3 * T:4 * T]

    f = u_t + u * u_x - nu * u_xx
    col = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
    f = jnp.where(i * T + col < n_real, f, 0.0)

    @pl.when(i == 0)
    def _():
        sse_ref[0, 0] = 0.0

    sse_ref[0, 0] += jnp.sum(f * f)


def _make_fwd_bwd_kernel(n_hidden: int, nu: float, n_real: int, T: int):
    """Build the fused kernel with layer count baked in (static python
    loops; Mosaic unrolls them)."""
    n_layers = n_hidden + 1

    def kernel(x_ref, z1row_ref, z2row_ref, *refs):
        wref = refs[:2 * n_layers]
        sse_ref = refs[2 * n_layers]
        gw_refs = refs[2 * n_layers + 1: 4 * n_layers + 1]
        gz1row_ref = refs[4 * n_layers + 1]
        gz2row_ref = refs[4 * n_layers + 2]
        saved = refs[4 * n_layers + 3:]   # n_hidden VMEM scratch blocks
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sse_ref[0, 0] = 0.0
            for r in gw_refs:
                r[:] = jnp.zeros_like(r)
            gz1row_ref[:] = jnp.zeros_like(gz1row_ref)
            gz2row_ref[:] = jnp.zeros_like(gz2row_ref)

        a0 = x_ref[:]                       # (din, T)
        # ---- forward, saving (t | z1 | z11 | z2) per hidden layer ----
        a_cat = _run_forward(wref, a0, z1row_ref[:], z2row_ref[:],
                             n_hidden, T, saved=saved)

        wt_out, b_out = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
        U = _dot(wt_out, a_cat)
        u = U[:, 0 * T:1 * T] + b_out
        u_x = U[:, 1 * T:2 * T]
        u_xx = U[:, 2 * T:3 * T]
        u_t = U[:, 3 * T:4 * T]

        # ---- loss + its adjoints ----
        f = u_t + u * u_x - nu * u_xx
        col = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
        f = jnp.where(i * T + col < n_real, f, 0.0)
        sse_ref[0, 0] += jnp.sum(f * f)

        g_f = 2.0 * f
        gU = jnp.concatenate(
            [g_f * u_x, g_f * u, -nu * g_f, g_f], axis=1)  # (1, 4T)

        _run_backward(wref, gw_refs, gz1row_ref, gz2row_ref, saved,
                      a0, a_cat, gU, n_hidden, T)

    return kernel


def _prep(params, X_f, lb, ub, dtype):
    """Normalize points, transpose weights, build first-layer tangent
    rows.  All XLA-side (cheap, (h, h)-scale)."""
    lb = jnp.asarray(lb, dtype)
    ub = jnp.asarray(ub, dtype)
    scale = 2.0 / (ub - lb)
    a0 = (2.0 * (X_f - lb) / (ub - lb) - 1.0).T      # (din, N)
    w0 = params[0][0]
    din = w0.shape[0]
    vx = jnp.zeros((din,), dtype).at[0].set(scale[0])
    vt = jnp.zeros((din,), dtype).at[1].set(scale[1])
    z1row = (vx @ w0)[:, None]                       # (h1, 1)
    z2row = (vt @ w0)[:, None]
    wt_args = []
    for w, b in params:
        wt_args += [w.T, b[:, None] if b.ndim == 1 else b.reshape(-1, 1)]
    return a0, z1row, z2row, wt_args, vx, vt


def _pad_points(a0, n, T):
    n_pad = (-n) % T
    if n_pad:
        a0 = jnp.pad(a0, ((0, 0), (0, n_pad)))
    return a0, n + n_pad


@_x64_safe_jit(static_argnames=("nu", "n_real", "interpret"))
def _sse_fwd_call(wt_args, a0p, z1row, z2row, nu, n_real, interpret=False):
    n_total = a0p.shape[1]
    n_layers = len(wt_args) // 2
    T = _tile_for(wt_args)
    kernel = functools.partial(_fwd_kernel, n_layers - 1, nu, n_real, T)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(wt_args)
    sse = pl.pallas_call(
        kernel,
        grid=(n_total // T,),
        in_specs=[
            pl.BlockSpec((a0p.shape[0], T), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, 1), _map_whole,
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), a0p.dtype),
        interpret=interpret,
    )(a0p, z1row, z2row, *wt_args)
    return sse[0, 0]


@_x64_safe_jit(static_argnames=("nu", "n_real", "interpret"))
def _sse_fwd_bwd_call(wt_args, a0p, z1row, z2row, nu, n_real,
                      interpret=False):
    n_total = a0p.shape[1]
    n_layers = len(wt_args) // 2
    n_hidden = n_layers - 1
    T = _tile_for(wt_args)
    kernel = _make_fwd_bwd_kernel(n_hidden, nu, n_real, T)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(wt_args)

    out_shapes = [jax.ShapeDtypeStruct((1, 1), a0p.dtype)]       # sse
    out_specs = [pl.BlockSpec((1, 1), _map_whole,
                              memory_space=pltpu.SMEM)]
    for wt in wt_args:
        out_shapes.append(jax.ShapeDtypeStruct(wt.shape, wt.dtype))
        out_specs.append(pl.BlockSpec(wt.shape, _map_whole,
                                      memory_space=pltpu.VMEM))
    for zrow in (z1row, z2row):
        out_shapes.append(jax.ShapeDtypeStruct(zrow.shape, zrow.dtype))
        out_specs.append(pl.BlockSpec(zrow.shape, _map_whole,
                                      memory_space=pltpu.VMEM))

    scratch = [pltpu.VMEM((wt_args[2 * l].shape[0], 4 * T), a0p.dtype)
               for l in range(n_hidden)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_total // T,),
        in_specs=[
            pl.BlockSpec((a0p.shape[0], T), _map_tile,
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


def make_burgers_sse(lb, ub, nu: float, interpret: bool = False):
    """Differentiable fused ``sse(params, X_f) -> scalar``.

    ``jax.custom_vjp``-wrapped: the forward runs the fused residual
    kernel; the backward runs the fused forward+backward kernel
    (rematerializing activations in VMEM) and returns parameter
    gradients.  X_f receives a zero cotangent (collocation points are
    not trained).
    """
    nu = float(nu)
    lb_arr = np.asarray(lb, np.float32)
    ub_arr = np.asarray(ub, np.float32)

    @jax.custom_vjp
    def sse(params, X_f):
        dtype = X_f.dtype
        a0, z1row, z2row, wt_args, _, _ = _prep(params, X_f, lb_arr,
                                                ub_arr, dtype)
        a0p, _ = _pad_points(a0, X_f.shape[0], _tile_for(wt_args))
        return _sse_fwd_call(tuple(wt_args), a0p, z1row, z2row, nu,
                             X_f.shape[0], interpret=interpret)

    def sse_fwd(params, X_f):
        return sse(params, X_f), (params, X_f)

    def sse_bwd(res, g):
        params, X_f = res
        dtype = X_f.dtype
        a0, z1row, z2row, wt_args, vx, vt = _prep(params, X_f, lb_arr,
                                                  ub_arr, dtype)
        a0p, _ = _pad_points(a0, X_f.shape[0], _tile_for(wt_args))
        _, gwt, gz1row, gz2row = _sse_fwd_bwd_call(
            tuple(wt_args), a0p, z1row, z2row, nu, X_f.shape[0],
            interpret=interpret)
        grads = []
        for l, (w, b) in enumerate(params):
            gw = gwt[2 * l].T
            gb = gwt[2 * l + 1][:, 0] if b.ndim == 1 else gwt[2 * l + 1]
            if l == 0:
                # z1row = (vx @ W0), z2row = (vt @ W0): fold their
                # adjoints back into W0.
                gw = gw + jnp.outer(vx, gz1row[:, 0]) \
                        + jnp.outer(vt, gz2row[:, 0])
            grads.append((g * gw, g * gb))
        return tuple(grads), jnp.zeros_like(X_f)

    sse.defvjp(sse_fwd, sse_bwd)
    return sse


# ---------------------------------------------------------------------------
# Combined train kernel: data term folded into the point stream, loss +
# parameter gradients in ONE kernel launch (VERDICT round-2 item #3).
#
# The v1 loss above launches three programs per training step: the
# forward sse kernel (primal), the fwd+bwd kernel (VJP — recomputing the
# whole forward), and a separate XLA program for the N_u data-MSE term.
# At the flagship N_f=1e4 those dispatch+recompute overheads cost more
# than the fusion saves.  Here every point — data and collocation —
# rides one stream with three per-point auxiliary rows
#
#     target_i : u_i for data points, 0 otherwise
#     w_i      : loss weight (1/N_u data, 1/N_f collocation, 0 padding)
#     d_i      : 1.0 for data points, 0.0 for collocation
#
# and the pointwise misfit is f_i = d_i (u_i - target_i)
#                                 + (1-d_i)(u_t + u u_x - nu u_xx)_i,
# loss = sum_i w_i f_i^2  ==  mse_u + mse_f exactly.  The kernel
# accumulates the loss AND all parameter gradients in a single pass;
# the custom_vjp forward stashes the gradients as residuals so the
# backward is just a scalar rescale — one pallas launch per step.
# ---------------------------------------------------------------------------


def _make_train_kernel(n_hidden: int, nu: float, T: int,
                       sdt=jnp.float32):
    n_layers = n_hidden + 1

    def kernel(x_ref, aux_ref, z1row_ref, z2row_ref, *refs):
        wref = refs[:2 * n_layers]
        loss_ref = refs[2 * n_layers]
        gw_refs = refs[2 * n_layers + 1: 4 * n_layers + 1]
        gz1row_ref = refs[4 * n_layers + 1]
        gz2row_ref = refs[4 * n_layers + 2]
        saved = refs[4 * n_layers + 3:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            loss_ref[0, 0] = 0.0
            for r in gw_refs:
                r[:] = jnp.zeros_like(r)
            gz1row_ref[:] = jnp.zeros_like(gz1row_ref)
            gz2row_ref[:] = jnp.zeros_like(gz2row_ref)

        a0 = x_ref[:]                       # (din, T), sdt
        target = aux_ref[0:1, :]            # (1, T), f32
        w = aux_ref[1:2, :]
        d = aux_ref[2:3, :]

        a_cat = _run_forward(wref, a0, z1row_ref[:], z2row_ref[:],
                             n_hidden, T, sdt=sdt, saved=saved)

        wt_out, b_out = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
        U = _dot(wt_out, a_cat)
        u = U[:, 0 * T:1 * T] + b_out.astype(jnp.float32)
        u_x = U[:, 1 * T:2 * T]
        u_xx = U[:, 2 * T:3 * T]
        u_t = U[:, 3 * T:4 * T]

        # ---- pointwise misfit: data residual OR PDE residual ----
        e = 1.0 - d
        f = d * (u - target) + e * (u_t + u * u_x - nu * u_xx)
        loss_ref[0, 0] += jnp.sum(w * f * f)

        g_f = 2.0 * w * f
        gU = jnp.concatenate(
            [g_f * (d + e * u_x), g_f * e * u, -nu * g_f * e, g_f * e],
            axis=1).astype(sdt)             # (1, 4T)

        _run_backward(wref, gw_refs, gz1row_ref, gz2row_ref, saved,
                      a0, a_cat, gU, n_hidden, T, sdt=sdt)

    return kernel


def _fwd_train_kernel(n_hidden: int, nu: float, T: int, sdt,
                      x_ref, aux_ref, z1row_ref, z2row_ref, *refs):
    """Loss-only variant of the combined kernel (pure evaluations —
    logger lines, line-search probes outside value_and_grad)."""
    wref = refs[:-1]
    loss_ref = refs[-1]
    i = pl.program_id(0)

    a0 = x_ref[:]
    target = aux_ref[0:1, :]
    w = aux_ref[1:2, :]
    d = aux_ref[2:3, :]

    a_cat = _run_forward(wref, a0, z1row_ref[:], z2row_ref[:],
                         n_hidden, T, sdt=sdt)

    wt, b = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
    U = _dot(wt, a_cat)
    u = U[:, 0 * T:1 * T] + b.astype(jnp.float32)
    u_x = U[:, 1 * T:2 * T]
    u_xx = U[:, 2 * T:3 * T]
    u_t = U[:, 3 * T:4 * T]

    e = 1.0 - d
    f = d * (u - target) + e * (u_t + u * u_x - nu * u_xx)

    @pl.when(i == 0)
    def _():
        loss_ref[0, 0] = 0.0

    loss_ref[0, 0] += jnp.sum(w * f * f)


@_x64_safe_jit(static_argnames=("nu", "interpret", "sdt_name"))
def _train_loss_call(wt_args, a0p, auxp, z1row, z2row, nu,
                     interpret=False, sdt_name="float32"):
    sdt = jnp.dtype(sdt_name)
    n_total = a0p.shape[1]
    n_layers = len(wt_args) // 2
    T = _tile_for(wt_args)
    kernel = functools.partial(_fwd_train_kernel, n_layers - 1, nu, T,
                               sdt)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(wt_args)
    out = pl.pallas_call(
        kernel,
        grid=(n_total // T,),
        in_specs=[
            pl.BlockSpec((a0p.shape[0], T), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, T), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, 1), _map_whole,
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(a0p, auxp, z1row, z2row, *wt_args)
    return out[0, 0]


@_x64_safe_jit(static_argnames=("nu", "interpret", "sdt_name"))
def _train_loss_grad_call(wt_args, a0p, auxp, z1row, z2row, nu,
                          interpret=False, sdt_name="float32"):
    sdt = jnp.dtype(sdt_name)
    n_total = a0p.shape[1]
    n_layers = len(wt_args) // 2
    n_hidden = n_layers - 1
    T = _tile_for(wt_args)
    kernel = _make_train_kernel(n_hidden, nu, T, sdt=sdt)
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

    scratch = [pltpu.VMEM((wt_args[2 * l].shape[0], 4 * T), sdt)
               for l in range(n_hidden)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_total // T,),
        in_specs=[
            pl.BlockSpec((a0p.shape[0], T), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, T), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(a0p, auxp, z1row, z2row, *wt_args)
    loss = outs[0][0, 0]
    gwt = outs[1:1 + len(wt_args)]
    gz1row, gz2row = outs[-2], outs[-1]
    return loss, gwt, gz1row, gz2row


def _assemble_net_grads(net_params, gwt, gz1row, gz2row, vx, vt, g):
    """Transpose the kernel's (h, din)-layout weight-grad accumulators
    back to the params layout and fold the first-layer tangent-row
    adjoints (z1row = vx @ W0, z2row = vt @ W0) into W0's gradient;
    ``g`` is the outer cotangent (a scalar rescale)."""
    grads = []
    for l, (wl, bl) in enumerate(net_params):
        gw = gwt[2 * l].T
        gb = gwt[2 * l + 1][:, 0] if bl.ndim == 1 else gwt[2 * l + 1]
        if l == 0:
            gw = gw + jnp.outer(vx, gz1row[:, 0]) \
                    + jnp.outer(vt, gz2row[:, 0])
        grads.append((g * gw, g * gb))
    return tuple(grads)


def make_burgers_loss(lb, ub, nu: float, interpret: bool = False,
                      stream_dtype=None):
    """Full reference loss, fully fused: ``loss(params, batch) =
    mse(u - u_pred) + mse(u_t + u u_x - nu u_xx)`` with data AND
    collocation points in one kernel stream, loss + parameter gradients
    in a single pallas launch per training step (the custom_vjp forward
    computes gradients alongside the loss and the backward is a scalar
    rescale).

    ``stream_dtype="bfloat16"`` runs the layer streams and saved
    buffers in bf16 (the MXU's native input width — halves VMEM and
    doubles peak matmul rate) while the loss, every gradient, and all
    recombination math accumulate in f32.  Residual precision drops to
    bf16's ~3 decimal digits — intended for Adam warmup phases (same
    rationale as hp["tf_net_dtype"]); L-BFGS refinement should stay on
    the exact f32/f64 paths.

    Drop-in for ``pinn.problems.burgers.loss_cont_inference`` on the
    f32 TPU path; differentiable and jit/scan-safe.
    """
    nu = float(nu)
    lb_arr = np.asarray(lb, np.float32)
    ub_arr = np.asarray(ub, np.float32)
    sdt_name = str(jnp.dtype(stream_dtype or jnp.float32))

    def _prep_all(params, batch):
        X_u, u, X_f = batch["X_u"], batch["u"], batch["X_f"]
        n_u, n_f = X_u.shape[0], X_f.shape[0]
        dtype = X_f.dtype
        X = jnp.concatenate([X_u, X_f], axis=0)
        target = jnp.concatenate(
            [u[:, 0], jnp.zeros((n_f,), dtype)])
        w = jnp.concatenate(
            [jnp.full((n_u,), 1.0 / n_u, dtype),
             jnp.full((n_f,), 1.0 / n_f, dtype)])
        d = jnp.concatenate(
            [jnp.ones((n_u,), dtype), jnp.zeros((n_f,), dtype)])
        aux = jnp.stack([target, w, d])                  # (3, N), f32
        a0, z1row, z2row, wt_args, vx, vt = _prep(params, X, lb_arr,
                                                  ub_arr, dtype)
        n = X.shape[0]
        a0p, n_tot = _pad_points(a0, n, _tile_for(wt_args))
        if n_tot != n:  # padding: w=0 kills both loss and grads
            aux = jnp.pad(aux, ((0, 0), (0, n_tot - n)))
        sdt = jnp.dtype(sdt_name)
        if sdt != a0p.dtype:  # bf16 streams: cast kernel inputs once
            a0p = a0p.astype(sdt)
            z1row = z1row.astype(sdt)
            z2row = z2row.astype(sdt)
            wt_args = [a.astype(sdt) for a in wt_args]
        return a0p, aux, z1row, z2row, wt_args, vx, vt

    @jax.custom_vjp
    def loss(params, batch):
        a0p, aux, z1row, z2row, wt_args, _, _ = _prep_all(params, batch)
        return _train_loss_call(tuple(wt_args), a0p, aux, z1row, z2row,
                                nu, interpret=interpret,
                                sdt_name=sdt_name)

    def loss_fwd(params, batch):
        a0p, aux, z1row, z2row, wt_args, vx, vt = _prep_all(params, batch)
        val, gwt, gz1row, gz2row = _train_loss_grad_call(
            tuple(wt_args), a0p, aux, z1row, z2row, nu,
            interpret=interpret, sdt_name=sdt_name)
        return val, (params, batch, gwt, gz1row, gz2row, vx, vt)

    def loss_bwd(res, g):
        params, batch, gwt, gz1row, gz2row, vx, vt = res
        grads = _assemble_net_grads(params, gwt, gz1row, gz2row, vx, vt, g)
        zero_batch = jax.tree_util.tree_map(jnp.zeros_like, batch)
        return grads, zero_batch

    loss.defvjp(loss_fwd, loss_bwd)
    return loss


def make_burgers_loss_dp(lb, ub, nu: float, mesh, axis: str = "data",
                         interpret: bool = False, stream_dtype=None):
    """Data-parallel composition of the fused training kernel: every
    device runs :func:`make_burgers_loss` on its shard of the point
    axis and one ``psum`` re-assembles the global loss (and, through
    shard_map's transpose, the parameter gradients).

    Only the collocation axis shards; the N_u-point data term (tiny —
    ~100 points) is computed redundantly on every device.  Exactness:
    each device returns ``mse_u + (D/N_f)·sse_f_local`` (its local
    ``n_f = N_f/D``), so ``psum(·)/D = mse_u + mse_f`` — the exact
    global loss up to f32 summation order.  ``N_f % D == 0`` is
    enforced at trace time (choose N_f accordingly; the fused batch
    contract has no zero-weight pad rows — unlike the XLA mesh path's
    ``pad_points_with_weights``).

    The reference has no distribution at all (SURVEY.md §2.5); this is
    the TPU-native scale-out of its hot loop: one fused kernel launch
    per device per step, gradients reduced over ICI by the XLA psum —
    no hand-written communication.
    """
    local = make_burgers_loss(lb, ub, nu, interpret=interpret,
                              stream_dtype=stream_dtype)
    n_dev = int(mesh.shape[axis])
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    # check_vma=False: pallas_call's out_shape carries no varying-mesh
    # annotation, so shard_map's vma checker cannot see through it.
    sharded = shard_map(
        lambda p, b: jax.lax.psum(local(p, b), axis) / n_dev,
        mesh=mesh,
        in_specs=(P(), {"X_u": P(), "u": P(), "X_f": P(axis)}),
        out_specs=P(), check_vma=False)

    def loss(params, batch):
        if batch["X_f"].shape[0] % n_dev:
            raise ValueError(
                f"batch['X_f'] leading dim {batch['X_f'].shape[0]} must "
                f"divide the mesh '{axis}' axis ({n_dev}) — choose N_f "
                "as a multiple of the device count for the fused DP path")
        return sharded(params, batch)

    return loss


# ---------------------------------------------------------------------------
# Identification train kernel (VERDICT round-3 item #2): the continuous
# identification loss (reference 1d-burgers/ide_cont_burgers.py:85,
# :109-114) fully fused, with the trainable PDE coefficients riding
# SMEM as runtime scalars:
#
#     loss = mse(u - target) + mse(f),
#     f    = u_t + lambda1 * u u_x - exp(lambda2) * u_xx,
#
# both terms at the SAME points (no separate collocation set).  Each
# point therefore contributes BOTH misfits in one pass via two
# per-point weight rows (w_d, w_f); padding rows carry zeros in both.
# The lambda adjoints are two extra SMEM accumulators:
#
#     d loss / d lambda1     =  sum g_f * u * u_x     (A1)
#     d loss / d lambda2_log = -exp(l2) * sum g_f * u_xx   (-l2 * A2)
#
# with g_f = 2 w_f f — exactly the accumulators the XLA autodiff builds,
# but fused into the same single launch as the parameter gradients.
# ---------------------------------------------------------------------------


def _make_ide_kernel(n_hidden: int, T: int, sdt=jnp.float32):
    n_layers = n_hidden + 1

    def kernel(x_ref, aux_ref, lam_ref, z1row_ref, z2row_ref, *refs):
        wref = refs[:2 * n_layers]
        loss_ref = refs[2 * n_layers]
        gw_refs = refs[2 * n_layers + 1: 4 * n_layers + 1]
        gz1row_ref = refs[4 * n_layers + 1]
        gz2row_ref = refs[4 * n_layers + 2]
        glam_ref = refs[4 * n_layers + 3]
        saved = refs[4 * n_layers + 4:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            loss_ref[0, 0] = 0.0
            glam_ref[0, 0] = 0.0
            glam_ref[0, 1] = 0.0
            for r in gw_refs:
                r[:] = jnp.zeros_like(r)
            gz1row_ref[:] = jnp.zeros_like(gz1row_ref)
            gz2row_ref[:] = jnp.zeros_like(gz2row_ref)

        a0 = x_ref[:]                       # (din, T), sdt
        target = aux_ref[0:1, :]            # (1, T), f32
        w_d = aux_ref[1:2, :]
        w_f = aux_ref[2:3, :]
        l1 = lam_ref[0, 0]                  # lambda1
        l2 = lam_ref[0, 1]                  # exp(lambda2), precomputed

        a_cat = _run_forward(wref, a0, z1row_ref[:], z2row_ref[:],
                             n_hidden, T, sdt=sdt, saved=saved)

        wt_out, b_out = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
        U = _dot(wt_out, a_cat)
        u = U[:, 0 * T:1 * T] + b_out.astype(jnp.float32)
        u_x = U[:, 1 * T:2 * T]
        u_xx = U[:, 2 * T:3 * T]
        u_t = U[:, 3 * T:4 * T]

        # ---- both misfits per point ----
        f = u_t + l1 * u * u_x - l2 * u_xx
        e_d = u - target
        loss_ref[0, 0] += jnp.sum(w_d * e_d * e_d + w_f * f * f)

        g_f = 2.0 * w_f * f
        g_d = 2.0 * w_d * e_d
        glam_ref[0, 0] += jnp.sum(g_f * u * u_x)      # A1
        glam_ref[0, 1] += jnp.sum(g_f * u_xx)         # A2
        gU = jnp.concatenate(
            [g_d + g_f * l1 * u_x, g_f * l1 * u, -l2 * g_f, g_f],
            axis=1).astype(sdt)             # (1, 4T)

        _run_backward(wref, gw_refs, gz1row_ref, gz2row_ref, saved,
                      a0, a_cat, gU, n_hidden, T, sdt=sdt)

    return kernel


def _fwd_ide_kernel(n_hidden: int, T: int, sdt,
                    x_ref, aux_ref, lam_ref, z1row_ref, z2row_ref, *refs):
    """Loss-only variant of the identification kernel (line-search
    probes, logger lines)."""
    wref = refs[:-1]
    loss_ref = refs[-1]
    i = pl.program_id(0)

    a0 = x_ref[:]
    target = aux_ref[0:1, :]
    w_d = aux_ref[1:2, :]
    w_f = aux_ref[2:3, :]
    l1 = lam_ref[0, 0]
    l2 = lam_ref[0, 1]

    a_cat = _run_forward(wref, a0, z1row_ref[:], z2row_ref[:],
                         n_hidden, T, sdt=sdt)

    wt, b = wref[2 * n_hidden][:], wref[2 * n_hidden + 1][:]
    U = _dot(wt, a_cat)
    u = U[:, 0 * T:1 * T] + b.astype(jnp.float32)
    u_x = U[:, 1 * T:2 * T]
    u_xx = U[:, 2 * T:3 * T]
    u_t = U[:, 3 * T:4 * T]

    f = u_t + l1 * u * u_x - l2 * u_xx
    e_d = u - target

    @pl.when(i == 0)
    def _():
        loss_ref[0, 0] = 0.0

    loss_ref[0, 0] += jnp.sum(w_d * e_d * e_d + w_f * f * f)


@_x64_safe_jit(static_argnames=("interpret", "sdt_name"))
def _ide_loss_call(wt_args, a0p, auxp, lam, z1row, z2row,
                   interpret=False, sdt_name="float32"):
    sdt = jnp.dtype(sdt_name)
    n_total = a0p.shape[1]
    n_layers = len(wt_args) // 2
    T = _tile_for(wt_args)
    kernel = functools.partial(_fwd_ide_kernel, n_layers - 1, T, sdt)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(wt_args)
    out = pl.pallas_call(
        kernel,
        grid=(n_total // T,),
        in_specs=[
            pl.BlockSpec((a0p.shape[0], T), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, T), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, 1), _map_whole,
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(a0p, auxp, lam, z1row, z2row, *wt_args)
    return out[0, 0]


@_x64_safe_jit(static_argnames=("interpret", "sdt_name"))
def _ide_loss_grad_call(wt_args, a0p, auxp, lam, z1row, z2row,
                        interpret=False, sdt_name="float32"):
    sdt = jnp.dtype(sdt_name)
    n_total = a0p.shape[1]
    n_layers = len(wt_args) // 2
    n_hidden = n_layers - 1
    T = _tile_for(wt_args)
    kernel = _make_ide_kernel(n_hidden, T, sdt=sdt)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(wt_args)

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
    out_shapes.append(jax.ShapeDtypeStruct((1, 2), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 2), _map_whole,
                                  memory_space=pltpu.SMEM))

    scratch = [pltpu.VMEM((wt_args[2 * l].shape[0], 4 * T), sdt)
               for l in range(n_hidden)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_total // T,),
        in_specs=[
            pl.BlockSpec((a0p.shape[0], T), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, T), _map_tile,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(a0p, auxp, lam, z1row, z2row, *wt_args)
    loss = outs[0][0, 0]
    gwt = outs[1:1 + len(wt_args)]
    gz1row, gz2row, glam = outs[-3], outs[-2], outs[-1]
    return loss, gwt, gz1row, gz2row, glam


def make_burgers_ide_loss(lb, ub, interpret: bool = False,
                          stream_dtype=None):
    """Fused identification loss: ``loss(params: IdeParams, batch)``
    with ``batch = {"X_u", "u"}`` — data MSE plus residual MSE at the
    same points, residual ``u_t + lambda1 u u_x - exp(lambda2) u_xx``
    with TRAINABLE coefficients (reference ide_cont_burgers.py:85,
    :109-114).

    One pallas launch per training step computes the loss, every
    network-parameter gradient, AND both lambda adjoints (two extra
    SMEM scalar accumulators); the custom_vjp backward is a scalar
    rescale.  Gradient-oracle-tested against
    ``jax.grad(pinn.problems.burgers.loss_cont_identification)``
    (tests/test_pallas_train.py).  f32 streams (``stream_dtype=
    "bfloat16"`` for warmup-grade bf16, f32 accumulation).
    """
    lb_arr = np.asarray(lb, np.float32)
    ub_arr = np.asarray(ub, np.float32)
    sdt_name = str(jnp.dtype(stream_dtype or jnp.float32))

    def _prep_all(params, batch):
        X, u = batch["X_u"], batch["u"]
        n = X.shape[0]
        dtype = X.dtype
        w = jnp.full((n,), 1.0 / n, dtype)
        aux = jnp.stack([u[:, 0], w, w])     # (3, N): target, w_d, w_f
        a0, z1row, z2row, wt_args, vx, vt = _prep(params.net, X, lb_arr,
                                                  ub_arr, dtype)
        a0p, n_tot = _pad_points(a0, n, _tile_for(wt_args))
        if n_tot != n:  # padding: w_d = w_f = 0 kills loss and grads
            aux = jnp.pad(aux, ((0, 0), (0, n_tot - n)))
        lam = jnp.stack([params.lambda1[0],
                         jnp.exp(params.log_lambda2[0])]
                        ).reshape(1, 2).astype(jnp.float32)
        sdt = jnp.dtype(sdt_name)
        if sdt != a0p.dtype:  # bf16 streams: cast kernel inputs once
            a0p = a0p.astype(sdt)
            z1row = z1row.astype(sdt)
            z2row = z2row.astype(sdt)
            wt_args = [a.astype(sdt) for a in wt_args]
        return a0p, aux, lam, z1row, z2row, wt_args, vx, vt

    @jax.custom_vjp
    def loss(params, batch):
        a0p, aux, lam, z1row, z2row, wt_args, _, _ = _prep_all(params,
                                                               batch)
        return _ide_loss_call(tuple(wt_args), a0p, aux, lam, z1row,
                              z2row, interpret=interpret,
                              sdt_name=sdt_name)

    def loss_fwd(params, batch):
        a0p, aux, lam, z1row, z2row, wt_args, vx, vt = _prep_all(params,
                                                                 batch)
        val, gwt, gz1row, gz2row, glam = _ide_loss_grad_call(
            tuple(wt_args), a0p, aux, lam, z1row, z2row,
            interpret=interpret, sdt_name=sdt_name)
        return val, (params, batch, gwt, gz1row, gz2row, glam, vx, vt)

    def loss_bwd(res, g):
        from pinn.problems.burgers import IdeParams
        params, batch, gwt, gz1row, gz2row, glam, vx, vt = res
        net_g = _assemble_net_grads(params.net, gwt, gz1row, gz2row,
                                    vx, vt, g)
        # d loss / d lambda1 = A1; chain the exp reparameterization
        # for lambda2: d loss / d log_lambda2 = -exp(l2) * A2.
        l2 = jnp.exp(params.log_lambda2)
        g_l1 = (g * glam[0, 0]).reshape(1).astype(params.lambda1.dtype)
        g_logl2 = (-g * glam[0, 1] * l2[0]).reshape(1).astype(
            params.log_lambda2.dtype)
        grads = IdeParams(net=net_g, lambda1=g_l1, log_lambda2=g_logl2)
        zero_batch = jax.tree_util.tree_map(jnp.zeros_like, batch)
        return grads, zero_batch

    loss.defvjp(loss_fwd, loss_bwd)
    return loss
