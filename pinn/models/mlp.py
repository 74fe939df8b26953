"""Tanh MLP with fused forward Taylor-mode derivative propagation.

Capability parity with the reference's Keras model (reference
utils/neuralnetwork.py:27-37): input normalization
``2 (X - lb) / (ub - lb) - 1``, tanh hidden layers with glorot-normal
init, linear output.

The TPU-first part is :func:`taylor_apply`.  PINN residuals need input
derivatives of the network (u_x, u_xx, u_t for Burgers —
reference 1d-burgers/inf_cont_burgers.py:65-90 computes them by nested
``tf.GradientTape``; the discrete-time scripts use a double-vjp "dummy
gradient" trick, 1d-burgers/inf_disc_burgers.py:74-80).  On TPU the
efficient formulation is *forward* propagation: carry
``(a, da·v1, d²a[v1,v1], da·v2)`` through the layers together.  Each
hidden layer then costs 4 batched ``(N,h)x(h,h)`` matmuls (MXU) plus
VPU elementwise work, with one HBM pass over the weights — no tape, no
graph re-tracing, no second reverse sweep.  The whole computation is
ordinary traced JAX, so an outer ``jax.grad`` for the loss gradient
differentiates straight through it.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pinn.dtypes import default_dtype

Params = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]


class MLP(NamedTuple):
    """Static MLP spec: layer widths and domain bounds for normalization."""

    layers: Tuple[int, ...]
    lb: jnp.ndarray  # (din,) lower domain bound
    ub: jnp.ndarray  # (din,) upper domain bound


def init_mlp(key: jax.Array, layers: Sequence[int], dtype=None) -> Params:
    """Glorot-normal init (parity: reference utils/neuralnetwork.py:31-37).

    Returns a tuple of ``(W, b)`` pairs, ``W`` of shape (fan_in, fan_out).
    """
    dtype = dtype or default_dtype()
    params = []
    keys = jax.random.split(key, len(layers) - 1)
    # Init runs on the CPU backend: bit-identical weights across
    # platforms, and the TPU x64 rewriter lacks the `nextafter` op that
    # f64 truncated_normal lowers to.
    # local_devices, not devices: under a multi-controller runtime
    # (pinn.parallel.distributed) jax.devices() is global and [0] may
    # belong to another process — init must run on an addressable
    # device (caught by tests/test_distributed.py).
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        for k, fan_in, fan_out in zip(keys, layers[:-1], layers[1:]):
            std = jnp.sqrt(2.0 / (fan_in + fan_out)).astype(dtype)
            w = jax.random.truncated_normal(
                k, -2.0, 2.0, (fan_in, fan_out), dtype=dtype)
            # Truncated normal on [-2, 2] has std ~0.8796; rescale so the
            # weight std matches glorot_normal's sqrt(2 / (fan_in+fan_out)).
            w = w * (std / 0.87962566103423978)
            b = jnp.zeros((fan_out,), dtype=dtype)
            params.append((w, b))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a)), tuple(params))


def normalize(X: jnp.ndarray, lb: jnp.ndarray, ub: jnp.ndarray) -> jnp.ndarray:
    """Affine map of the domain onto [-1, 1]^din (reference utils/neuralnetwork.py:29-30)."""
    return 2.0 * (X - lb) / (ub - lb) - 1.0


def apply(params: Params, X: jnp.ndarray, lb, ub) -> jnp.ndarray:
    """Plain forward pass: (N, din) -> (N, dout)."""
    a = normalize(X, lb, ub)
    for w, b in params[:-1]:
        a = jnp.tanh(a @ w + b)
    w, b = params[-1]
    return a @ w + b


class TaylorOut(NamedTuple):
    """Network output and its input-directional derivatives.

    value: H(X)                     (N, dout)
    d1:    dH·v1                    (N, dout)  — e.g. u_x
    d11:   d²H[v1, v1]              (N, dout)  — e.g. u_xx (None if order<2)
    d2:    dH·v2                    (N, dout)  — e.g. u_t  (None if v2 absent)
    d111:  d³H[v1, v1, v1]          (N, dout)  — e.g. u_xxx (None if order<3)
    """

    value: jnp.ndarray
    d1: jnp.ndarray
    d11: Optional[jnp.ndarray]
    d2: Optional[jnp.ndarray]
    d111: Optional[jnp.ndarray] = None


def taylor_apply(
    params: Params,
    X: jnp.ndarray,
    lb,
    ub,
    v1: jnp.ndarray,
    v2: Optional[jnp.ndarray] = None,
    order: int = 2,
) -> TaylorOut:
    """Forward pass carrying directional-derivative streams.

    ``v1``/``v2`` are direction vectors in *input* space, shape (din,).
    ``order=2`` also propagates the second directional derivative along
    ``v1``; ``order=3`` additionally carries the third (Faà di Bruno
    streams through tanh: a111 = tanh'''·z1³ + 3 tanh''·z1·z11 +
    tanh'·z111 — needed for dispersive PDEs like KdV's u_xxx).  Cost:
    (2 + order-1 + has_v2) matmuls per layer, all batched on the MXU.

    The first layer is special-cased: the tangent of the (affine)
    normalized input is the same constant row for every point, so its
    image under W0 is a single (din,) @ (din, h) vector broadcast over
    the batch, and its second derivative is exactly zero.  This both
    saves two batch-sized matmuls and keeps batch-shaped compile-time
    constants out of the program (constant @ parameter matmuls crash
    the current libtpu AOT compiler).
    """
    scale = 2.0 / (ub - lb)  # d(normalize)/dX is diagonal
    a = normalize(X, lb, ub)

    # ---- first affine layer ----
    w, b = params[0]
    z = a @ w + b
    z1 = jnp.broadcast_to((v1 * scale) @ w, z.shape)
    z2 = jnp.broadcast_to((v2 * scale) @ w, z.shape) if v2 is not None else None

    if len(params) == 1:  # single linear layer
        return TaylorOut(
            value=z, d1=z1,
            d11=jnp.zeros_like(z) if order >= 2 else None,
            d2=z2,
            d111=jnp.zeros_like(z) if order >= 3 else None)

    a = jnp.tanh(z)
    sp = 1.0 - a * a              # tanh'
    a1 = sp * z1
    if order >= 2:
        spp = -2.0 * a * sp       # tanh''
        a11 = spp * z1 * z1      # z11 of the first layer is exactly 0
    else:
        a11 = None
    if order >= 3:
        sppp = -2.0 * sp * (1.0 - 3.0 * a * a)   # tanh'''
        a111 = sppp * z1 * z1 * z1               # z11 = z111 = 0 here
    else:
        a111 = None
    a2 = sp * z2 if z2 is not None else None

    # ---- remaining hidden layers ----
    for w, b in params[1:-1]:
        z = a @ w + b
        z1 = a1 @ w
        z11 = a11 @ w if order >= 2 else None
        z111 = a111 @ w if order >= 3 else None
        z2 = a2 @ w if a2 is not None else None
        a = jnp.tanh(z)
        sp = 1.0 - a * a
        a1 = sp * z1
        if order >= 2:
            spp = -2.0 * a * sp
            a11 = spp * z1 * z1 + sp * z11
        if order >= 3:
            sppp = -2.0 * sp * (1.0 - 3.0 * a * a)
            a111 = (sppp * z1 * z1 * z1
                    + 3.0 * spp * z1 * z11
                    + sp * z111)
        if z2 is not None:
            a2 = sp * z2

    # ---- linear output layer ----
    w, b = params[-1]
    return TaylorOut(
        value=a @ w + b,
        d1=a1 @ w,
        d11=(a11 @ w) if order >= 2 else None,
        d2=(a2 @ w) if a2 is not None else None,
        d111=(a111 @ w) if order >= 3 else None,
    )
