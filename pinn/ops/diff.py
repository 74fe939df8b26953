"""Generic forward-mode derivative engine (jvp compositions).

This is the architecture-agnostic counterpart of the fused
``pinn.models.mlp.taylor_apply``: it computes the same directional
derivatives for *any* batched function via nested ``jax.jvp``, and is
the oracle the fused path is tested against.  It replaces the
reference's nested ``tf.GradientTape`` pattern
(reference 1d-burgers/inf_cont_burgers.py:65-90) and the double-vjp
"dummy gradient" Jacobian trick
(reference 1d-burgers/inf_disc_burgers.py:74-80): because PINN inputs
are 1-2 dimensional, forward mode obtains each column of the Jacobian
(and Hessian diagonal blocks) in a single pass regardless of the
output width — a q+1-output IRK network needs one jvp, not q+1
backward sweeps.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _broadcast_tangent(X: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Per-point tangent for a shared input-space direction ``v`` (din,)."""
    return jnp.broadcast_to(v, X.shape).astype(X.dtype)


def directional(f: Callable, X: jnp.ndarray, v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(f(X), df·v) for a batched function f: (N, din) -> (N, dout)."""
    return jax.jvp(f, (X,), (_broadcast_tangent(X, v),))


def directional2(
    f: Callable, X: jnp.ndarray, v: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(f, df·v, d²f[v,v]) via jvp-over-jvp (forward-over-forward)."""
    tangent = _broadcast_tangent(X, v)

    def first(x):
        return jax.jvp(f, (x,), (tangent,))

    (value, d1), (_, d11) = jax.jvp(first, (X,), (tangent,))
    return value, d1, d11


def directional3(
    f: Callable, X: jnp.ndarray, v: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(f, df·v, d²f[v,v], d³f[v,v,v]) via jvp³ (forward-over-forward-
    over-forward) — the oracle for ``taylor_apply(order=3)``'s
    Faà-di-Bruno stream (dispersive terms like KdV's u_xxx)."""
    tangent = _broadcast_tangent(X, v)

    def first(x):
        return jax.jvp(f, (x,), (tangent,))

    def second(x):
        return jax.jvp(first, (x,), (tangent,))

    ((value, d1), (_, d11)), ((_, _), (_, d111)) = jax.jvp(
        second, (X,), (tangent,))
    return value, d1, d11, d111


def space_time_derivs(
    f: Callable,
    X: jnp.ndarray,
    vx: jnp.ndarray,
    vt: Optional[jnp.ndarray] = None,
    order: int = 2,
):
    """All derivatives a continuous-time PINN residual needs.

    Returns ``(value, d_x, d_xx, d_t)`` where ``d_xx`` is None for
    ``order < 2`` and ``d_t`` is None when ``vt`` is None.  Matches the
    output contract of ``pinn.models.mlp.taylor_apply``.
    """
    if order >= 2:
        value, dx, dxx = directional2(f, X, vx)
    else:
        value, dx = directional(f, X, vx)
        dxx = None
    dt = directional(f, X, vt)[1] if vt is not None else None
    return value, dx, dxx, dt
