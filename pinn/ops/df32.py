"""Double-f32 ("df32") extended-precision arithmetic for TPU.

TPU float64 is software-emulated (~18-20x a fused f32 step on this
repo's workloads — RESULTS.md / SCALING.md), and the f64 warm-start
refinement stage dominates every flagship recipe's wall-clock.  This
module replaces that stage's *network evaluation* with double-word
float32 arithmetic: every value is an unevaluated sum ``hi + lo`` of
two f32s (~49-bit effective mantissa, relative error ~2^-48 per op),
built from the classic error-free transformations — Knuth's TwoSum and
Dekker's TwoProd (via 12-bit splitting; no FMA required, so it runs on
the TPU VPU as plain IEEE f32 adds/muls, which XLA does not contract
or reassociate).

Why this beats emulated f64 here: the f32 SSE floor that forces the
f64 stage comes from *cancellation in the residual* (O(1) derivative
terms cancel to ~1e-3 and below near convergence), i.e. from forward-
evaluation precision, not from gradient-arithmetic precision.  df32
restores the forward precision at a handful of VPU flops per op
instead of the emulator's general-purpose f64 semantics.  The loss
gradient is obtained by ordinary ``jax.grad`` *through* the df32
graph: all EFT building blocks are polynomial in their inputs, so AD
yields the exact derivative of the compensated forward map; the
backward arithmetic itself runs in f32, which is sufficient because
the cotangent seeds (the compensated residuals) already carry the
extended-precision information and ``Jᵀ r`` has no catastrophic
cancellation.  Measured gradient agreement vs the f64 oracle is at the
1e-7 relative level vs ~1e-3 for a plain-f32 evaluation near the floor
(tests/test_df32.py).

Layer contractions use a compensated pairwise tree reduction (Ogita-
Rump-Oishi Sum2-style, vectorized over the batch) rather than the MXU:
PINN layers are 20-100 wide, so the contraction is bandwidth-trivial
and the MXU's internal f32 accumulation cannot be made error-free
without Ozaki-style slicing overkill.

No counterpart exists in the reference (it is float64 TF eager
throughout, utils/neuralnetwork.py:24-26); this is TPU-native
infrastructure for the same capability (f64-grade refinement).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32
# Dekker splitting constant for f32 (24-bit mantissa -> 12|12 split).
_SPLIT = np.float32(4097.0)  # 2^12 + 1

# EFT exactness requires every consumer of an intermediate to read the SAME
# IEEE-f32 value.  Backend behavior (measured, this machine):
#
# - TPU (the target): exact under jit with no caveats — 64x64x512 df32
#   matmuls agree with the f64 oracle to ~7e-12 relative, tanh to 9e-15
#   (/tmp-tier repro, re-run in tests/test_df32.py's tpu tier).  The TPU
#   emitter does not re-contract the EFT chains.
# - CPU: the *fusion emitter* breaks EFTs under jit.  The fusion pass
#   duplicates a producer (e.g. the raw product tensor) into several
#   fusions and LLVM contracts mul+add into FMA per site, so the tree's
#   rounded sum ``s`` is no longer ``fl(p1+p2)`` of the same ``p`` the
#   error term reads — measured 2e-6 error in a 64x64 df32 matmul vs
#   2.5e-13 eager.  ``optimization_barrier`` does NOT survive to the CPU
#   fusion pass; disabling fusion (compile option
#   ``xla_backend_optimization_level=0`` or
#   ``xla_disable_hlo_passes=cpu-instruction-fusion,fusion``) restores
#   exactness (1.4e-14).  This is fine in practice: df32 exists because
#   TPU f64 is software-emulated; on CPU, native f64 is both faster and
#   more accurate, so the trainer never routes df32 to CPU.  CPU tests
#   pin the no-fusion compile options.
#
# The barriers below pin the rounded sum/product each error term derives
# from; they are load-bearing insurance against future fusion changes on
# TPU and make eager/interpret paths bit-stable.
_pin = jax.lax.optimization_barrier


class DF(NamedTuple):
    """Unevaluated f32 sum ``hi + lo`` (|lo| <= ulp(hi)/2 when normalized).

    A NamedTuple, hence a JAX pytree: jit/grad/vmap thread it freely.
    Operator overloads accept DF, python scalars, and f32 arrays.
    """

    hi: jnp.ndarray
    lo: jnp.ndarray

    # -- arithmetic operators ------------------------------------------
    def __add__(self, other):
        return add(self, _coerce(other))

    __radd__ = __add__

    def __sub__(self, other):
        return add(self, neg(_coerce(other)))

    def __rsub__(self, other):
        return add(_coerce(other), neg(self))

    def __mul__(self, other):
        return mul(self, _coerce(other))

    __rmul__ = __mul__

    def __truediv__(self, other):
        return div(self, _coerce(other))

    def __rtruediv__(self, other):
        return div(_coerce(other), self)

    def __neg__(self):
        return neg(self)

    def __matmul__(self, other):
        return matmul(self, other)

    # -- shape helpers --------------------------------------------------
    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])

    def reshape(self, *shape):
        return DF(self.hi.reshape(*shape), self.lo.reshape(*shape))


def _coerce(x) -> DF:
    if isinstance(x, DF):
        return x
    if isinstance(x, (int, float)):
        return const(x)
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        return from_f64(x)
    return DF(x.astype(_F32), jnp.zeros_like(x, dtype=_F32))


# ---------------------------------------------------------------------------
# Error-free transformations (all plain IEEE f32 adds/muls)
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """Knuth: s + err == a + b exactly, s = fl(a + b)."""
    s = _pin(a + b)
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Dekker: requires |a| >= |b| (or a == 0)."""
    s = _pin(a + b)
    err = b - (s - a)
    return s, err


def _split(a):
    t = _pin(_SPLIT * a)
    hi = _pin(t - (t - a))
    return hi, a - hi


def two_prod(a, b):
    """p + err == a * b exactly, p = fl(a * b) (Dekker, FMA-free)."""
    p = _pin(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# ---------------------------------------------------------------------------
# Double-word arithmetic (accurate variants; ~2^-48 relative per op)
# ---------------------------------------------------------------------------

def add(x: DF, y: DF) -> DF:
    """Accurate dd add (two TwoSums): keeps relative accuracy under the
    heavy cancellation PINN residuals are made of (u_t + u u_x - nu u_xx
    cancels O(1) terms down to the 1e-3..1e-6 scale near convergence)."""
    s, e = two_sum(x.hi, y.hi)
    t, f = two_sum(x.lo, y.lo)
    e = e + t
    s, e = fast_two_sum(s, e)
    e = e + f
    s, e = fast_two_sum(s, e)
    return DF(s, e)


def neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DF(*fast_two_sum(p, e))


def div(x: DF, y: DF) -> DF:
    """Long-division style with two corrections (full dd accuracy)."""
    q1 = x.hi / y.hi
    r = add(x, neg(mul(DF(q1, jnp.zeros_like(q1)), y)))
    q2 = r.hi / y.hi
    r = add(r, neg(mul(DF(q2, jnp.zeros_like(q2)), y)))
    q3 = r.hi / y.hi
    s, e = fast_two_sum(q1, q2)
    return add(DF(s, e), DF(q3, jnp.zeros_like(q3)))


def const(v) -> DF:
    """Split a python/f64 scalar into an exact (hi, lo) f32 pair."""
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def from_f64(x: jnp.ndarray) -> DF:
    """Exact split of an f64 array.  Under jax.grad the cotangent flows
    entirely through ``hi`` (d lo/dx = 1 - d hi/dx = 0), so gradients
    of a df32 loss w.r.t. f64 parameters come out in f64 directly."""
    hi = x.astype(_F32)
    lo = (x - hi.astype(jnp.float64)).astype(_F32)
    return DF(hi, lo)


def to_f64(x: DF) -> jnp.ndarray:
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def from_f32(x: jnp.ndarray) -> DF:
    x = jnp.asarray(x, _F32)
    return DF(x, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Structural ops
# ---------------------------------------------------------------------------

def broadcast_to(x: DF, shape) -> DF:
    return DF(jnp.broadcast_to(x.hi, shape), jnp.broadcast_to(x.lo, shape))


def concatenate(xs, axis=0) -> DF:
    return DF(jnp.concatenate([x.hi for x in xs], axis=axis),
              jnp.concatenate([x.lo for x in xs], axis=axis))


def sum_pairwise(x: DF, axis: int) -> DF:
    """Compensated pairwise-tree reduction along ``axis``.

    Each fold level runs one vectorized TwoSum on the halves and
    accumulates the rounding residue plus the lo-channel in a running
    f32 error term — the vectorized analogue of Ogita-Rump-Oishi Sum2,
    with error O(log K · 2^-48 · cond) instead of sequential O(K)."""
    x = DF(jnp.moveaxis(x.hi, axis, 0), jnp.moveaxis(x.lo, axis, 0))
    s, e = x.hi, x.lo
    k = s.shape[0]
    while k > 1:
        h = (k + 1) // 2
        if k % 2 == 1:
            pad = [(0, 1)] + [(0, 0)] * (s.ndim - 1)
            s = jnp.pad(s, pad)
            e = jnp.pad(e, pad)
        t, err = two_sum(s[:h], s[h:2 * h])
        s, e = t, e[:h] + e[h:2 * h] + err
        k = h
    return DF(*fast_two_sum(s[0], e[0]))


def matmul(a: DF, b: DF) -> DF:
    """(N, K) @ (K, M) in df32 via a ``lax.scan`` compensated
    contraction over K (Ogita–Rump–Oishi Sum2/Dot2 style, vectorized
    over the (N, M) output).

    Strategy: hi*hi products are made exact with TwoProd; the running
    sum is carried as a TwoSum (s, e) pair; the hi*lo and lo*hi cross
    terms are ~2^-24 relative and accumulate in the plain-f32 error
    channel; lo*lo (~2^-48) is dropped.  Relative error O(K·2^-48·cond)
    — at the largest K in this repo (q=500 IRK coupling) still ~1e-12.

    A scan, not an unrolled pairwise tree: the step body is ~20 ops, so
    the traced graph stays O(1) in K (an unrolled tree at the flagship
    shapes pushed the fused loss+grad HLO into multi-10-minute TPU
    compiles), and the live temporaries are two (N, M) f32 carries
    instead of (N, K, M) broadcast tensors — HBM-bound wins.
    """
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError("matmul expects 2-D operands")
    n, k = a.shape
    k2, m = b.shape
    assert k == k2, (a.shape, b.shape)

    def step(carry, xs):
        s, e = carry
        ah, al, bh, bl = xs  # (N,), (N,), (M,), (M,)
        p, pe = two_prod(ah[:, None], bh[None, :])
        cross = ah[:, None] * bl[None, :] + al[:, None] * bh[None, :]
        s, err = two_sum(s, p)
        return (s, e + (err + (pe + cross))), None

    zero = jnp.zeros((n, m), _F32)
    (s, e), _ = jax.lax.scan(step, (zero, zero),
                             (a.hi.T, a.lo.T, b.hi, b.lo))
    return DF(*fast_two_sum(s, e))


# ---------------------------------------------------------------------------
# Transcendentals
# ---------------------------------------------------------------------------

# exp range reduction: y = k ln2 + r. Cody-Waite: L1 has a 9-bit
# mantissa so k*L1 is exact in f32 for |k| < 2^15; the L2 remainder is
# a dd constant multiplied in dd.
_LN2_L1 = np.float32(0.693359375)
_LN2_L2 = const(np.log(np.float64(2.0)) - np.float64(0.693359375))
_INV_LN2 = np.float32(1.0 / np.log(2.0))

# expm1(r) = r + r^2/2! + ... on |r| <= ln2/2 ~ 0.347: degree 13 gives
# truncation ~4e-18 relative, far below the 2^-48 arithmetic grain.
import math as _math

_EXP_DEGREE = 13
_EXP_COEFFS = [const(1.0 / _math.factorial(i))
               for i in range(_EXP_DEGREE, 1, -1)]


def _expm1_reduced(r: DF) -> DF:
    """expm1 on the reduced interval |r| <= ln2/2, by dd Horner.
    Returns r + r^2/2 + ... (the leading 1 never enters, so tiny r
    keeps full relative accuracy)."""
    acc = broadcast_to(_EXP_COEFFS[0], r.shape)
    for c in _EXP_COEFFS[1:]:
        acc = add(mul(acc, r), broadcast_to(c, r.shape))
    # acc = 1/2! + r/3!... actually acc now = sum_{i>=2} r^{i-2}/i!
    # expm1 = r + r^2 * acc_shifted; assemble as r * (1 + r * acc)
    return mul(r, add(mul(r, acc), broadcast_to(const(1.0), r.shape)))


def expm1(y: DF) -> DF:
    """dd expm1 for y >= 0 (clamped at 40; beyond that tanh == 1 to
    2^-57).  k = 0 keeps the cancellation-free series path."""
    yhi = jnp.minimum(y.hi, np.float32(40.0))
    y = DF(yhi, jnp.where(y.hi > 40.0, jnp.zeros_like(y.lo), y.lo))
    k = jnp.round(yhi * _INV_LN2)
    r = add(y, DF(-k * _LN2_L1, jnp.zeros_like(k)))
    r = add(r, neg(mul(DF(k, jnp.zeros_like(k)),
                       broadcast_to(_LN2_L2, k.shape))))
    em1 = _expm1_reduced(r)
    # exp(y) - 1 = 2^k (em1 + 1) - 1; k >= 1 has no cancellation
    # (2^k >= 2, so the -1 removes at most half the leading bit).
    scale = jnp.ldexp(jnp.ones_like(k), k.astype(jnp.int32))
    full = DF(em1.hi * scale, em1.lo * scale)  # exact power-of-2 scale
    # 2^k - 1 as an EXACT dd pair: for k > 24 the f32 subtraction would
    # round away the -1 entirely; TwoSum keeps it in the lo word.
    shifted = add(full, DF(*two_sum(scale, -jnp.ones_like(scale))))
    return DF(jnp.where(k == 0, em1.hi, shifted.hi),
              jnp.where(k == 0, em1.lo, shifted.lo))


def tanh(x: DF) -> DF:
    """dd tanh via tanh(|x|) = u / (u + 2), u = expm1(2|x|); sign
    restored by symmetry.  Accurate to ~2^-47 relative across the
    whole range (tests/test_df32.py vs float128)."""
    sgn = jnp.sign(x.hi) + (x.hi == 0)  # +-1, treat -0/0 as +
    ax = DF(x.hi * sgn, x.lo * sgn)
    u = expm1(DF(ax.hi * 2, ax.lo * 2))  # exact doubling
    t = div(u, add(u, broadcast_to(const(2.0), u.shape)))
    return DF(t.hi * sgn, t.lo * sgn)


# ---------------------------------------------------------------------------
# PINN network evaluation (the f64-refinement replacement engine)
#
# Mirrors pinn.models.mlp.apply / taylor_apply (same normalization, same
# stream recurrences — reference utils/neuralnetwork.py:27-37 for the
# architecture, 1d-burgers/inf_cont_burgers.py:65-90 for the derivatives
# the residual needs) with every value a DF pair.  Parameters arrive as
# the trainer's float64 pytree and are split exactly (from_f64), so the
# loss is a deterministic function of the f64 L-BFGS iterate and
# ``jax.grad`` w.r.t. that iterate flows through the splits.
# ---------------------------------------------------------------------------

def _split_params(params):
    return tuple((from_f64(w), from_f64(b)) for w, b in params)


def _stack_mids(pd):
    """Stack equal-shaped middle layers for a lax.scan over depth, or
    None when the net is inhomogeneous (falls back to a Python loop)."""
    mids = pd[1:-1]
    if not mids or any(w.hi.shape != mids[0][0].hi.shape
                       or b.hi.shape != mids[0][1].hi.shape
                       for w, b in mids):
        return None
    return (DF(jnp.stack([w.hi for w, _ in mids]),
               jnp.stack([w.lo for w, _ in mids])),
            DF(jnp.stack([b.hi for _, b in mids]),
               jnp.stack([b.lo for _, b in mids])))


def apply_df32(params, X, lb, ub) -> DF:
    """Plain forward pass (N, din) -> (N, dout), value only."""
    a = from_f64(2.0 * (X - lb) / (ub - lb) - 1.0)
    pd = _split_params(params)
    if len(pd) == 1:
        w, b = pd[0]
        return add(matmul(a, w), b)
    w, b = pd[0]
    a = tanh(add(matmul(a, w), b))
    stacked = _stack_mids(pd)
    if stacked is not None:
        def layer(a_, wb):
            w_, b_ = wb
            return tanh(add(matmul(a_, w_), b_)), None
        a, _ = jax.lax.scan(layer, a, stacked)
    else:
        for w, b in pd[1:-1]:
            a = tanh(add(matmul(a, w), b))
    w, b = pd[-1]
    return add(matmul(a, w), b)


class TaylorOutDF(NamedTuple):
    value: DF
    d1: DF
    d11: DF
    d2: DF


def taylor_apply_df32(params, X, lb, ub, v1, v2=None) -> TaylorOutDF:
    """Forward Taylor streams (value, dv1, d²v1[, dv2]) in df32.

    The same recurrence as mlp.taylor_apply order=2: per hidden layer
    3-4 df32 matmuls then the tanh chain-rule combinations.  v1/v2 are
    f64 direction vectors in input space; ``v2=None`` skips the fourth
    stream (the disc-IRK families differentiate along x only) and
    returns ``d2=None``."""
    scale = 2.0 / (ub - lb)
    a = from_f64(2.0 * (X - lb) / (ub - lb) - 1.0)
    pd = _split_params(params)

    # ---- first affine layer (input tangents are constant rows) ----
    w, b = pd[0]
    z = add(matmul(a, w), b)

    def _const_row(v):
        r = matmul(from_f64((v * scale)[None, :]), w)
        return DF(jnp.broadcast_to(r.hi, z.shape),
                  jnp.broadcast_to(r.lo, z.shape))

    z1 = _const_row(v1)
    z2 = _const_row(v2) if v2 is not None else None

    if len(pd) == 1:  # single linear layer (mirrors mlp.taylor_apply)
        zero = DF(jnp.zeros_like(z.hi), jnp.zeros_like(z.lo))
        return TaylorOutDF(value=z, d1=z1, d11=zero, d2=z2)

    one = const(1.0)
    t = tanh(z)
    sp = add(broadcast_to(one, t.shape), neg(mul(t, t)))   # 1 - t²
    a_ = t
    a1 = mul(sp, z1)
    spp = mul(mul(const(-2.0), t), sp)                     # -2 t (1-t²)
    a11 = mul(mul(spp, z1), z1)                            # z11 == 0 here
    a2 = mul(sp, z2) if z2 is not None else None

    # ---- remaining hidden layers (scan over depth when homogeneous:
    # keeps the traced graph O(1) in layer count, see matmul) ----
    def hidden(carry, wb):
        a_, a1, a11 = carry[:3]
        a2 = carry[3] if len(carry) == 4 else None
        w, b = wb
        z = add(matmul(a_, w), b)
        z1 = matmul(a1, w)
        z11 = matmul(a11, w)
        t = tanh(z)
        sp = add(broadcast_to(one, t.shape), neg(mul(t, t)))
        spp = mul(mul(const(-2.0), t), sp)
        out = (t, mul(sp, z1),
               add(mul(mul(spp, z1), z1), mul(sp, z11)))
        if a2 is not None:
            out = out + (mul(sp, matmul(a2, w)),)
        return out, None

    carry = (a_, a1, a11) + ((a2,) if a2 is not None else ())
    stacked = _stack_mids(pd)
    if stacked is not None:
        carry, _ = jax.lax.scan(hidden, carry, stacked)
    else:
        for wb in pd[1:-1]:
            carry, _ = hidden(carry, wb)
    a_, a1, a11 = carry[:3]
    a2 = carry[3] if len(carry) == 4 else None

    # ---- linear output layer ----
    w, b = pd[-1]
    return TaylorOutDF(value=add(matmul(a_, w), b),
                       d1=matmul(a1, w),
                       d11=matmul(a11, w),
                       d2=matmul(a2, w) if a2 is not None else None)


def _mse(x: DF) -> DF:
    """mean(x²) via compensated pairwise tree over the flattened array."""
    sq = mul(x, x)
    flat = DF(sq.hi.reshape(-1), sq.lo.reshape(-1))
    return div(sum_pairwise(flat, axis=0), const(float(flat.hi.shape[0])))


def _sse(x: DF) -> DF:
    """sum(x²) — the disc-IRK families' SSE contract (reference
    inf_disc_burgers.py:91-94 sums, it does not average)."""
    sq = mul(x, x)
    flat = DF(sq.hi.reshape(-1), sq.lo.reshape(-1))
    return sum_pairwise(flat, axis=0)


def make_schrodinger_loss_df32(lb, ub):
    """loss(params_f64, batch) -> f64 scalar, nonlinear Schrödinger
    continuous inference in df32 (reference
    1dcomplex-schrodinger/inf_cont_schrodinger.py:107-129; term
    structure mirrors pinn.problems.schrodinger.loss_terms).

    The S2 recipe is f64-refinement-dominated (RESULTS.md), so this is
    the family with the most wall-clock behind the emulated-f64 stage.
    """
    lb64 = np.asarray(lb, np.float64)
    ub64 = np.asarray(ub, np.float64)
    v1 = np.array([1.0, 0.0])
    v2 = np.array([0.0, 1.0])
    half = const(0.5)

    def col_mse(x: DF, ref: Optional[jnp.ndarray] = None) -> DF:
        d = x if ref is None else add(from_f64(ref), neg(x))
        return _mse(d)

    def loss_fn(params, batch):
        # Initial condition: per-column means (reference sums
        # mean(u err) + mean(v err), inf_cont_schrodinger.py:117-118).
        H0p = apply_df32(params, batch["X0"], lb64, ub64)
        mse_0 = add(col_mse(H0p[:, 0], batch["H0"][:, 0]),
                    col_mse(H0p[:, 1], batch["H0"][:, 1]))

        # Periodic BCs: value AND x-derivative matched across x=lb/ub.
        o_lo = taylor_apply_df32(params, batch["X_lb"], lb64, ub64, v1, v2)
        o_hi = taylor_apply_df32(params, batch["X_ub"], lb64, ub64, v1, v2)
        mse_b = add(add(col_mse(add(o_lo.value[:, 0], neg(o_hi.value[:, 0]))),
                        col_mse(add(o_lo.value[:, 1], neg(o_hi.value[:, 1])))),
                    add(col_mse(add(o_lo.d1[:, 0], neg(o_hi.d1[:, 0]))),
                        col_mse(add(o_lo.d1[:, 1], neg(o_hi.d1[:, 1])))))

        # PDE residual: f_u = u_t + .5 v_xx + (u²+v²) v,
        #               f_v = v_t - .5 u_xx - (u²+v²) u.
        out = taylor_apply_df32(params, batch["X_f"], lb64, ub64, v1, v2)
        u, v = out.value[:, 0], out.value[:, 1]
        u_xx, v_xx = out.d11[:, 0], out.d11[:, 1]
        u_t, v_t = out.d2[:, 0], out.d2[:, 1]
        h2 = add(mul(u, u), mul(v, v))
        f_u = add(u_t, add(mul(broadcast_to(half, v_xx.shape), v_xx),
                           mul(h2, v)))
        f_v = add(v_t, neg(add(mul(broadcast_to(half, u_xx.shape), u_xx),
                               mul(h2, u))))
        mse_f = add(_mse(f_u), _mse(f_v))
        return to_f64(add(mse_0, add(mse_b, mse_f)))

    return loss_fn


def _split_np(arr) -> DF:
    """Exact (hi, lo) split of a host-side f64 constant (no x64 config
    dependence — the split happens in numpy)."""
    a64 = np.asarray(arr, np.float64)
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def make_burgers_disc_inf_loss_df32(lb, ub, nu, dt, irk_weights):
    """loss(params_f64, batch) -> f64 scalar: discrete-IRK Burgers
    inference (SSE(t0 snapshot) + SSE(Dirichlet boundary), reference
    inf_disc_burgers.py:61-94) in df32 — the refinement-tail engine for
    the D1-style recipes.  The (N, q) @ (q, q+1) IRK coupling runs
    through the compensated scan matmul."""
    lb64 = np.asarray(lb, np.float64)
    ub64 = np.asarray(ub, np.float64)
    w_T = _split_np(np.asarray(irk_weights).T)  # (q, q+1)
    v1 = np.array([1.0])
    nu_dd = const(float(nu))
    dt_dd = const(float(dt))

    def loss_fn(params, batch):
        out = taylor_apply_df32(params, batch["x_0"], lb64, ub64, v1)
        U1, U1_x, U1_xx = out.value, out.d1, out.d11
        U, U_x, U_xx = U1[:, :-1], U1_x[:, :-1], U1_xx[:, :-1]
        N = U * U_x - nu_dd * U_xx
        u0_pred = U1 + dt_dd * matmul(N, w_T)
        u1_bnd = apply_df32(params, batch["x_1"], lb64, ub64)
        return to_f64(_sse(u0_pred - from_f64(batch["u_0"]))
                      + _sse(u1_bnd))

    return loss_fn


def make_allencahn_disc_loss_df32(lb, ub, dt, irk_weights,
                                  diff=1e-4, react=5.0):
    """loss(params_f64, batch) -> f64 scalar: discrete-IRK Allen–Cahn
    inference (pinn.problems.allencahn.loss_disc_inference — SSE(t0
    snapshot) + SSE(periodic value gap) + SSE(periodic derivative gap))
    in df32.  F = react (U³ − U) − diff U_xx; the [1, 200x4, q+1] net's
    (N, q) @ (q, q+1) IRK coupling runs through the compensated scan
    matmul."""
    lb64 = np.asarray(lb, np.float64)
    ub64 = np.asarray(ub, np.float64)
    w_T = _split_np(np.asarray(irk_weights).T)  # (q, q+1)
    v1 = np.array([1.0])
    diff_dd = const(float(diff))
    react_dd = const(float(react))
    dt_dd = const(float(dt))

    def loss_fn(params, batch):
        out = taylor_apply_df32(params, batch["x_0"], lb64, ub64, v1)
        U1, U1_xx = out.value, out.d11
        U, U_xx = U1[:, :-1], U1_xx[:, :-1]
        F = react_dd * (U * U * U - U) - diff_dd * U_xx
        u0_pred = U1 + dt_dd * matmul(F, w_T)
        bnd = taylor_apply_df32(params, batch["x_bnd"], lb64, ub64, v1)
        gap_u = bnd.value[0] - bnd.value[1]
        gap_ux = bnd.d1[0] - bnd.d1[1]
        return to_f64(_sse(u0_pred - from_f64(batch["u_0"]))
                      + _sse(gap_u) + _sse(gap_ux))

    return loss_fn


def make_burgers_disc_ide_loss_df32(lb, ub, dt, irk_alpha, irk_beta):
    """loss(IdeParams_f64, batch) -> f64 scalar: discrete-IRK Burgers
    identification across two snapshots (reference
    ide_disc_burgers.py:81-108) in df32.  λ1 is a raw f64 trainable;
    λ2 = exp(log_λ2) is taken in f64 (one scalar) and split exactly."""
    lb64 = np.asarray(lb, np.float64)
    ub64 = np.asarray(ub, np.float64)
    alpha_T = _split_np(np.asarray(irk_alpha).T)
    bma_T = _split_np((np.asarray(irk_beta) - np.asarray(irk_alpha)).T)
    v1 = np.array([1.0])
    dt_dd = const(float(dt))

    def stage_maps(params, x, l1, l2):
        out = taylor_apply_df32(params.net, x, lb64, ub64, v1)
        U, U_x, U_xx = out.value, out.d1, out.d11
        N = l1 * (U * U_x) - l2 * U_xx
        U_0 = U + dt_dd * matmul(N, alpha_T)
        U_1 = U + dt_dd * matmul(-N, bma_T)
        return U_0, U_1

    def loss_fn(params, batch):
        l1 = from_f64(params.lambda1)
        l2 = from_f64(jnp.exp(params.log_lambda2))
        U_0_pred, _ = stage_maps(params, batch["x_0"], l1, l2)
        _, U_1_pred = stage_maps(params, batch["x_1"], l1, l2)
        return to_f64(_sse(U_0_pred - from_f64(batch["u_0"]))
                      + _sse(U_1_pred - from_f64(batch["u_1"])))

    return loss_fn


class NSStreamsDF(NamedTuple):
    """df32 mirror of pinn.problems.navierstokes.NSStreams."""

    v: DF
    x: DF
    y: DF
    t: DF
    xx: DF
    xy: DF
    yy: DF
    xt: DF
    yt: DF
    xxx: DF
    xxy: DF
    xyy: DF
    yyy: DF


def ns_taylor_apply_df32(params, X, lb, ub) -> NSStreamsDF:
    """The 13 Navier–Stokes mixed-partial streams (value; x y t; xx xy
    yy xt yt; xxx xxy xyy yyy) in df32 — the same multivariate
    Faà-di-Bruno recurrence as pinn.problems.navierstokes.ns_taylor_apply
    with every value a compensated (hi, lo) pair.

    Why: the NS identification recipe's f64 warm-start tail is 8k
    emulated-f64 iterations over these 13 streams and dominates the
    family's wall-clock (RESULTS.md NS rows); df32 runs the same
    extended-precision refinement on the VPU at a fraction of the
    emulator's cost, buying the λ1 tail many more iterations."""
    scale = 2.0 / (ub - lb)
    a = from_f64(2.0 * (X - lb) / (ub - lb) - 1.0)
    pd = _split_params(params)

    # ---- first affine layer: constant tangent rows per coordinate ----
    w, b = pd[0]
    z = add(matmul(a, w), b)

    def _const_row(i):
        # scale[i] * w[i, :] as an exact df32 product of the split w row
        row = mul(DF(w.hi[i], w.lo[i]), const(float(scale[i])))
        return DF(jnp.broadcast_to(row.hi, z.shape),
                  jnp.broadcast_to(row.lo, z.shape))

    zx, zy, zt = _const_row(0), _const_row(1), _const_row(2)

    if len(pd) == 1:  # single linear layer: all curvature is zero
        zero = DF(jnp.zeros_like(z.hi), jnp.zeros_like(z.lo))
        return NSStreamsDF(z, zx, zy, zt, *([zero] * 9))

    t = tanh(z)
    sp = 1.0 - t * t
    spp = -2.0 * t * sp
    sppp = -2.0 * sp * (1.0 - 3.0 * t * t)
    st = (t, sp * zx, sp * zy, sp * zt,
          spp * zx * zx, spp * zx * zy, spp * zy * zy,
          spp * zx * zt, spp * zy * zt,
          sppp * zx * zx * zx, sppp * zx * zx * zy,
          sppp * zx * zy * zy, sppp * zy * zy * zy)

    def hidden(carry, wb):
        (a_, ax, ay, at, axx, axy, ayy, axt, ayt,
         axxx, axxy, axyy, ayyy) = carry
        w, b = wb
        z = add(matmul(a_, w), b)
        zx, zy, zt = matmul(ax, w), matmul(ay, w), matmul(at, w)
        zxx, zxy, zyy = matmul(axx, w), matmul(axy, w), matmul(ayy, w)
        zxt, zyt = matmul(axt, w), matmul(ayt, w)
        zxxx, zxxy = matmul(axxx, w), matmul(axxy, w)
        zxyy, zyyy = matmul(axyy, w), matmul(ayyy, w)

        t = tanh(z)
        sp = 1.0 - t * t
        spp = -2.0 * t * sp
        sppp = -2.0 * sp * (1.0 - 3.0 * t * t)
        return (t, sp * zx, sp * zy, sp * zt,
                spp * zx * zx + sp * zxx,
                spp * zx * zy + sp * zxy,
                spp * zy * zy + sp * zyy,
                spp * zx * zt + sp * zxt,
                spp * zy * zt + sp * zyt,
                sppp * zx * zx * zx + 3.0 * (spp * zx * zxx) + sp * zxxx,
                sppp * zx * zx * zy
                + spp * (zxx * zy + 2.0 * (zxy * zx)) + sp * zxxy,
                sppp * zx * zy * zy
                + spp * (zyy * zx + 2.0 * (zxy * zy)) + sp * zxyy,
                sppp * zy * zy * zy + 3.0 * (spp * zy * zyy) + sp * zyyy,
                ), None

    stacked = _stack_mids(pd)
    if stacked is not None:
        st, _ = jax.lax.scan(hidden, st, stacked)
    else:
        for wb in pd[1:-1]:
            st, _ = hidden(st, wb)

    w, b = pd[-1]
    return NSStreamsDF(add(matmul(st[0], w), b),
                       *(matmul(s, w) for s in st[1:]))


def make_ns_ide_loss_df32(lb, ub):
    """loss(NSIdeParams_f64, batch) -> f64 scalar: the Navier–Stokes
    identification loss (pinn.problems.navierstokes.loss_identification
    — MSE(u) + MSE(v) + MSE(f_u) + MSE(f_v)) evaluated in df32.

    λ1/λ2 stay f64 trainables; their df32 splits are exact and the
    outer jax.grad flows through the hi words (from_f64)."""
    lb64 = np.asarray(lb, np.float64)
    ub64 = np.asarray(ub, np.float64)

    def psi(st: DF) -> DF:
        return st[:, 0:1]

    def residuals(params, X):
        s = ns_taylor_apply_df32(params.net, X, lb64, ub64)
        u, v = psi(s.y), -psi(s.x)
        u_t, u_x, u_y = psi(s.yt), psi(s.xy), psi(s.yy)
        u_xx, u_yy = psi(s.xxy), psi(s.yyy)
        v_t, v_x, v_y = -psi(s.xt), -psi(s.xx), -psi(s.xy)
        v_xx, v_yy = -psi(s.xxx), -psi(s.xyy)
        p_x, p_y = s.x[:, 1:2], s.y[:, 1:2]
        l1 = from_f64(params.lambda1)
        l2 = from_f64(params.lambda2)
        f_u = u_t + l1 * (u * u_x + v * u_y) + p_x - l2 * (u_xx + u_yy)
        f_v = v_t + l1 * (u * v_x + v * v_y) + p_y - l2 * (v_xx + v_yy)
        return u, v, f_u, f_v

    def loss_fn(params, batch):
        u, v, f_u, f_v = residuals(params, batch["X"])
        if batch.get("X_f") is not None:
            # Separate residual collocation set (mirrors the optional
            # X_f of pinn.problems.navierstokes.loss_identification).
            _, _, f_u, f_v = residuals(params, batch["X_f"])
        total = (_mse(from_f64(batch["u"]) - u)
                 + _mse(from_f64(batch["v"]) - v)
                 + _mse(f_u) + _mse(f_v))
        return to_f64(total)

    return loss_fn


def make_burgers_loss_df32(lb, ub, nu):
    """loss(params_f64, batch) -> f64 scalar, Burgers continuous
    inference (MSE(data) + MSE(u_t + u u_x - nu u_xx)) evaluated in
    df32 — the TPU-native replacement for the recipes' emulated-f64
    refinement stage (reference 1d-burgers/inf_cont_burgers.py:59-90).

    Unsharded by design: refinement stages run single-chip (the mixed
    stage owns the throughput story; RESULTS.md)."""
    lb64 = np.asarray(lb, np.float64)
    ub64 = np.asarray(ub, np.float64)
    v1 = np.array([1.0, 0.0])
    v2 = np.array([0.0, 1.0])
    nu_dd = const(float(nu))

    def loss_fn(params, batch):
        out = taylor_apply_df32(params, batch["X_f"], lb64, ub64, v1, v2)
        # f = u_t + u u_x - nu u_xx
        f = add(out.d2, add(mul(out.value, out.d1),
                            neg(mul(broadcast_to(nu_dd, out.d11.shape),
                                    out.d11))))
        u_pred = apply_df32(params, batch["X_u"], lb64, ub64)
        mse_u = _mse(add(from_f64(batch["u"]), neg(u_pred)))
        return to_f64(add(mse_u, _mse(f)))

    return loss_fn
