"""L-BFGS as a jitted fixed-shape ``lax.while_loop`` program.

Behavior parity target: the reference's eager two-loop-recursion
L-BFGS without line search (reference utils/custom_lbfgs.py, itself a
port of Torch's lbfgs.lua): curvature-guarded (s, y) memory
(``y·s > 1e-10``), initial-Hessian scaling ``H0 = y·s / y·y``, step
size ``t = min(1, 1 / Σ|g|)`` on the first iteration then the fixed
``learningRate``, and stopping rules on Σ|g| ≤ tolFun, Σ|t·d| ≤ tolX,
|f − f_old| < tolX, gᵀd > −tolX, and a maxEval budget.

TPU-first re-design: the reference mutates Python lists of tensors in
an eager loop (one kernel launch per dot product).  Here the history is
a pair of fixed-shape ``(m, P)`` ring buffers and the whole optimizer
is a single compiled ``lax.while_loop``; the two-loop recursion is a
``lax.fori_loop`` over the static memory depth with masked
contributions for unfilled slots.  One XLA program advances K
iterations (K = the logger frequency) and returns a loss history
buffer, so the host loop logs between chunks without host callbacks.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Termination reason codes (state.reason)
RUNNING = 0
MAX_ITER = 1
GRAD_TOL = 2        # sum|g| <= tolFun
STEP_TOL = 3        # sum|t*d| <= tolX
F_TOL = 4           # |f - f_old| < tolX
NO_PROGRESS = 5     # g·d > -tolX
MAX_EVAL = 6
NON_FINITE = 7      # loss became NaN/inf (divergence guard; not in the reference)

REASON_NAMES = {
    RUNNING: "running",
    MAX_ITER: "max iterations reached",
    GRAD_TOL: "optimality condition below tolFun",
    STEP_TOL: "step size below tolX",
    F_TOL: "function value changing less than tolX",
    NO_PROGRESS: "can not make progress along direction",
    MAX_EVAL: "max nb of function evals",
    NON_FINITE: "loss non-finite — diverged; kept last finite iterate",
}


class LbfgsConfig(NamedTuple):
    """Mirrors the reference's nt_config Struct (utils/neuralnetwork.py:13-17)."""

    learning_rate: float = 1.0
    max_iter: int = 100
    n_correction: int = 50
    tol_fun: float = float(np.finfo(np.float64).eps)
    tol_x: float = 1e-19
    max_eval: int = 0  # 0 -> 1.25 * max_iter, as in the reference
    # "none": the reference's fixed-step rule (custom_lbfgs.py has no
    # line search).  "armijo": backtracking sufficient-decrease search —
    # the fixed step diverges beyond a few hundred iterations on PINN
    # losses, so the long-run configurations use this (the Raissi paper
    # itself relied on a line-searched L-BFGS).  "wolfe": weak-Wolfe
    # bisection (Armijo + curvature g(t)·d ≥ c2·g·d) — guarantees
    # y·s > 0 so every iteration yields a usable curvature pair; this is
    # the closest match to the scipy L-BFGS-B the original Raissi code
    # used, and the recommended setting for convergence-grade runs.
    line_search: str = "none"
    ls_c1: float = 1e-4          # Armijo sufficient-decrease constant
    ls_c2: float = 0.9           # Wolfe curvature constant
    ls_backtracks: int = 25      # max step trials per iteration
    # On a non-descent direction (g·d > -tolX) the reference stops; with
    # restart=True the history is cleared and the next iteration retries
    # from steepest descent, stopping only if that also fails.
    restart: bool = False
    # Search-direction implementation.  "scan": the literal two-loop
    # recursion (4m sequential P-length dots — bit-stable vs the
    # reference trajectory A/B).  "matrix": the same recursion solved in
    # matrix form (one (m,P)@(P,m) Gram matmul + two m-size unit-
    # triangular solves + four matvecs) — algebraically identical,
    # MXU-shaped, ~10 device ops instead of ~4m; floating-point
    # summation order differs at machine epsilon.
    dir_impl: str = "scan"

    def resolved_max_eval(self) -> int:
        if self.max_eval:
            return self.max_eval
        if self.line_search == "none":
            return int(self.max_iter * 1.25)
        return self.max_iter * (self.ls_backtracks + 2)


class LbfgsState(NamedTuple):
    x: jnp.ndarray          # (P,) iterate
    f: jnp.ndarray          # () loss at x
    g: jnp.ndarray          # (P,) gradient at x
    d: jnp.ndarray          # (P,) last search direction
    t: jnp.ndarray          # () last step size
    f_old: jnp.ndarray      # () previous loss
    g_old: jnp.ndarray      # (P,) previous gradient
    S: jnp.ndarray          # (m, P) step history ring (s = t*d)
    Y: jnp.ndarray          # (m, P) gradient-difference ring
    hdiag: jnp.ndarray      # () initial Hessian scale
    k: jnp.ndarray          # () int32, filled history length (<= m)
    head: jnp.ndarray       # () int32, ring insert position
    n_iter: jnp.ndarray     # () int32, global iteration counter
    n_evals: jnp.ndarray    # () int32, function evaluations so far
    reason: jnp.ndarray     # () int32, RUNNING or a termination code


# opfunc(w, batch) -> (f, g): the batch pytree is threaded explicitly so
# data arrays are jit arguments, not closure constants (see adam.py note).
OpFunc = Callable[[jnp.ndarray, Any], Tuple[jnp.ndarray, jnp.ndarray]]


def lbfgs_init(opfunc: OpFunc, x0: jnp.ndarray, config: LbfgsConfig,
               batch: Any = None) -> LbfgsState:
    """Evaluate f, g at x0 and build the zeroed fixed-shape state."""
    f0, g0 = opfunc(x0, batch)
    m = config.n_correction
    p = x0.shape[0]
    dt = x0.dtype
    zero = jnp.zeros((), dt)
    # Initial-point optimality check (reference custom_lbfgs.py:73-76).
    reason = jnp.where(jnp.sum(jnp.abs(g0)) <= config.tol_fun,
                       jnp.int32(GRAD_TOL), jnp.int32(RUNNING))
    return LbfgsState(
        x=x0, f=f0, g=g0,
        d=jnp.zeros((p,), dt), t=zero,
        f_old=f0, g_old=g0,
        S=jnp.zeros((m, p), dt), Y=jnp.zeros((m, p), dt),
        hdiag=jnp.ones((), dt),
        k=jnp.int32(0), head=jnp.int32(0),
        n_iter=jnp.int32(0), n_evals=jnp.int32(1),
        reason=reason,
    )


def _two_loop(g, S, Y, k, head, hdiag, m):
    """Two-loop recursion over the ring buffer with masked unfilled slots.

    Slot ages: logical index j in [0, k) maps to ring row
    (head - k + j) mod m, oldest first.
    """
    def row(j):
        return (head - k + j) % m

    # rho_j = 1 / (y_j . s_j) for filled slots (guard against 0-div in
    # masked slots).
    q = -g

    def bwd_body(i, q):
        # i counts newest -> oldest: logical j = k - 1 - i
        j = k - 1 - i
        r = row(j)
        valid = i < k
        sj, yj = S[r], Y[r]
        rho = 1.0 / jnp.where(valid, jnp.vdot(yj, sj), 1.0)
        al = rho * jnp.vdot(sj, q)
        al = jnp.where(valid, al, 0.0)
        return q - al * yj * jnp.where(valid, 1.0, 0.0), al

    # We need the al coefficients again in the forward loop; carry them.
    def bwd_scan(carry, i):
        q = carry
        q, al = bwd_body(i, q)
        return q, al

    q, als = jax.lax.scan(bwd_scan, q, jnp.arange(m))
    r_vec = q * hdiag

    def fwd_body(i, r_vec):
        # i counts oldest -> newest: logical j = i, but als was recorded
        # newest-first: als[k-1-j]
        j = i
        rr = row(j)
        valid = i < k
        sj, yj = S[rr], Y[rr]
        rho = 1.0 / jnp.where(valid, jnp.vdot(yj, sj), 1.0)
        be = rho * jnp.vdot(yj, r_vec)
        al = als[k - 1 - j]
        upd = (al - be) * sj
        return r_vec + jnp.where(valid, 1.0, 0.0) * upd

    r_vec = jax.lax.fori_loop(0, m, fwd_body, r_vec)
    return r_vec


def _two_loop_matrix(g, S, Y, k, head, hdiag, m):
    """The two-loop recursion in matrix form — algebraically identical
    direction, restructured for the MXU.

    Unrolling the backward loop (newest-to-oldest) gives, in
    oldest-first logical order with Gram matrix ``G[a, b] = s_a·y_b``:

        (I + R·triu(G, 1)) α = R·S(−g),      R = diag(ρ), ρ_a = 1/G[a,a]

    a unit-UPPER-triangular m×m system (each α depends only on newer
    α's).  The forward loop similarly becomes a unit-LOWER system for
    β with the strict lower triangle of ``Gᵀ`` (y_a·s_b, b < a):

        (I + R·tril(Gᵀ,−1)) β = R·(Y r₀ + tril(Gᵀ,−1) α)

    and the direction is ``r = r₀ + (α − β)ᵀ S`` with
    ``r₀ = hdiag·(−g − αᵀ Y)``.  Invalid (unfilled) slots get ρ = 0,
    which zeroes their α/β rows exactly as the scan's masking does.
    One (m,P)@(P,m) matmul + 2 triangular solves + 4 matvecs replace
    4m sequential P-length dots — the scan's per-op dispatch latency
    was the L-BFGS throughput ceiling at small P (BENCH r1-r3: flat
    ~1.9k iters/s while the fused Adam step ran 3.7k/s).
    """
    dt = g.dtype
    rows = (head - k + jnp.arange(m)) % m      # logical oldest-first
    Sl = jnp.take(S, rows, axis=0)
    Yl = jnp.take(Y, rows, axis=0)
    valid = jnp.arange(m) < k
    G = Sl @ Yl.T                               # G[a, b] = s_a · y_b
    diag = jnp.diagonal(G)
    rho = jnp.where(valid, 1.0 / jnp.where(valid, diag, 1.0),
                    jnp.zeros((), dt))
    eye = jnp.eye(m, dtype=dt)

    A = eye + rho[:, None] * jnp.triu(G, 1)
    alpha = jax.scipy.linalg.solve_triangular(
        A, rho * (Sl @ (-g)), lower=False, unit_diagonal=True)

    r0 = hdiag * (-g - alpha @ Yl)
    Lm = jnp.tril(G.T, -1)                      # y_a · s_b for b < a
    B = eye + rho[:, None] * Lm
    beta = jax.scipy.linalg.solve_triangular(
        B, rho * (Yl @ r0 + Lm @ alpha), lower=True, unit_diagonal=True)
    return r0 + (alpha - beta) @ Sl


def _direction(config: LbfgsConfig, g, S, Y, k, head, hdiag, m):
    if config.dir_impl == "matrix":
        return _two_loop_matrix(g, S, Y, k, head, hdiag, m)
    if config.dir_impl != "scan":
        raise ValueError(f"unknown dir_impl {config.dir_impl!r}")
    return _two_loop(g, S, Y, k, head, hdiag, m)


def _step(opfunc: OpFunc, config: LbfgsConfig, state: LbfgsState,
          batch: Any, lossfunc=None) -> LbfgsState:
    if lossfunc is None:
        def lossfunc(w, b):
            return opfunc(w, b)[0]
    m = config.n_correction
    dt = state.x.dtype
    first = state.n_iter == 0

    # ---- memory update (skipped on the first iteration) ----
    y = state.g - state.g_old
    s = state.d * state.t
    ys = jnp.vdot(y, s)
    do_update = jnp.logical_and(jnp.logical_not(first), ys > 1e-10)

    S = jnp.where(do_update, state.S.at[state.head].set(s), state.S)
    Y = jnp.where(do_update, state.Y.at[state.head].set(y), state.Y)
    head = jnp.where(do_update, (state.head + 1) % m, state.head)
    k = jnp.where(do_update, jnp.minimum(state.k + 1, m), state.k)
    hdiag = jnp.where(do_update, ys / jnp.vdot(y, y), state.hdiag)

    # ---- search direction ----
    d = jnp.where(first, -state.g,
                  _direction(config, state.g, S, Y, k, head, hdiag, m))

    gtd = jnp.vdot(state.g, d)
    no_progress = gtd > -config.tol_x
    soft_restart = jnp.logical_and(
        no_progress, jnp.logical_and(bool(config.restart), k > 0))

    # ---- step size ----
    # Each search returns (t, f_new, g_new, ls_evals, ls_fail); the
    # whole thing is skipped (lax.cond below) when the direction already
    # failed the descent check — the step would be discarded by keep_old
    # anyway, so evaluating trials along it is wasted device work.
    g_abs_sum = jnp.sum(jnp.abs(state.g))
    t0 = jnp.where(first,
                   jnp.minimum(jnp.asarray(1.0, dt), 1.0 / g_abs_sum),
                   jnp.asarray(1.0, dt))
    c1 = jnp.asarray(config.ls_c1, dt)

    if config.line_search == "none":
        def search(_):
            # Reference rule (custom_lbfgs.py:159-163): damped first
            # step, then the fixed learning rate.
            t = jnp.where(first,
                          jnp.minimum(jnp.asarray(1.0, dt), 1.0 / g_abs_sum),
                          jnp.asarray(config.learning_rate, dt))
            f_new, g_new = opfunc(state.x + t * d, batch)
            return t, f_new, g_new, jnp.int32(1), jnp.bool_(False)
    elif config.line_search == "armijo":
        def search(_):
            # Backtracking from the natural quasi-Newton step t=1 until
            # the sufficient-decrease condition f(x+td) <= f + c1 t g·d
            # holds.  The common case (t0 accepted) costs one
            # value-and-grad eval; rejected trials use loss-only
            # evaluations (no wasted backward passes) with a single grad
            # eval at the accepted step.
            f_t0, g_t0 = opfunc(state.x + t0 * d, batch)

            def accept_t0(_):
                return t0, f_t0, g_t0, jnp.int32(1)

            def backtrack(_):
                def ls_cond(carry):
                    t, f_t, it = carry
                    armijo_ok = f_t <= state.f + c1 * t * gtd
                    return jnp.logical_and(jnp.logical_not(armijo_ok),
                                           it < config.ls_backtracks)

                def ls_body(carry):
                    t, _, it = carry
                    t = t * 0.5
                    return t, lossfunc(state.x + t * d, batch), it + 1

                t, _, n_ls = jax.lax.while_loop(
                    ls_cond, ls_body, (t0, f_t0, jnp.int32(0)))
                f_acc, g_acc = opfunc(state.x + t * d, batch)
                return t, f_acc, g_acc, n_ls + 2

            t, f_new, g_new, ls_evals = jax.lax.cond(
                f_t0 <= state.f + c1 * t0 * gtd, accept_t0, backtrack, None)
            # Backtracking exhausted without sufficient decrease:
            # no progress (keep the old iterate).
            fail = f_new > state.f + c1 * t * gtd
            return t, f_new, g_new, ls_evals, fail
    elif config.line_search == "wolfe":
        def search(_):
            # Weak-Wolfe bisection (Lewis–Overton): maintain a bracket
            # [lo, hi]; shrink toward lo when sufficient decrease fails,
            # advance/bisect when curvature fails.  Terminates with
            # y·s = t·(g_new − g)·d ≥ (c2 − 1)·t·gtd > 0, so every
            # accepted step produces a valid curvature pair — the
            # property Armijo backtracking lacks and the reason
            # scipy-style L-BFGS converges deeper on PINN losses.
            c2 = jnp.asarray(config.ls_c2, dt)
            inf = jnp.asarray(jnp.inf, dt)
            f_t0, g_t0 = opfunc(state.x + t0 * d, batch)

            def ws_cond(carry):
                t, f_t, g_t, lo, hi, n, ok = carry
                return jnp.logical_and(jnp.logical_not(ok),
                                       n < config.ls_backtracks)

            def ws_body(carry):
                t, f_t, g_t, lo, hi, n, _ = carry
                armijo = f_t <= state.f + c1 * t * gtd
                curv = jnp.vdot(g_t, d) >= c2 * gtd
                ok = jnp.logical_and(armijo, curv)

                def keep(_):
                    return t, f_t, g_t, lo, hi, n, jnp.bool_(True)

                def refine(_):
                    hi_n = jnp.where(armijo, hi, t)
                    lo_n = jnp.where(armijo, t, lo)
                    t_n = jnp.where(
                        jnp.isinf(hi_n), 2.0 * lo_n, 0.5 * (lo_n + hi_n))
                    f_n, g_n = opfunc(state.x + t_n * d, batch)
                    return t_n, f_n, g_n, lo_n, hi_n, n + 1, jnp.bool_(False)

                return jax.lax.cond(ok, keep, refine, None)

            t, f_new, g_new, _, _, ls_evals, _ = jax.lax.while_loop(
                ws_cond, ws_body,
                (t0, f_t0, g_t0, jnp.zeros((), dt), inf, jnp.int32(1),
                 jnp.bool_(False)))
            # Budget exhausted: accept the final trial if it at least
            # decreases sufficiently (the memory-update curvature guard
            # rejects the pair if y·s ≤ 0); otherwise no progress.
            fail = f_new > state.f + c1 * t * gtd
            return t, f_new, g_new, ls_evals, fail
    else:
        raise ValueError(f"unknown line_search {config.line_search!r}")

    def skip(_):
        return (jnp.zeros((), dt), state.f, state.g, jnp.int32(0),
                jnp.bool_(False))

    t, f_new, g_new, ls_evals, ls_fail = jax.lax.cond(
        no_progress, skip, search, None)
    x_new = state.x + t * d
    no_progress = jnp.logical_or(no_progress, ls_fail)

    # ---- convergence checks on the new point ----
    n_evals = state.n_evals + ls_evals
    reason = jnp.int32(RUNNING)
    reason = jnp.where(jnp.abs(f_new - state.f) < config.tol_x,
                       jnp.int32(F_TOL), reason)
    reason = jnp.where(jnp.sum(jnp.abs(t * d)) <= config.tol_x,
                       jnp.int32(STEP_TOL), reason)
    reason = jnp.where(jnp.sum(jnp.abs(g_new)) <= config.tol_fun,
                       jnp.int32(GRAD_TOL), reason)
    reason = jnp.where(n_evals >= config.resolved_max_eval(),
                       jnp.int32(MAX_EVAL), reason)
    non_finite = jnp.logical_not(jnp.isfinite(f_new))
    reason = jnp.where(non_finite, jnp.int32(NON_FINITE), reason)
    reason = jnp.where(no_progress, jnp.int32(NO_PROGRESS), reason)
    # Soft restart: stay RUNNING with cleared history.
    reason = jnp.where(soft_restart, jnp.int32(RUNNING), reason)

    new_state = LbfgsState(
        x=x_new, f=f_new, g=g_new, d=d, t=t,
        f_old=state.f, g_old=state.g,
        S=S, Y=Y, hdiag=hdiag,
        k=jnp.where(soft_restart, 0, k),
        head=jnp.where(soft_restart, 0, head),
        n_iter=state.n_iter + 1, n_evals=n_evals,
        reason=reason,
    )
    new_state = new_state._replace(
        hdiag=jnp.where(soft_restart, jnp.ones_like(hdiag), new_state.hdiag))

    # On no-progress the reference breaks BEFORE stepping; keep the old
    # iterate in that case.  Same treatment on divergence to NaN/inf
    # (guard added on top of the reference semantics).  The rejected
    # direction/step are zeroed so the NEXT iteration cannot pair
    # y = g - g_old (from the last real step) with s = t*d of a step
    # never taken — s = 0 makes ys = 0, which the curvature guard
    # rejects.
    def keep_old(ns: LbfgsState) -> LbfgsState:
        return ns._replace(x=state.x, f=state.f, g=state.g,
                           f_old=state.f_old, g_old=state.g_old,
                           d=jnp.zeros_like(ns.d), t=jnp.zeros_like(ns.t))

    return jax.lax.cond(jnp.logical_or(no_progress, non_finite),
                        keep_old, lambda ns: ns, new_state)


def make_lbfgs_run(opfunc: OpFunc, config: LbfgsConfig,
                   lossfunc: Callable[[jnp.ndarray, Any], jnp.ndarray] = None):
    """Build ``run(state, batch, n_steps) -> (state, f_hist)``, jitted.

    Advances up to ``n_steps`` iterations (stopping early if converged —
    remaining slots of ``f_hist`` are filled with the last loss).
    ``n_steps`` is static; the trainer calls this in logger-frequency
    chunks.
    """

    if lossfunc is None:
        def lossfunc(w, batch):
            return opfunc(w, batch)[0]

    @partial(jax.jit, static_argnums=2)
    def run(state: LbfgsState, batch: Any, n_steps: int):
        f_hist = jnp.full((n_steps,), state.f, dtype=state.f.dtype)

        def cond(carry):
            i, st, _ = carry
            return jnp.logical_and(i < n_steps, st.reason == RUNNING)

        def body(carry):
            i, st, hist = carry
            st = _step(opfunc, config, st, batch, lossfunc)
            hist = jax.lax.dynamic_update_index_in_dim(hist, st.f, i, 0)
            return i + 1, st, hist

        i, state, f_hist = jax.lax.while_loop(cond, body, (jnp.int32(0), state, f_hist))
        # Back-fill unreached slots with the final loss for clean logging.
        idx = jnp.arange(n_steps)
        f_hist = jnp.where(idx < i, f_hist, state.f)
        return state, f_hist

    return run


def minimize(opfunc: OpFunc, x0: jnp.ndarray, config: LbfgsConfig,
             batch: Any = None, log_fn=None, log_frequency: int = 10):
    """Convenience driver: full optimization with host-side logging.

    ``log_fn(iteration, loss)`` is called every ``log_frequency``
    iterations from the host, between jitted chunks (the reference logs
    from inside its eager loop, custom_lbfgs.py:217-221).
    Returns the final state.
    """
    if config.max_iter == 0:
        return lbfgs_init(opfunc, x0, config, batch)
    state = lbfgs_init(opfunc, x0, config, batch)
    run = make_lbfgs_run(opfunc, config)
    done = 0
    while done < config.max_iter and int(state.reason) == RUNNING:
        chunk = min(log_frequency, config.max_iter - done)
        state, f_hist = run(state, batch, chunk)
        done += chunk
        if log_fn is not None:
            log_fn(done, float(f_hist[-1]))
    return state
