"""L-BFGS convergence tests (SURVEY.md §4: quadratic/Rosenbrock oracles)."""

import jax
import jax.numpy as jnp
import numpy as np

from pinn.optim import lbfgs as lb


def quad_opfunc(dim=20, seed=0, dtype=jnp.float64):
    rng = np.random.RandomState(seed)
    A = rng.randn(dim, dim)
    A = A @ A.T + dim * np.eye(dim)
    b = rng.randn(dim)
    A = jnp.asarray(A, dtype)
    bb = jnp.asarray(b, dtype)

    def opfunc(x, batch=None):
        f = 0.5 * x @ A @ x - bb @ x
        return f, A @ x - bb

    x_star = jnp.linalg.solve(A, bb)
    return opfunc, x_star


def test_quadratic_convergence():
    opfunc, x_star = quad_opfunc()
    config = lb.LbfgsConfig(learning_rate=1.0, max_iter=100, n_correction=10)
    state = lb.minimize(opfunc, jnp.zeros_like(x_star), config)
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(x_star),
                               rtol=1e-6, atol=1e-8)


def test_rosenbrock_descends():
    def opfunc(x, batch=None):
        f = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
        return f, jax.grad(lambda z: 100.0 * (z[1] - z[0] ** 2) ** 2
                           + (1 - z[0]) ** 2)(x)

    x0 = jnp.array([-1.2, 1.0], dtype=jnp.float64)
    config = lb.LbfgsConfig(learning_rate=0.3, max_iter=400, n_correction=20)
    state = lb.minimize(opfunc, x0, config)
    f0 = float(opfunc(x0)[0])
    assert float(state.f) < 1e-2 * f0


def test_history_depth_exceeded():
    """More iterations than memory slots: ring must wrap without NaNs."""
    opfunc, x_star = quad_opfunc(dim=30, seed=1)
    config = lb.LbfgsConfig(learning_rate=1.0, max_iter=60, n_correction=3)
    state = lb.minimize(opfunc, jnp.zeros_like(x_star), config)
    assert np.isfinite(float(state.f))
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(x_star),
                               rtol=1e-4, atol=1e-6)


def test_first_step_size_rule():
    """First step must be t = min(1, 1/sum|g|), then t = learning_rate."""
    opfunc, _ = quad_opfunc(dim=5, seed=2)
    x0 = jnp.zeros(5, dtype=jnp.float64)
    config = lb.LbfgsConfig(learning_rate=0.5, max_iter=3, n_correction=5)
    state = lb.lbfgs_init(opfunc, x0, config)
    run = lb.make_lbfgs_run(opfunc, config)
    g0_sum = float(jnp.sum(jnp.abs(state.g)))
    state, _ = run(state, None, 1)
    expected_t = min(1.0, 1.0 / g0_sum)
    np.testing.assert_allclose(float(state.t), expected_t, rtol=1e-12)
    state, _ = run(state, None, 1)
    np.testing.assert_allclose(float(state.t), 0.5, rtol=1e-12)


def test_early_stop_on_converged_start():
    """Starting at the optimum: initial-point optimality check fires."""
    opfunc, x_star = quad_opfunc(dim=5, seed=3)
    config = lb.LbfgsConfig(max_iter=10, n_correction=5, tol_fun=1e-8)
    state = lb.minimize(opfunc, x_star, config)
    assert int(state.reason) == lb.GRAD_TOL
    assert int(state.n_iter) == 0


def test_max_iter_zero_noop():
    opfunc, _ = quad_opfunc(dim=4, seed=4)
    x0 = jnp.ones(4, dtype=jnp.float64)
    config = lb.LbfgsConfig(max_iter=0)
    state = lb.minimize(opfunc, x0, config)
    np.testing.assert_array_equal(np.asarray(state.x), np.asarray(x0))


def test_f_hist_monotone_logging():
    """Chunked run returns a per-iteration loss history."""
    opfunc, _ = quad_opfunc(dim=10, seed=5)
    config = lb.LbfgsConfig(learning_rate=1.0, max_iter=20, n_correction=10)
    state = lb.lbfgs_init(opfunc, jnp.zeros(10, dtype=jnp.float64), config)
    run = lb.make_lbfgs_run(opfunc, config)
    state, hist = run(state, None, 10)
    hist = np.asarray(hist)
    assert hist.shape == (10,)
    assert hist[-1] <= hist[0]
    assert np.isfinite(hist).all()


def test_armijo_line_search_rosenbrock_converges():
    """With backtracking the fixed-step divergence mode disappears and
    Rosenbrock converges to the optimum."""
    def opfunc(x, batch=None):
        f = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
        return f, jax.grad(lambda z: 100.0 * (z[1] - z[0] ** 2) ** 2
                           + (1 - z[0]) ** 2)(x)

    x0 = jnp.array([-1.2, 1.0], dtype=jnp.float64)
    config = lb.LbfgsConfig(max_iter=200, n_correction=20,
                            line_search="armijo")
    state = lb.minimize(opfunc, x0, config)
    np.testing.assert_allclose(np.asarray(state.x), [1.0, 1.0], atol=1e-5)


def test_armijo_monotone_descent():
    """Armijo guarantees f never increases across iterations."""
    opfunc, _ = quad_opfunc(dim=15, seed=7)
    config = lb.LbfgsConfig(max_iter=30, n_correction=10,
                            line_search="armijo")
    state = lb.lbfgs_init(opfunc, jnp.ones(15, dtype=jnp.float64), config)
    run = lb.make_lbfgs_run(opfunc, config)
    prev = float(state.f)
    for _ in range(6):
        state, hist = run(state, None, 5)
        cur = float(state.f)
        assert cur <= prev + 1e-12
        prev = cur


def test_soft_restart_continues_after_bad_direction():
    """With restart=True a manufactured non-descent event clears the
    history and continues; without it the optimizer stops."""
    opfunc, x_star = quad_opfunc(dim=10, seed=9)

    def run_with(restart):
        config = lb.LbfgsConfig(max_iter=60, n_correction=5,
                                line_search="armijo", restart=restart)
        state = lb.lbfgs_init(opfunc, jnp.ones(10, dtype=jnp.float64),
                              config)
        # Poison the history with a garbage (s, y) pair that produces an
        # ascent direction.
        S = state.S.at[0].set(jnp.ones(10))
        Y = state.Y.at[0].set(-jnp.ones(10))
        state = state._replace(S=S, Y=Y, k=jnp.int32(1), head=jnp.int32(1),
                               n_iter=jnp.int32(1))
        run = lb.make_lbfgs_run(opfunc, config)
        return run(state, None, 50)[0]

    stopped = run_with(False)
    recovered = run_with(True)
    assert int(stopped.reason) == lb.NO_PROGRESS
    assert float(recovered.f) < float(stopped.f)
    np.testing.assert_allclose(np.asarray(recovered.x), np.asarray(x_star),
                               rtol=1e-5, atol=1e-7)


def test_soft_restart_discards_rejected_direction_pair():
    """After a soft restart the next memory update must NOT pair the
    real gradient change with the rejected direction: s is zeroed, so
    the curvature guard rejects the insert and history stays empty
    until a genuine step is taken."""
    opfunc, _ = quad_opfunc(dim=6, seed=11)
    config = lb.LbfgsConfig(max_iter=3, n_correction=4,
                            line_search="armijo", restart=True)
    x0 = jnp.ones(6, dtype=jnp.float64)
    state = lb.lbfgs_init(opfunc, x0, config)
    # Manufacture: one real step happened (g != g_old), then a poisoned
    # history produced an ascent direction.
    f1, g1 = opfunc(x0 * 0.9)
    state = state._replace(
        x=x0 * 0.9, f=f1, g=g1,           # current point after a real step
        g_old=state.g, f_old=state.f,     # previous gradient differs
        S=state.S.at[0].set(jnp.ones(6)),
        Y=state.Y.at[0].set(-jnp.ones(6)),
        k=jnp.int32(1), head=jnp.int32(1), n_iter=jnp.int32(1))
    run = lb.make_lbfgs_run(opfunc, config)
    state, _ = run(state, None, 1)   # restart fires, d/t zeroed
    assert int(state.k) == 0
    np.testing.assert_array_equal(np.asarray(state.d), 0.0)
    state, _ = run(state, None, 1)   # next step: steepest descent
    # No bogus pair inserted from the zeroed step: history only grows
    # from genuine steps, and the run proceeds (still RUNNING or a real
    # termination, never stuck with poisoned curvature).
    assert np.isfinite(float(state.f))


def test_armijo_lossonly_backtracking_matches():
    """Loss-only backtracking must produce the same iterates as the
    all-gradient variant (fallback path when lossfunc is None)."""
    opfunc, x_star = quad_opfunc(dim=8, seed=12)
    config = lb.LbfgsConfig(max_iter=25, n_correction=8,
                            line_search="armijo")
    x0 = jnp.ones(8, dtype=jnp.float64) * 3.0

    s1 = lb.minimize(opfunc, x0, config)
    # Explicit lossfunc path.
    state = lb.lbfgs_init(opfunc, x0, config)
    run = lb.make_lbfgs_run(opfunc, config,
                            lossfunc=lambda w, b: opfunc(w, b)[0])
    state, _ = run(state, None, 25)
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(state.x),
                               rtol=1e-12)


def test_wolfe_line_search_rosenbrock_converges():
    """Weak-Wolfe bisection solves Rosenbrock to high accuracy."""
    def opfunc(x, batch=None):
        def f(z):
            return 100.0 * (z[1] - z[0] ** 2) ** 2 + (1 - z[0]) ** 2
        return f(x), jax.grad(f)(x)

    x0 = jnp.array([-1.2, 1.0], dtype=jnp.float64)
    config = lb.LbfgsConfig(max_iter=200, n_correction=20,
                            line_search="wolfe", restart=True)
    state = lb.minimize(opfunc, x0, config)
    np.testing.assert_allclose(np.asarray(state.x), np.ones(2),
                               rtol=1e-6, atol=1e-8)


def test_wolfe_curvature_pairs_positive():
    """Every accepted Wolfe step yields a usable pair y.s > 0, so the
    history fills at full rate (no curvature-guard rejections)."""
    opfunc, x_star = quad_opfunc(dim=12, seed=3)
    config = lb.LbfgsConfig(max_iter=30, n_correction=30,
                            line_search="wolfe")
    state = lb.minimize(opfunc, jnp.zeros_like(x_star), config)
    # On a convex quadratic, all post-first iterations produce pairs.
    assert int(state.k) == min(int(state.n_iter) - 1, 30) or \
        int(state.reason) != lb.RUNNING
    S, Y = np.asarray(state.S), np.asarray(state.Y)
    filled = int(state.k)
    ys = np.einsum("ij,ij->i", S, Y)
    assert np.all(np.sort(ys)[-filled:] > 0)


def test_wolfe_beats_or_matches_armijo_on_quadratic():
    opfunc, x_star = quad_opfunc(dim=20, seed=4)
    x0 = jnp.zeros_like(x_star)
    f_star = float(opfunc(x_star)[0])
    gap = {}
    for ls in ("armijo", "wolfe"):
        config = lb.LbfgsConfig(max_iter=40, n_correction=10, line_search=ls)
        gap[ls] = float(lb.minimize(opfunc, x0, config).f) - f_star
    assert gap["wolfe"] <= gap["armijo"] + 1e-12


# ---------------------------------------------------------------------------
# Matrix-form direction (dir_impl="matrix")
# ---------------------------------------------------------------------------

def _random_history(m, p, k, head, seed, dtype=jnp.float64):
    """A ring buffer as _step would build it: k filled slots ending at
    ring position head-1, unwritten slots exactly zero, every filled
    pair curvature-valid (y.s > 0)."""
    rng = np.random.RandomState(seed)
    S = np.zeros((m, p))
    Y = np.zeros((m, p))
    for j in range(k):
        r = (head - k + j) % m
        s = rng.randn(p)
        y = rng.randn(p)
        y = y + (1.0 - (y @ s)) / (s @ s) * s  # force y.s = 1 > 0
        S[r], Y[r] = s, y
    g = rng.randn(p)
    return (jnp.asarray(g, dtype), jnp.asarray(S, dtype),
            jnp.asarray(Y, dtype))


import pytest


@pytest.mark.parametrize("m,k,head", [
    (10, 0, 0),     # empty history -> pure -hdiag*g
    (10, 4, 4),     # partially filled, no wrap
    (10, 10, 3),    # full ring, wrapped head
    (50, 17, 2),    # flagship depth, wrapped partial
])
def test_matrix_direction_matches_scan(m, k, head):
    """The MXU-form direction is the SAME recursion: equal to the scan
    two-loop to f64 roundoff on random valid histories, including ring
    wrap and unfilled-slot masking."""
    p = 73
    g, S, Y = _random_history(m, p, k, head, seed=m + k + head)
    hdiag = jnp.asarray(0.37, jnp.float64)
    d_scan = lb._two_loop(g, S, Y, jnp.int32(k), jnp.int32(head), hdiag, m)
    d_mat = lb._two_loop_matrix(g, S, Y, jnp.int32(k), jnp.int32(head),
                                hdiag, m)
    np.testing.assert_allclose(np.asarray(d_mat), np.asarray(d_scan),
                               rtol=1e-10, atol=1e-12)


def test_matrix_dir_impl_full_run_matches_scan():
    """End-to-end: minimizing the same quadratic with dir_impl="matrix"
    lands on the same trajectory as "scan" to tight f64 tolerance."""
    opfunc, x_star = quad_opfunc(dim=30, seed=9)
    x0 = jnp.zeros_like(x_star)
    states = {}
    for impl in ("scan", "matrix"):
        config = lb.LbfgsConfig(learning_rate=1.0, max_iter=60,
                                n_correction=10, dir_impl=impl)
        states[impl] = lb.minimize(opfunc, x0, config)
    # Direction differences are pure f64 roundoff but amplify along the
    # trajectory; 60 iterations stay within ~1e-9 of each other.
    np.testing.assert_allclose(np.asarray(states["matrix"].x),
                               np.asarray(states["scan"].x),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(states["matrix"].x),
                               np.asarray(x_star), rtol=1e-6, atol=1e-8)


def test_matrix_dir_impl_rosenbrock_wolfe():
    """Non-convex + line search + history wrap: matrix direction still
    converges on Rosenbrock under Wolfe."""
    def opfunc(x, batch=None):
        f = (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2
        return f, jax.grad(
            lambda z: (1 - z[0]) ** 2 + 100 * (z[1] - z[0] ** 2) ** 2)(x)

    x0 = jnp.asarray([-1.2, 1.0], jnp.float64)
    config = lb.LbfgsConfig(max_iter=150, n_correction=8,
                            line_search="wolfe", dir_impl="matrix",
                            restart=True)
    state = lb.minimize(opfunc, x0, config)
    np.testing.assert_allclose(np.asarray(state.x), np.ones(2),
                               rtol=1e-6, atol=1e-8)
