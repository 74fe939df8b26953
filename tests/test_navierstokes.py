"""Navier–Stokes family tests: stream oracles, exact-solution residuals,
training smoke (SURVEY.md §4(d) pattern, as in test_problems.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from datagen.navierstokes_exact import (NU_STAR, exact_psi, exact_uvp,
                                        generate)
from pinn.models import mlp
from pinn.problems import navierstokes as ns


def _jet_oracle(params, X, lb, ub):
    """Full third-order derivative tensor of the net at each point via
    nested jacfwd — the independent oracle for ns_taylor_apply."""

    def g(x3):
        return mlp.apply(params, x3[None, :], lb, ub)[0]   # (dout,)

    j1 = jax.vmap(jax.jacfwd(g))(X)                         # (N, d, 3)
    j2 = jax.vmap(jax.jacfwd(jax.jacfwd(g)))(X)             # (N, d, 3, 3)
    j3 = jax.vmap(jax.jacfwd(jax.jacfwd(jax.jacfwd(g))))(X)  # (N,d,3,3,3)
    return j1, j2, j3


def test_ns_streams_match_nested_jacfwd():
    params = mlp.init_mlp(jax.random.PRNGKey(3), [3, 9, 7, 2], jnp.float64)
    lb = jnp.array([0.0, 0.0, 0.0])
    ub = jnp.array([2 * np.pi, 2 * np.pi, 2.0])
    X = jnp.asarray(np.random.RandomState(0).rand(6, 3) * [6.0, 6.0, 2.0],
                    jnp.float64)
    s = ns.ns_taylor_apply(params, X, lb, ub)
    j1, j2, j3 = _jet_oracle(params, X, lb, ub)

    def ck(stream, oracle):
        np.testing.assert_allclose(np.asarray(stream), np.asarray(oracle),
                                   rtol=1e-9, atol=1e-11)

    ck(s.v, jax.vmap(lambda r: mlp.apply(params, r[None], lb, ub)[0])(X))
    ck(s.x, j1[:, :, 0]); ck(s.y, j1[:, :, 1]); ck(s.t, j1[:, :, 2])
    ck(s.xx, j2[:, :, 0, 0]); ck(s.xy, j2[:, :, 0, 1])
    ck(s.yy, j2[:, :, 1, 1]); ck(s.xt, j2[:, :, 0, 2])
    ck(s.yt, j2[:, :, 1, 2])
    ck(s.xxx, j3[:, :, 0, 0, 0]); ck(s.xxy, j3[:, :, 0, 0, 1])
    ck(s.xyy, j3[:, :, 0, 1, 1]); ck(s.yyy, j3[:, :, 1, 1, 1])


def test_taylor_green_satisfies_navier_stokes():
    """Autodiff the analytic fields: momentum residuals and continuity
    must vanish identically (validates datagen, not the net)."""
    nu = NU_STAR

    def uvp(q):  # q = (x, y, t)
        x, y, t = q
        e2 = jnp.exp(-2.0 * nu * t)
        u = -jnp.cos(x) * jnp.sin(y) * e2
        v = jnp.sin(x) * jnp.cos(y) * e2
        p = -0.25 * (jnp.cos(2 * x) + jnp.cos(2 * y)) * e2 * e2
        return jnp.stack([u, v, p])

    rng = np.random.RandomState(7)
    Q = jnp.asarray(rng.rand(40, 3) * [2 * np.pi, 2 * np.pi, 2.0],
                    jnp.float64)
    J = jax.vmap(jax.jacfwd(uvp))(Q)          # (N, 3, 3)
    H = jax.vmap(jax.jacfwd(jax.jacfwd(uvp)))(Q)  # (N, 3, 3, 3)
    U = jax.vmap(uvp)(Q)
    u, v = U[:, 0], U[:, 1]
    u_x, u_y, u_t = J[:, 0, 0], J[:, 0, 1], J[:, 0, 2]
    v_x, v_y, v_t = J[:, 1, 0], J[:, 1, 1], J[:, 1, 2]
    p_x, p_y = J[:, 2, 0], J[:, 2, 1]
    lap_u = H[:, 0, 0, 0] + H[:, 0, 1, 1]
    lap_v = H[:, 1, 0, 0] + H[:, 1, 1, 1]
    f_u = u_t + (u * u_x + v * u_y) + p_x - nu * lap_u
    f_v = v_t + (u * v_x + v * v_y) + p_y - nu * lap_v
    np.testing.assert_allclose(np.asarray(f_u), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f_v), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(u_x + v_y), 0.0, atol=1e-12)

    # Consistency of the NumPy generator with the jnp oracle fields.
    un, vn, pn = exact_uvp(np.asarray(Q[:, 2]), np.asarray(Q[:, 0]),
                           np.asarray(Q[:, 1]), nu)
    np.testing.assert_allclose(un, np.asarray(U[:, 0]), rtol=1e-12)
    np.testing.assert_allclose(vn, np.asarray(U[:, 1]), rtol=1e-12)
    np.testing.assert_allclose(pn, np.asarray(U[:, 2]), rtol=1e-12)


def test_stream_function_generates_velocities():
    """u = psi_y, v = -psi_x for the analytic stream function."""
    def psi(q):
        x, y, t = q
        return jnp.cos(x) * jnp.cos(y) * jnp.exp(-2.0 * NU_STAR * t)

    rng = np.random.RandomState(9)
    Q = jnp.asarray(rng.rand(25, 3) * [2 * np.pi, 2 * np.pi, 2.0],
                    jnp.float64)
    g = jax.vmap(jax.grad(psi))(Q)
    u, v, _ = exact_uvp(np.asarray(Q[:, 2]), np.asarray(Q[:, 0]),
                        np.asarray(Q[:, 1]))
    np.testing.assert_allclose(np.asarray(g[:, 1]), u, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(-g[:, 0]), v, rtol=1e-12)
    # And the datagen psi helper agrees.
    np.testing.assert_allclose(
        exact_psi(np.asarray(Q[:, 2]), np.asarray(Q[:, 0]),
                  np.asarray(Q[:, 1])),
        np.asarray(jax.vmap(psi)(Q)), rtol=1e-12)


def test_residual_on_near_exact_field_is_small():
    """The residual OPERATOR is exact: feeding it the true lambdas and a
    net, f_u/f_v must equal the same formula assembled from the jet
    oracle of that same net (operator identity, any net)."""
    params = mlp.init_mlp(jax.random.PRNGKey(11), [3, 8, 8, 2],
                          jnp.float64)
    lb = jnp.array([0.0, 0.0, 0.0])
    ub = jnp.array([2 * np.pi, 2 * np.pi, 2.0])
    X = jnp.asarray(np.random.RandomState(3).rand(10, 3)
                    * [6.0, 6.0, 2.0], jnp.float64)
    l1, l2 = 1.0, NU_STAR
    u, v, p, f_u, f_v = ns.uvp_and_residual(params, X, lb, ub, l1, l2)

    j1, j2, j3 = _jet_oracle(params, X, lb, ub)
    # psi = output 0, p = output 1
    uo = j1[:, 0:1, 1]; vo = -j1[:, 0:1, 0]
    u_t = j2[:, 0:1, 1, 2]; u_x = j2[:, 0:1, 0, 1]; u_y = j2[:, 0:1, 1, 1]
    u_xx = j3[:, 0:1, 0, 0, 1]; u_yy = j3[:, 0:1, 1, 1, 1]
    v_t = -j2[:, 0:1, 0, 2]; v_x = -j2[:, 0:1, 0, 0]; v_y = -j2[:, 0:1, 0, 1]
    v_xx = -j3[:, 0:1, 0, 0, 0]; v_yy = -j3[:, 0:1, 0, 1, 1]
    p_x = j1[:, 1:2, 0]; p_y = j1[:, 1:2, 1]
    fu_o = u_t + l1 * (uo * u_x + vo * u_y) + p_x - l2 * (u_xx + u_yy)
    fv_o = v_t + l1 * (uo * v_x + vo * v_y) + p_y - l2 * (v_xx + v_yy)
    np.testing.assert_allclose(np.asarray(f_u), np.asarray(fu_o),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(f_v), np.asarray(fv_o),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(u), np.asarray(uo),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vo),
                               rtol=1e-9, atol=1e-12)


def test_loss_gradient_flows_to_lambdas_and_training_descends():
    d = generate(nx=16, ny=16, nt=5)
    rng = np.random.RandomState(0)
    idx = rng.choice(d.X_star.shape[0], 256, replace=False)
    X = jnp.asarray(d.X_star[idx], jnp.float64)
    u = jnp.asarray(d.u_star[idx], jnp.float64)
    v = jnp.asarray(d.v_star[idx], jnp.float64)
    lb, ub = jnp.asarray(d.lb), jnp.asarray(d.ub)

    net = mlp.init_mlp(jax.random.PRNGKey(0), [3, 10, 10, 2], jnp.float64)
    p0 = ns.init_ide_params(net)
    loss = lambda p: ns.loss_identification(p, X, u, v, lb, ub)
    g = jax.grad(loss)(p0)
    assert float(jnp.abs(g.lambda1[0])) >= 0  # finite
    assert np.isfinite(float(g.lambda1[0]))
    assert np.isfinite(float(g.lambda2[0]))

    # 60 plain gradient steps must reduce the loss (smoke, not accuracy).
    import optax
    opt = optax.adam(2e-3)
    st = opt.init(p0)
    p = p0
    l0 = float(loss(p))

    @jax.jit
    def step(p, st):
        l, gr = jax.value_and_grad(loss)(p)
        up, st = opt.update(gr, st)
        return jax.tree_util.tree_map(jnp.add, p, up), st, l

    for _ in range(60):
        p, st, l = step(p, st)
    assert float(l) < l0


# ---------------------------------------------------------------------------
# Spectral DNS datagen (datagen/navierstokes_spectral.py)
# ---------------------------------------------------------------------------

def _spectral_ops(nx, ny):
    from datagen.navierstokes_spectral import _wavenumbers
    kx = _wavenumbers(nx)[:, None]
    ky = _wavenumbers(ny)[None, :]

    def dx(f):
        return np.real(np.fft.ifft2(1j * kx * np.fft.fft2(f)))

    def dy(f):
        return np.real(np.fft.ifft2(1j * ky * np.fft.fft2(f)))

    def lap(f):
        return np.real(np.fft.ifft2(-(kx ** 2 + ky ** 2) * np.fft.fft2(f)))

    return dx, dy, lap


def test_spectral_dns_frames_satisfy_momentum_equation():
    """The PINN's training target obeys the MOMENTUM equation (not just
    the vorticity equation the solver integrated): u_t from 4th-order
    FD across frames matches -(u u_x + v u_y) - p_x + nu lap(u), all
    spatial derivatives spectral."""
    from datagen.navierstokes_spectral import generate
    d = generate(nx=64, ny=64, nt=11, t_max=0.5, substeps=10)
    nx, ny, nt = len(d.x), len(d.y), len(d.t)
    U = d.u_star.reshape(nx, ny, nt)
    V = d.v_star.reshape(nx, ny, nt)
    P = d.p_star.reshape(nx, ny, nt)
    dx, dy, lap = _spectral_ops(nx, ny)
    dtf = d.t[1] - d.t[0]
    k = nt // 2
    u_t = (-U[:, :, k + 2] + 8 * U[:, :, k + 1]
           - 8 * U[:, :, k - 1] + U[:, :, k - 2]) / (12 * dtf)
    v_t = (-V[:, :, k + 2] + 8 * V[:, :, k + 1]
           - 8 * V[:, :, k - 1] + V[:, :, k - 2]) / (12 * dtf)
    u, v, p = U[:, :, k], V[:, :, k], P[:, :, k]
    res_u = u_t + u * dx(u) + v * dy(u) + dx(p) - d.nu * lap(u)
    res_v = v_t + u * dx(v) + v * dy(v) + dy(p) - d.nu * lap(v)
    scale = max(np.abs(u_t).max(), np.abs(v_t).max())
    assert np.abs(res_u).max() / scale < 1e-4, np.abs(res_u).max() / scale
    assert np.abs(res_v).max() / scale < 1e-4, np.abs(res_v).max() / scale
    # Incompressibility (exact in the spectral representation).
    assert np.abs(dx(u) + dy(v)).max() < 1e-10


def test_spectral_dns_lambdas_are_identifiable():
    """curl((u.grad)u) != 0 and curl(lap u) != 0 — the two conditions
    under which (lambda1, lambda2) cannot be absorbed by a pressure
    gauge (unlike Taylor-Green, where curl(adv) == 0 exactly)."""
    from datagen.navierstokes_spectral import generate
    d = generate(nx=64, ny=64, nt=3, t_max=0.2, substeps=10)
    nx, ny, nt = len(d.x), len(d.y), len(d.t)
    U = d.u_star.reshape(nx, ny, nt)[:, :, -1]
    V = d.v_star.reshape(nx, ny, nt)[:, :, -1]
    dx, dy, lap = _spectral_ops(nx, ny)
    adv_u = U * dx(U) + V * dy(U)
    adv_v = U * dx(V) + V * dy(V)
    curl_adv = dx(adv_v) - dy(adv_u)
    curl_lap = dx(lap(V)) - dy(lap(U))
    assert np.sqrt((curl_adv ** 2).mean()) > 1e-2
    assert np.sqrt((curl_lap ** 2).mean()) > 1e-1

    # Taylor-Green CONTRAST: its advection curl vanishes identically.
    x = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u, v, _ = exact_uvp(0.3, X, Y)
    adv_u = u * dx(u) + v * dy(u)
    adv_v = u * dx(v) + v * dy(v)
    assert np.abs(dx(adv_v) - dy(adv_u)).max() < 1e-10


def test_spectral_dns_dt_self_convergence():
    """Halving dt changes the solution at 4th order (ETDRK4)."""
    from datagen.navierstokes_spectral import generate
    u_c = generate(nx=32, ny=32, nt=2, t_max=0.4, substeps=5).u_star
    u_m = generate(nx=32, ny=32, nt=2, t_max=0.4, substeps=10).u_star
    u_f = generate(nx=32, ny=32, nt=2, t_max=0.4, substeps=20).u_star
    e_cm = np.abs(u_c - u_f).max()
    e_mf = np.abs(u_m - u_f).max()
    # 4th order: error ratio ~16 between dt and dt/2 (relaxed to >8).
    assert e_cm / max(e_mf, 1e-16) > 8.0, (e_cm, e_mf)


def test_loss_with_separate_collocation_set():
    """X_f semantics: with X_f == X the loss equals the data-points-only
    loss exactly; with a disjoint draw the residual term changes but the
    data terms do not, and gradients flow to the lambdas (round-5
    residual-collocation lever)."""
    key = jax.random.PRNGKey(3)
    net = mlp.init_mlp(key, [3, 8, 8, 2], jnp.float32)
    params = ns.init_ide_params(net)
    lb = jnp.array([0.0, 0.0, 0.0])
    ub = jnp.array([2 * jnp.pi, 2 * jnp.pi, 2.0])
    rng = np.random.RandomState(0)
    X = jnp.asarray(lb + (ub - lb) * rng.rand(32, 3), jnp.float32)
    u = jnp.asarray(rng.rand(32, 1), jnp.float32)
    v = jnp.asarray(rng.rand(32, 1), jnp.float32)

    base = ns.loss_identification(params, X, u, v, lb, ub)
    same = ns.loss_identification(params, X, u, v, lb, ub, X_f=X)
    assert float(jnp.abs(base - same)) == 0.0

    X_f = jnp.asarray(lb + (ub - lb) * rng.rand(64, 3), jnp.float32)
    other = ns.loss_identification(params, X, u, v, lb, ub, X_f=X_f)
    assert float(jnp.abs(other - base)) > 0.0
    g = jax.grad(lambda p: ns.loss_identification(
        p, X, u, v, lb, ub, X_f=X_f))(params)
    assert float(jnp.abs(g.lambda1[0])) > 0.0
    assert float(jnp.abs(g.lambda2[0])) > 0.0


def test_df32_ns_loss_with_collocation_matches_f64():
    """The df32 head's optional batch X_f mirrors the f64 loss."""
    from pinn.ops.df32 import make_ns_ide_loss_df32

    with jax.enable_x64(True):
        key = jax.random.PRNGKey(5)
        net = mlp.init_mlp(key, [3, 8, 8, 2], jnp.float64)
        params = ns.init_ide_params(net, jnp.float64)
        params = params._replace(lambda1=jnp.array([0.7], jnp.float64),
                                 lambda2=jnp.array([0.02], jnp.float64))
        lbn = np.array([0.0, 0.0, 0.0])
        ubn = np.array([2 * np.pi, 2 * np.pi, 2.0])
        rng = np.random.RandomState(1)
        batch = {"X": jnp.asarray(lbn + (ubn - lbn) * rng.rand(24, 3)),
                 "u": jnp.asarray(rng.rand(24, 1)),
                 "v": jnp.asarray(rng.rand(24, 1)),
                 "X_f": jnp.asarray(lbn + (ubn - lbn) * rng.rand(48, 3))}
        lb = jnp.asarray(lbn)
        ub = jnp.asarray(ubn)
        l_dd = float(make_ns_ide_loss_df32(lbn, ubn)(params, batch))
        l_64 = float(ns.loss_identification(
            params, batch["X"], batch["u"], batch["v"], lb, ub,
            X_f=batch["X_f"]))
        assert abs(l_dd - l_64) / abs(l_64) < 1e-9
