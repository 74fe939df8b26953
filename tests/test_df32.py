"""df32 (double-f32) extended-precision engine tests.

Exactness tier notes (pinn/ops/df32.py module docstring): the CPU
backend's fusion emitter breaks EFTs under jit (FMA contraction of
duplicated producers), so CPU exactness tests run EAGER or with the
no-fusion compile options; the real-chip tier (`PINN_TPU_TESTS=1
pytest -m tpu`) asserts jit exactness on the target hardware where it
holds unconditionally.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pinn.ops import df32 as dd

NOFUSE = {"xla_backend_optimization_level": "0"}


def _jit_nofuse(fn, *args):
    """jit with CPU fusion disabled (EFT-safe compile; see df32.py)."""
    return jax.jit(fn).lower(*args).compile(compiler_options=NOFUSE)(*args)


def to64(x: dd.DF) -> np.ndarray:
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


# ---------------------------------------------------------------------------
# Error-free transformations (eager = per-op XLA programs, no fusion)
# ---------------------------------------------------------------------------

def test_two_sum_exact_eager():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(4096).astype(np.float32)
    b = (rng.standard_normal(4096) * 1e-6).astype(np.float32)
    s, e = dd.two_sum(jnp.asarray(a), jnp.asarray(b))
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_two_prod_exact_eager():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(4096).astype(np.float32)
    b = rng.standard_normal(4096).astype(np.float32)
    p, e = dd.two_prod(jnp.asarray(a), jnp.asarray(b))
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = a.astype(np.float64) * b.astype(np.float64)
    # f32 x f32 products are exact in f64 (24+24 <= 53 bits).
    np.testing.assert_array_equal(lhs, rhs)


def test_from_to_f64_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(512)
    d = dd.from_f64(jnp.asarray(x))
    # hi+lo carries ~48 bits of x (lo is itself f32-rounded).
    hi64 = np.asarray(d.hi, np.float64)
    lo64 = np.asarray(d.lo, np.float64)
    err = np.abs(hi64 + lo64 - x)
    assert (err <= np.abs(x) * 2**-47).all()


# ---------------------------------------------------------------------------
# dd arithmetic accuracy (~2^-48 relative)
# ---------------------------------------------------------------------------

def test_add_mul_div_accuracy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(2048)
    y = rng.standard_normal(2048)
    X, Y = dd.from_f64(jnp.asarray(x)), dd.from_f64(jnp.asarray(y))
    # Reference against the exact values the DF pairs REPRESENT (the
    # 48-bit split error would otherwise dominate under cancellation).
    xs, ys = to64(X), to64(Y)
    for op, ref in [(dd.add, xs + ys), (dd.mul, xs * ys), (dd.div, xs / ys)]:
        got = to64(op(X, Y))
        rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300)
        assert rel.max() < 1e-13, (op.__name__, rel.max())


def test_sum_pairwise_vs_fsum():
    rng = np.random.default_rng(4)
    for k in [3, 17, 100, 1000]:
        x = rng.standard_normal(k)
        s = dd.sum_pairwise(dd.from_f64(jnp.asarray(x)), axis=0)
        exact = math.fsum(x)
        assert abs(float(to64(s)) - exact) <= abs(exact) * 1e-12 + 1e-14


def test_matmul_exact_jit_nofuse():
    rng = np.random.default_rng(5)
    for k in [8, 64, 600]:  # 600 ~ the q=500 IRK coupling scale
        A = dd.from_f64(jnp.asarray(rng.standard_normal((16, k))))
        B = dd.from_f64(jnp.asarray(rng.standard_normal((k, 16))))
        exact = (np.asarray(A.hi, np.float64) + np.asarray(A.lo, np.float64)) @ (
            np.asarray(B.hi, np.float64) + np.asarray(B.lo, np.float64))
        r = _jit_nofuse(dd.matmul, A, B)
        rel = np.abs(to64(r) - exact) / np.maximum(np.abs(exact), 1e-30)
        # O(K·2^-48·cond) sequential error-channel accumulation.
        assert rel.max() < (1e-10 if k <= 64 else 1e-9), (k, rel.max())


def test_cpu_fusion_breaks_eft_documented():
    """Regression lock on the *reason* df32 never routes to CPU jit:
    default-compiled CPU jit loses the compensation (documented in
    pinn/ops/df32.py).  If this starts PASSING at 1e-10, the guard
    rails can be relaxed."""
    rng = np.random.default_rng(6)
    A = dd.from_f64(jnp.asarray(rng.standard_normal((16, 64))))
    B = dd.from_f64(jnp.asarray(rng.standard_normal((64, 16))))
    exact = (np.asarray(A.hi, np.float64) + np.asarray(A.lo, np.float64)) @ (
        np.asarray(B.hi, np.float64) + np.asarray(B.lo, np.float64))
    r = jax.jit(dd.matmul)(A, B)
    rel = np.abs(to64(r) - exact) / np.maximum(np.abs(exact), 1e-30)
    if rel.max() < 1e-10:
        pytest.skip("CPU fusion emitter became EFT-safe — revisit df32 "
                    "CPU guard rails")


def test_tanh_expm1_accuracy():
    x = np.concatenate([
        np.linspace(-20, 20, 2001),
        np.array([0.0, 1e-8, -1e-8, 1e-3, 40.0, 60.0, -60.0]),
    ])
    t = dd.tanh(dd.from_f64(jnp.asarray(x)))
    ref = np.tanh(x)
    rel = np.abs(to64(t) - ref) / np.maximum(np.abs(ref), 1e-300)
    rel[ref == 0] = np.abs(to64(t))[ref == 0]
    assert rel.max() < 1e-13, rel.max()


# ---------------------------------------------------------------------------
# Network engine vs the f64 oracle (eager on CPU)
# ---------------------------------------------------------------------------

def _tiny_net():
    from pinn.models import mlp
    layers = [2, 8, 8, 8, 1]
    lb = np.array([-1.0, 0.0])
    ub = np.array([1.0, 1.0])
    net = mlp.init_mlp(jax.random.PRNGKey(0), layers, jnp.float64)
    rng = np.random.default_rng(7)
    X = jnp.asarray(lb + (ub - lb) * rng.random((64, 2)))
    return net, X, lb, ub


def test_taylor_apply_df32_matches_f64():
    from pinn.models import mlp
    net, X, lb, ub = _tiny_net()
    v1 = np.array([1.0, 0.0])
    v2 = np.array([0.0, 1.0])
    # NOFUSE compile: the layer/contraction scans always compile their
    # bodies, so plain eager still hits the CPU fusion emitter.
    got = _jit_nofuse(
        lambda p, x: dd.taylor_apply_df32(p, x, lb, ub, v1, v2), net, X)
    ref = mlp.taylor_apply(net, X, jnp.asarray(lb), jnp.asarray(ub),
                           jnp.asarray(v1), jnp.asarray(v2))
    for name, g, r in [("value", got.value, ref.value),
                       ("d1", got.d1, ref.d1),
                       ("d11", got.d11, ref.d11),
                       ("d2", got.d2, ref.d2)]:
        scale = np.abs(np.asarray(r)).max()
        np.testing.assert_allclose(to64(g), np.asarray(r), rtol=0,
                                   atol=scale * 1e-10, err_msg=name)


def test_burgers_loss_df32_matches_f64():
    from pinn.problems import burgers
    net, X_f, lb, ub = _tiny_net()
    rng = np.random.default_rng(8)
    X_u = jnp.asarray(lb + (ub - lb) * rng.random((16, 2)))
    u = jnp.asarray(rng.standard_normal((16, 1)) * 0.5)
    nu = 0.01 / np.pi
    batch = {"X_f": X_f, "X_u": X_u, "u": u}
    loss_dd = dd.make_burgers_loss_df32(lb, ub, nu)
    l_dd = float(_jit_nofuse(loss_dd, net, batch))
    l_64 = float(burgers.loss_cont_inference(
        net, X_u, u, X_f, jnp.asarray(lb), jnp.asarray(ub), nu))
    assert abs(l_dd - l_64) / abs(l_64) < 1e-9


def test_burgers_grad_df32_direction():
    """f32-backward gradients: direction must agree with the f64 oracle
    (cosine ~1); magnitudes to f32 grade."""
    from pinn.problems import burgers
    net, X_f, lb, ub = _tiny_net()
    rng = np.random.default_rng(9)
    X_u = jnp.asarray(lb + (ub - lb) * rng.random((16, 2)))
    u = jnp.asarray(rng.standard_normal((16, 1)) * 0.5)
    nu = 0.01 / np.pi
    batch = {"X_f": X_f, "X_u": X_u, "u": u}
    loss_dd = dd.make_burgers_loss_df32(lb, ub, nu)
    g_dd = _jit_nofuse(jax.grad(loss_dd), net, batch)
    g_64 = jax.grad(lambda p: burgers.loss_cont_inference(
        p, X_u, u, X_f, jnp.asarray(lb), jnp.asarray(ub), nu))(net)
    gd = jnp.concatenate([x.reshape(-1) for pair in g_dd for x in pair])
    g6 = jnp.concatenate([x.reshape(-1) for pair in g_64 for x in pair])
    cos = float(jnp.vdot(gd, g6) / (jnp.linalg.norm(gd) * jnp.linalg.norm(g6)))
    assert cos > 1 - 1e-6, cos
    rel = float(jnp.linalg.norm(gd - g6) / jnp.linalg.norm(g6))
    assert rel < 1e-3, rel


def test_schrodinger_loss_df32_matches_f64():
    from pinn.models import mlp
    from pinn.problems import schrodinger
    layers = [2, 12, 12, 12, 2]
    lb = np.array([-5.0, 0.0])
    ub = np.array([5.0, np.pi / 2])
    net = mlp.init_mlp(jax.random.PRNGKey(3), layers, jnp.float64)
    rng = np.random.default_rng(11)
    X0 = jnp.asarray(np.stack([rng.uniform(-5, 5, 16),
                               np.zeros(16)], axis=1))
    H0 = jnp.asarray(rng.standard_normal((16, 2)) * 0.5)
    tb = rng.uniform(0, np.pi / 2, 8)
    X_lb = jnp.asarray(np.stack([np.full(8, -5.0), tb], axis=1))
    X_ub = jnp.asarray(np.stack([np.full(8, 5.0), tb], axis=1))
    X_f = jnp.asarray(lb + (ub - lb) * rng.random((64, 2)))
    batch = {"X0": X0, "H0": H0, "X_lb": X_lb, "X_ub": X_ub, "X_f": X_f}

    loss_dd = dd.make_schrodinger_loss_df32(lb, ub)
    l_dd = float(_jit_nofuse(loss_dd, net, batch))
    l_64 = float(schrodinger.loss(net, X0, H0, X_lb, X_ub, X_f,
                                  jnp.asarray(lb), jnp.asarray(ub)))
    assert abs(l_dd - l_64) / abs(l_64) < 1e-9, (l_dd, l_64)

    g_dd = _jit_nofuse(jax.grad(loss_dd), net, batch)
    g_64 = jax.grad(lambda p: schrodinger.loss(
        p, X0, H0, X_lb, X_ub, X_f, jnp.asarray(lb), jnp.asarray(ub)))(net)
    gd = jnp.concatenate([x.reshape(-1) for pair in g_dd for x in pair])
    g6 = jnp.concatenate([x.reshape(-1) for pair in g_64 for x in pair])
    cos = float(jnp.vdot(gd, g6) / (jnp.linalg.norm(gd) * jnp.linalg.norm(g6)))
    assert cos > 1 - 1e-6, cos


def test_disc_losses_df32_match_f64():
    """Disc-IRK inference + identification losses and grads vs f64."""
    from pinn import irk
    from pinn.models import mlp
    from pinn.problems import burgers
    q = 12
    layers_inf = [1, 14, 14, q + 1]
    lb, ub = np.array([-1.0]), np.array([1.0])
    nu, dt = 0.01 / np.pi, 0.8
    W = irk.irk_weights(q)[0]
    rng = np.random.default_rng(23)

    net = mlp.init_mlp(jax.random.PRNGKey(2), layers_inf, jnp.float64)
    batch = {"x_0": jnp.asarray(rng.uniform(-1, 1, (20, 1))),
             "u_0": jnp.asarray(rng.standard_normal((20, q + 1)) * 0.4),
             "x_1": jnp.asarray(np.array([[-1.0], [1.0]]))}
    loss_dd = dd.make_burgers_disc_inf_loss_df32(lb, ub, nu, dt, W)
    l_dd = float(_jit_nofuse(loss_dd, net, batch))
    l_64 = float(burgers.loss_disc_inference(
        net, batch["x_0"], batch["u_0"], batch["x_1"],
        jnp.asarray(lb), jnp.asarray(ub), nu, dt, jnp.asarray(W)))
    assert abs(l_dd - l_64) / abs(l_64) < 1e-9, (l_dd, l_64)
    g_dd = _jit_nofuse(jax.grad(loss_dd), net, batch)
    g_64 = jax.grad(lambda p: burgers.loss_disc_inference(
        p, batch["x_0"], batch["u_0"], batch["x_1"],
        jnp.asarray(lb), jnp.asarray(ub), nu, dt, jnp.asarray(W)))(net)
    gd = jnp.concatenate([x.reshape(-1)
                          for x in jax.tree_util.tree_leaves(g_dd)])
    g6 = jnp.concatenate([x.reshape(-1)
                          for x in jax.tree_util.tree_leaves(g_64)])
    assert float(jnp.linalg.norm(gd - g6) / jnp.linalg.norm(g6)) < 1e-3

    # identification: alpha = dt-weighted A rows, beta = b broadcast
    tab = irk.gauss_legendre_irk(q)
    alpha = tab.A
    beta = np.tile(tab.b[None, :], (q, 1))
    net_i = mlp.init_mlp(jax.random.PRNGKey(4), [1, 14, 14, q],
                         jnp.float64)
    params = burgers.init_ide_params(net_i, jnp.float64)
    params = params._replace(lambda1=jnp.asarray([0.9], jnp.float64),
                             log_lambda2=jnp.asarray([-5.0], jnp.float64))
    batch_i = {"x_0": jnp.asarray(rng.uniform(-1, 1, (16, 1))),
               "u_0": jnp.asarray(rng.standard_normal((16, q)) * 0.4),
               "x_1": jnp.asarray(rng.uniform(-1, 1, (18, 1))),
               "u_1": jnp.asarray(rng.standard_normal((18, q)) * 0.4)}
    loss_idd = dd.make_burgers_disc_ide_loss_df32(lb, ub, dt, alpha, beta)
    l_idd = float(_jit_nofuse(loss_idd, params, batch_i))
    l_i64 = float(burgers.loss_disc_identification(
        params, batch_i["x_0"], batch_i["u_0"], batch_i["x_1"],
        batch_i["u_1"], jnp.asarray(lb), jnp.asarray(ub), dt,
        jnp.asarray(alpha), jnp.asarray(beta)))
    assert abs(l_idd - l_i64) / abs(l_i64) < 1e-9, (l_idd, l_i64)
    gi_dd = _jit_nofuse(jax.grad(loss_idd), params, batch_i)
    gi_64 = jax.grad(lambda p: burgers.loss_disc_identification(
        p, batch_i["x_0"], batch_i["u_0"], batch_i["x_1"],
        batch_i["u_1"], jnp.asarray(lb), jnp.asarray(ub), dt,
        jnp.asarray(alpha), jnp.asarray(beta)))(params)
    gd = jnp.concatenate([x.reshape(-1)
                          for x in jax.tree_util.tree_leaves(gi_dd)])
    g6 = jnp.concatenate([x.reshape(-1)
                          for x in jax.tree_util.tree_leaves(gi_64)])
    assert float(jnp.linalg.norm(gd - g6) / jnp.linalg.norm(g6)) < 1e-3
    # λ gradients specifically
    assert abs(float(gi_dd.lambda1[0]) - float(gi_64.lambda1[0])) \
        <= 1e-5 * abs(float(gi_64.lambda1[0]))
    assert abs(float(gi_dd.log_lambda2[0]) - float(gi_64.log_lambda2[0])) \
        <= 1e-5 * abs(float(gi_64.log_lambda2[0]))


def test_allencahn_loss_df32_matches_f64():
    from pinn import irk
    from pinn.models import mlp
    from pinn.problems import allencahn
    q = 10
    layers = [1, 16, 16, q + 1]
    lb, ub = np.array([-1.0]), np.array([1.0])
    dt = 0.8
    W = irk.irk_weights(q)[0]
    rng = np.random.default_rng(29)
    net = mlp.init_mlp(jax.random.PRNGKey(6), layers, jnp.float64)
    batch = {"x_0": jnp.asarray(rng.uniform(-1, 1, (24, 1))),
             "u_0": jnp.asarray(rng.standard_normal((24, 1)) * 0.4),
             "x_bnd": jnp.asarray(np.array([[-1.0], [1.0]]))}
    loss_dd = dd.make_allencahn_disc_loss_df32(lb, ub, dt, W)
    l_dd = float(_jit_nofuse(loss_dd, net, batch))
    l_64 = float(allencahn.loss_disc_inference(
        net, batch["x_0"], batch["u_0"], batch["x_bnd"],
        jnp.asarray(lb), jnp.asarray(ub), dt, jnp.asarray(W)))
    assert abs(l_dd - l_64) / abs(l_64) < 1e-9, (l_dd, l_64)
    g_dd = _jit_nofuse(jax.grad(loss_dd), net, batch)
    g_64 = jax.grad(lambda p: allencahn.loss_disc_inference(
        p, batch["x_0"], batch["u_0"], batch["x_bnd"],
        jnp.asarray(lb), jnp.asarray(ub), dt, jnp.asarray(W)))(net)
    gd = jnp.concatenate([x.reshape(-1)
                          for x in jax.tree_util.tree_leaves(g_dd)])
    g6 = jnp.concatenate([x.reshape(-1)
                          for x in jax.tree_util.tree_leaves(g_64)])
    assert float(jnp.linalg.norm(gd - g6) / jnp.linalg.norm(g6)) < 1e-3


def test_ns_ide_loss_df32_matches_f64():
    from pinn.models import mlp
    from pinn.problems import navierstokes as ns
    layers = [3, 10, 10, 10, 2]
    lb = np.array([0.0, 0.0, 0.0])
    ub = np.array([2 * np.pi, 2 * np.pi, 2.0])
    net = mlp.init_mlp(jax.random.PRNGKey(5), layers, jnp.float64)
    params = ns.NSIdeParams(net=net,
                            lambda1=jnp.asarray([0.9], jnp.float64),
                            lambda2=jnp.asarray([0.01], jnp.float64))
    rng = np.random.default_rng(13)
    X = jnp.asarray(lb + (ub - lb) * rng.random((48, 3)))
    u = jnp.asarray(rng.standard_normal((48, 1)) * 0.3)
    v = jnp.asarray(rng.standard_normal((48, 1)) * 0.3)
    batch = {"X": X, "u": u, "v": v}

    loss_dd = dd.make_ns_ide_loss_df32(lb, ub)
    l_dd = float(_jit_nofuse(loss_dd, params, batch))
    l_64 = float(ns.loss_identification(params, X, u, v,
                                        jnp.asarray(lb), jnp.asarray(ub)))
    assert abs(l_dd - l_64) / abs(l_64) < 1e-9, (l_dd, l_64)

    g_dd = _jit_nofuse(jax.grad(loss_dd), params, batch)
    g_64 = jax.grad(lambda p: ns.loss_identification(
        p, X, u, v, jnp.asarray(lb), jnp.asarray(ub)))(params)
    gd = jnp.concatenate([x.reshape(-1)
                          for x in jax.tree_util.tree_leaves(g_dd)])
    g6 = jnp.concatenate([x.reshape(-1)
                          for x in jax.tree_util.tree_leaves(g_64)])
    cos = float(jnp.vdot(gd, g6) / (jnp.linalg.norm(gd) * jnp.linalg.norm(g6)))
    assert cos > 1 - 1e-6, cos
    rel = float(jnp.linalg.norm(gd - g6) / jnp.linalg.norm(g6))
    assert rel < 1e-3, rel
    # λ gradients specifically (the identification trainables)
    for leaf_dd, leaf_64 in ((g_dd.lambda1, g_64.lambda1),
                             (g_dd.lambda2, g_64.lambda2)):
        assert abs(float(leaf_dd[0]) - float(leaf_64[0])) \
            <= 1e-5 * abs(float(leaf_64[0])) + 1e-10


def test_ns_streams_df32_match_f64_oracle():
    """All 13 df32 streams vs the f64 ns_taylor_apply on a tiny net."""
    from pinn.models import mlp
    from pinn.problems import navierstokes as ns
    layers = [3, 9, 9, 2]
    lb = np.array([-1.0, -1.0, 0.0])
    ub = np.array([1.0, 1.0, 1.0])
    net = mlp.init_mlp(jax.random.PRNGKey(8), layers, jnp.float64)
    rng = np.random.default_rng(17)
    X = jnp.asarray(lb + (ub - lb) * rng.random((32, 3)))
    s_dd = _jit_nofuse(lambda p, x: dd.ns_taylor_apply_df32(
        p, x, np.asarray(lb), np.asarray(ub)), net, X)
    s_64 = ns.ns_taylor_apply(net, X, jnp.asarray(lb), jnp.asarray(ub))
    for name in ns.NSStreams._fields:
        got = to64(getattr(s_dd, name))
        ref = np.asarray(getattr(s_64, name))
        scale = max(np.abs(ref).max(), 1e-12)
        assert np.abs(got - ref).max() / scale < 1e-9, (
            name, np.abs(got - ref).max() / scale)


# ---------------------------------------------------------------------------
# Real-chip tier: jit exactness on TPU (the deployment configuration)
# ---------------------------------------------------------------------------

@pytest.mark.tpu
def test_tpu_jit_matmul_exact():
    assert jax.default_backend() != "cpu"
    with jax.enable_x64(True):
        rng = np.random.default_rng(10)
        A = dd.from_f64(jnp.asarray(rng.standard_normal((64, 64))))
        B = dd.from_f64(jnp.asarray(rng.standard_normal((64, 64))))
        A64 = np.asarray(A.hi, np.float64) + np.asarray(A.lo, np.float64)
        B64 = np.asarray(B.hi, np.float64) + np.asarray(B.lo, np.float64)
        exact = A64 @ B64
        r = jax.jit(dd.matmul)(A, B)
        # dd error is bounded relative to the dot-product CONDITION
        # (sum of |terms|), not the result: an output entry that nearly
        # cancels can legitimately sit at ~1e-10 result-relative while
        # the arithmetic is exact to ~K*2^-48 of the term mass.  A real
        # EFT breakage (e.g. the CPU fusion-emitter FMA contraction,
        # df32.py module docstring) shows up at ~2^-24 ≈ 6e-8 of the
        # condition — 4 orders above this threshold.
        cond = np.abs(A64) @ np.abs(B64)
        err = np.abs(to64(r) - exact) / cond
        assert err.max() < 1e-11, err.max()
        # Well-conditioned entries must also be result-relative tight.
        rel = np.abs(to64(r) - exact) / np.maximum(np.abs(exact), 1e-30)
        assert np.median(rel) < 1e-12, np.median(rel)
