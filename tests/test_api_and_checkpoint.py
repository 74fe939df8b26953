"""OO facade + checkpoint tests."""

import os

import jax.numpy as jnp
import numpy as np

from pinn.api import PhysicsInformedNN
from pinn.problems import burgers
from pinn.utils import checkpoint


HP = {"layers": [2, 10, 10, 1], "tf_epochs": 25, "tf_lr": 0.01,
      "tf_b1": 0.9, "tf_eps": None, "nt_epochs": 15, "nt_lr": 0.8,
      "nt_ncorr": 10, "log_frequency": 10}


class BurgersPINN(PhysicsInformedNN):
    """The reference's subclassing pattern, on the facade."""

    def __init__(self, hp, logger, X_f, ub, lb, nu):
        super().__init__(hp, logger, ub, lb)
        self.X_f = self.tensor(X_f)
        self.nu = nu

    def extra_batch(self):
        return {"X_f": self.X_f}

    def loss(self, params, batch):
        u_pred = self.apply(params, batch["X_u"])
        f = burgers.residual_cont(params, batch["X_f"], self.lb, self.ub,
                                  nu=self.nu)
        return (jnp.mean(jnp.square(batch["u"] - u_pred))
                + jnp.mean(jnp.square(f)))


def _toy_problem():
    rng = np.random.RandomState(0)
    X_u = rng.rand(20, 2) * 2 - 1
    u = np.sin(np.pi * X_u[:, 0:1])
    X_f = rng.rand(50, 2) * 2 - 1
    return X_u, u, X_f


def test_facade_fit_predict_decreases_loss():
    X_u, u, X_f = _toy_problem()
    pinn = BurgersPINN(HP, None, X_f, ub=[1.0, 1.0], lb=[-1.0, -1.0],
                       nu=0.01 / np.pi)
    batch = {"X_u": pinn.tensor(X_u), "u": pinn.tensor(u),
             **pinn.extra_batch()}
    loss0 = float(pinn.loss(pinn.params, batch))
    pinn.fit(X_u, u)
    loss1 = float(pinn.loss(pinn.params, batch))
    assert loss1 < loss0
    pred = pinn.predict(X_u)
    assert pred.shape == (20, 1)


def test_facade_weights_roundtrip():
    pinn = PhysicsInformedNN(HP, None, ub=[1.0, 1.0], lb=[-1.0, -1.0])
    w = pinn.get_weights()
    pred0 = pinn.predict(np.zeros((3, 2)))
    pinn.set_weights(np.zeros_like(w))
    assert float(np.abs(pinn.predict(np.zeros((3, 2)))).max()) == 0.0
    pinn.set_weights(w)
    np.testing.assert_allclose(pinn.predict(np.zeros((3, 2))), pred0,
                               rtol=1e-6)


def test_checkpoint_npz_roundtrip(tmp_path):
    pinn = PhysicsInformedNN(HP, None, ub=[1.0, 1.0], lb=[-1.0, -1.0])
    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save_npz(path, pinn.params, hp=HP, extra={"note": "t"})
    params2, meta = checkpoint.load_npz(path, like=pinn.params)
    np.testing.assert_array_equal(
        np.asarray(pinn.get_weights()),
        np.asarray(jnp.concatenate([jnp.ravel(l) for pair in params2
                                    for l in pair])))
    assert meta["hp"]["layers"] == HP["layers"]


def test_checkpoint_npz_without_template(tmp_path):
    pinn = PhysicsInformedNN(HP, None, ub=[1.0, 1.0], lb=[-1.0, -1.0])
    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save_npz(path, pinn.params)
    arrays, meta = checkpoint.load_npz(path)
    assert [list(a.shape) for a in arrays] == meta["shapes"]
    np.testing.assert_array_equal(arrays[0],
                                  np.asarray(pinn.params[0][0]))


def test_checkpoint_orbax_roundtrip(tmp_path):
    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        import pytest
        pytest.skip("orbax not installed")
    pinn = PhysicsInformedNN(HP, None, ub=[1.0, 1.0], lb=[-1.0, -1.0])
    path = os.path.join(tmp_path, "orbax_ckpt")
    checkpoint.save_orbax(path, pinn.params)
    params2 = checkpoint.load_orbax(path, like=pinn.params)
    np.testing.assert_array_equal(np.asarray(pinn.params[0][0]),
                                  np.asarray(params2[0][0]))


class AmplitudePINN(PhysicsInformedNN):
    """Identification-style subclass using wrap_training_variables
    (reference neuralnetwork.py:61-63): net + one discovered scalar."""

    def wrap_training_variables(self, params):
        return {"net": params, "p_lambda_1": jnp.zeros(())}

    def net_params(self, params):
        return params["net"]

    def loss(self, params, batch):
        u_pred = (1.0 + params["p_lambda_1"]) * self.apply(
            params["net"], batch["X_u"])
        return jnp.mean(jnp.square(batch["u"] - u_pred))


def test_facade_wrap_training_variables_trains_extra_leaf():
    X_u, u, _ = _toy_problem()
    hp = dict(HP, tf_epochs=40, nt_epochs=20)
    pinn = AmplitudePINN(hp, None, jnp.array([1.0, 1.0]),
                         jnp.array([-1.0, -1.0]))
    pinn.fit(X_u, 2.0 * u)  # target has doubled amplitude
    # The extra leaf moved off its init and sits at the flat tail
    # (dict keys flatten alphabetically: "net" < "p_lambda_1").
    lam = float(pinn.params["p_lambda_1"])
    assert abs(lam) > 1e-3
    w = pinn.get_weights()
    np.testing.assert_allclose(float(w[-1]), lam, rtol=1e-6)
    pinn.set_weights(np.asarray(w))  # roundtrip through the wrapped codec
    np.testing.assert_allclose(float(pinn.params["p_lambda_1"]), lam,
                               rtol=1e-6)
    assert pinn.predict(X_u).shape == u.shape
