"""Extensibility example: a NEW PDE on the public API (no counterpart
in the reference — its five experiments are the only PDEs it can run
without copy-pasting a script).

Problem: 1D heat equation  u_t = alpha u_xx  on [-1, 1] x [0, 1] with
u(x, 0) = sin(pi x), u(+-1, t) = 0; exact solution
u = exp(-alpha pi^2 t) sin(pi x).

The subclass overrides ``loss`` with a PDE residual built from the
framework's Taylor-mode derivative engine (``self.taylor`` — value,
u_x, u_xx, u_t in one forward pass), exactly the pattern a reference
user writes with nested GradientTapes (reference
1d-burgers/inf_cont_burgers.py:48-98).

Usage: ``python experiments/custom_pde_example.py [hp.json]``
"""

from __future__ import annotations

import sys

from _common import setup, resolve_dtype, validate  # noqa: F401

import jax.numpy as jnp
import numpy as np

from pinn.api import PhysicsInformedNN
from pinn.data import lhs
from pinn.utils import Logger, load_hp

ALPHA = 0.1

DEFAULT_HP = {
    "N_u": 100,
    "N_f": 5000,
    "layers": [2, 20, 20, 20, 20, 1],
    "tf_epochs": 500,
    "tf_lr": 0.005,
    "tf_b1": 0.9,
    "tf_eps": None,
    "nt_epochs": 2000,
    "nt_lr": 0.8,
    "nt_ncorr": 50,
    "nt_line_search": "wolfe",
    "log_frequency": 500,
}


def exact(X):
    return (np.exp(-ALPHA * np.pi ** 2 * X[:, 1:2])
            * np.sin(np.pi * X[:, 0:1]))


class HeatPINN(PhysicsInformedNN):
    def __init__(self, hp, logger, X_f, ub, lb):
        super().__init__(hp, logger, ub, lb)
        self.X_f = self.tensor(X_f)
        # Input-space tangents for d/dx and d/dt streams.
        self.vx = jnp.array([1.0, 0.0], self.dtype)
        self.vt = jnp.array([0.0, 1.0], self.dtype)

    def extra_batch(self):
        return {"X_f": self.X_f}

    def loss(self, params, batch):
        u_pred = self.apply(params, batch["X_u"])
        mse_u = jnp.mean(jnp.square(batch["u"] - u_pred))
        o = self.taylor(params, batch["X_f"], self.vx, self.vt, order=2)
        f = o.d2 - ALPHA * o.d11          # u_t - alpha u_xx
        return mse_u + jnp.mean(jnp.square(f))


def run(hp=None, plot=False, save_path=None):
    hp = {**DEFAULT_HP, **(hp or {})}
    setup(hp.get("seed", 1234))
    validate(hp)
    resolve_dtype(hp)

    lb = np.array([-1.0, 0.0])
    ub = np.array([1.0, 1.0])

    # Training data: initial + boundary conditions only (the PINN
    # learns the interior from the residual).
    rng = np.random
    x0 = lb[0] + (ub[0] - lb[0]) * rng.rand(hp["N_u"] // 2, 1)
    X_ic = np.hstack([x0, np.zeros_like(x0)])
    tb = lb[1] + (ub[1] - lb[1]) * rng.rand(hp["N_u"] // 4, 1)
    X_bc = np.vstack([np.hstack([np.full_like(tb, lb[0]), tb]),
                      np.hstack([np.full_like(tb, ub[0]), tb])])
    X_u = np.vstack([X_ic, X_bc])
    u = exact(X_u)
    X_f = lb + (ub - lb) * lhs(2, hp["N_f"])

    logger = Logger(hp)
    pinn = HeatPINN(hp, logger, X_f, ub, lb)

    # Test grid.
    xs = np.linspace(lb[0], ub[0], 128)
    ts = np.linspace(lb[1], ub[1], 64)
    Xg, Tg = np.meshgrid(xs, ts)
    X_star = np.hstack([Xg.reshape(-1, 1), Tg.reshape(-1, 1)])
    u_star = exact(X_star)

    def error():
        u_pred = pinn.predict(X_star)
        return float(np.linalg.norm(u_star - u_pred, 2)
                     / np.linalg.norm(u_star, 2))

    logger.set_error_fn(error)
    pinn.fit(X_u, u)
    rel_l2 = error()
    return {"error": rel_l2, "pinn": pinn, "hp": hp}


if __name__ == "__main__":
    hp = load_hp(sys.argv, DEFAULT_HP)
    result = run(hp)
    print(f"rel-L2 error: {result['error']:.4e}")
