"""Identification benchmark: PINN vs plain NN + finite differences.

Parity target: reference 1d-burgers/ide_cont_burgers_bench.py — train
the identification PINN, train a plain NN surface on the same data,
then recover the PDE coefficients from the NN surface by numerical
differentiation (the reference scans residual MSE over a 1-D lambda
grid, :89-125; here the full (lambda1, lambda2) pair is recovered by
linear least squares on the grid derivatives, which subsumes the scan).

Usage: ``python experiments/ide_cont_burgers_bench.py [--quick]``
"""

from __future__ import annotations

import sys
import time

from _common import setup, resolve_dtype  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

import ide_cont_burgers
from pinn.data import burgers_cont_identification
from pinn.models import mlp
from pinn.train import Trainer

QUICK = "--quick" in sys.argv
NU_TRUE = 0.01 / np.pi


def train_plain_nn_surface(N_u, hp, dtype):
    setup(1234)
    d = burgers_cont_identification(N_u)
    lb, ub = jnp.asarray(d.lb, dtype), jnp.asarray(d.ub, dtype)
    batch = {"X_u": jnp.asarray(d.X_u_train, dtype),
             "u": jnp.asarray(d.u_train, dtype)}
    net = mlp.init_mlp(jax.random.PRNGKey(1234), hp["layers"], dtype)

    def loss_fn(p, b):
        return jnp.mean(jnp.square(
            b["u"] - mlp.apply(p, b["X_u"], lb, ub)))

    trainer = Trainer(loss_fn, net, batch, hp, logger=None)
    params = trainer.fit()
    X_star = jnp.asarray(d.X_star, dtype)
    U = np.asarray(jax.jit(lambda p, X: mlp.apply(p, X, lb, ub))(
        params, X_star))
    nt, nx = d.T.shape
    return U.reshape(nt, nx), d


def fd_identify(U_grid, x, t):
    """Least-squares (lambda1, lambda2) from numpy grid derivatives
    (generalizes the reference's 1-D residual-MSE scan, :89-125)."""
    dx = float(x[1] - x[0])
    dtv = float(t[1] - t[0])
    u_t = np.gradient(U_grid, dtv, axis=0)
    u_x = np.gradient(U_grid, dx, axis=1)
    u_xx = np.gradient(u_x, dx, axis=1)
    # u_t + l1 u u_x - l2 u_xx = 0  =>  [u u_x, -u_xx] @ [l1, l2] = -u_t
    interior = np.s_[2:-2, 2:-2]
    A = np.stack([(U_grid * u_x)[interior].ravel(),
                  (-u_xx)[interior].ravel()], axis=1)
    b = -u_t[interior].ravel()
    sol, *_ = np.linalg.lstsq(A, b, rcond=None)
    return float(sol[0]), float(sol[1])


def main():
    hp = dict(ide_cont_burgers.DEFAULT_HP)
    if QUICK:
        hp.update(tf_epochs=50, nt_epochs=100, N_u=500)
    else:
        # Convergence-grade schedule (see RESULTS.md).
        hp.update(tf_epochs=1000, nt_epochs=5000,
                  nt_vector_dtype="float64", log_frequency=10**6)
    dtype = resolve_dtype(hp)

    t0 = time.time()
    from pinn.utils import Logger
    logger = Logger({**hp, "log_frequency": 10 ** 9})
    params, d, lbj, ubj = ide_cont_burgers.train_once(
        hp, dtype, noise=0.0, logger=logger)
    l1_pinn, l2_pinn = ide_cont_burgers.get_lambdas(params)
    pinn_time = time.time() - t0
    print(f"PINN identified: l1={l1_pinn:.5f} l2={l2_pinn:.7f} "
          f"(true 1.0, {NU_TRUE:.7f}) in {pinn_time:.1f}s")

    hp_nn = {**hp, "nt_epochs": 0, "tf_epochs": 200 if QUICK else 2000,
             "tf_lr": 1e-3}
    t0 = time.time()
    U_grid, d2 = train_plain_nn_surface(hp["N_u"], hp_nn, dtype)
    l1_fd, l2_fd = fd_identify(U_grid, d2.x.ravel(), d2.t.ravel())
    fd_time = time.time() - t0
    print(f"NN+FD identified: l1={l1_fd:.5f} l2={l2_fd:.7f} in {fd_time:.1f}s")

    err_pinn = (abs(l1_pinn - 1.0) + abs(l2_pinn - NU_TRUE) / NU_TRUE) / 2
    err_fd = (abs(l1_fd - 1.0) + abs(l2_fd - NU_TRUE) / NU_TRUE) / 2
    print(f"mean rel lambda error: PINN {err_pinn:.3e}  NN+FD {err_fd:.3e}")

    import matplotlib.pyplot as plt
    from pinn.utils.plotting import newfig, save_result_dir
    fig, ax = newfig(1.2)
    labels = ["$\\lambda_1$ (true 1)", "$\\lambda_2/\\nu$ (true 1)"]
    width = 0.35
    xpos = np.arange(2)
    ax.bar(xpos - width / 2, [l1_pinn, l2_pinn / NU_TRUE], width,
           label=f"PINN ({pinn_time:.0f}s)")
    ax.bar(xpos + width / 2, [l1_fd, l2_fd / NU_TRUE], width,
           label=f"NN + finite differences ({fd_time:.0f}s)")
    ax.axhline(1.0, color="k", linewidth=0.8, linestyle=":")
    ax.set_xticks(xpos)
    ax.set_xticklabels(labels)
    ax.legend(frameon=False, fontsize=8)
    ax.set_title("Burgers identification: PINN vs NN+FD", fontsize=10)
    save_result_dir("experiments", {"bench": "ide_cont_burgers",
                                    "quick": QUICK})


if __name__ == "__main__":
    main()
