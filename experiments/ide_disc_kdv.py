"""Discrete-time KdV identification across two snapshots.

Beyond-reference model family: pierremtb/PINNs-TF2.0 ships only the
Burgers and Schrödinger experiments; this adds the original PINNs
paper's dispersive identification showcase on the same machinery —

    u_t + lambda1 u u_x + lambda2 u_xxx = 0,   lambda* = (1, 0.0025),

recovering (lambda1, lambda2) from the t=0.2 and t=0.8 snapshots
bridged by one q=50-stage Gauss–Legendre IRK step (dt = 0.6),
[1, 50x3, q] net of stage values, trainable lambda1 / log-lambda2,
loss = SSE to both snapshots.  Everything reuses the framework's
generic parts: the IRK tableau generator (pinn/irk.py), the order-3
Taylor-mode stage derivatives (pinn/models/mlp.py — u_xxx in the same
single pass), and the Adam→L-BFGS trainer.  The shape of the run
(two-snapshot layout, N_0/N_1 sampling, clean + 1%-noise arms, mean
relative lambda error) mirrors the reference's Burgers discrete
identification (reference 1d-burgers/ide_disc_burgers.py).  The
dataset is generated on first use by the bundled ETDRK4 spectral
solver (datagen/kdv_exact.py).

Usage: ``python experiments/ide_disc_kdv.py [hp.json]``
"""

from __future__ import annotations

import os
import sys
from typing import NamedTuple

from _common import (setup, resolve_dtype, maybe_load_params,  # noqa: F401
                     maybe_save_params, validate, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from pinn import irk
from pinn.models import mlp
from pinn.problems import kdv
from pinn.train import Trainer
from pinn.utils import Logger, load_hp

DEFAULT_HP = {
    "N_0": 199,
    "N_1": 201,
    "q": 50,
    "layers": [1, 50, 50, 50, 0],  # output width set to q at runtime
    "tf_epochs": 200,
    "tf_lr": 0.001,
    "tf_b1": 0.9,
    "tf_eps": None,
    "nt_epochs": 10000,
    "nt_lr": 0.8,
    "nt_ncorr": 50,
    "nt_line_search": "armijo",
    "log_frequency": 10,
}

IDX_T_0 = 40   # t = 0.2
IDX_T_1 = 160  # t = 0.8
LAMBDAS_STAR = (kdv.LAMBDA1_STAR, kdv.LAMBDA2_STAR)


class KdVDiscIde(NamedTuple):
    x_0: np.ndarray        # (N_0, 1)
    u_0: np.ndarray        # (N_0, 1)
    x_1: np.ndarray        # (N_1, 1)
    u_1: np.ndarray        # (N_1, 1)
    dt: float
    q: int
    IRK_alpha: np.ndarray  # (q, q)
    IRK_beta: np.ndarray   # (1, q)
    x: np.ndarray          # (nx, 1)
    t: np.ndarray          # (nt, 1)
    Exact_u: np.ndarray    # (nx, nt)


def load_dataset() -> dict:
    path = os.path.join(_REPO, "data", "KdV.npz")
    if os.path.exists(path):
        return dict(np.load(path))
    from datagen.kdv_exact import generate
    return generate(path)


def prep_data(N_0: int, N_1: int, q: int, idx_t_0: int = IDX_T_0,
              idx_t_1: int = IDX_T_1, noise: float = 0.0) -> KdVDiscIde:
    """Two-snapshot sampling with the same draw order as the Burgers
    discrete-identification prep (pinn/data.py:burgers_disc_identification):
    x-indices for t0 first, then t1, each with optional 1%-std noise."""
    d = load_dataset()
    x = d["x"].flatten()[:, None]
    t = d["tt"].flatten()[:, None]
    Exact = d["uu"]
    dt = float(t[idx_t_1, 0] - t[idx_t_0, 0])

    idx_x = np.random.choice(Exact.shape[0], N_0, replace=False)
    x_0 = x[idx_x, :]
    u_0 = Exact[idx_x, idx_t_0][:, None]
    u_0 = u_0 + noise * np.std(u_0) * np.random.randn(*u_0.shape)

    idx_x = np.random.choice(Exact.shape[0], N_1, replace=False)
    x_1 = x[idx_x, :]
    u_1 = Exact[idx_x, idx_t_1][:, None]
    u_1 = u_1 + noise * np.std(u_1) * np.random.randn(*u_1.shape)

    weights, _ = irk.irk_weights(q)
    return KdVDiscIde(x_0, u_0, x_1, u_1, dt, q, Exact_u=Exact, x=x, t=t,
                      IRK_alpha=weights[:-1, :], IRK_beta=weights[-1:, :])


def get_lambdas(params: kdv.IdeParams):
    return float(params.lambda1[0]), float(np.exp(params.log_lambda2[0]))


def train_once(hp, dtype, noise: float, logger):
    key = jax.random.PRNGKey(hp.get("seed", 1234))
    data = prep_data(hp["N_0"], hp["N_1"], hp["q"], noise=noise)
    hp["layers"] = list(hp["layers"])
    hp["layers"][-1] = data.q

    lbj = jnp.asarray([-1.0], dtype)
    ubj = jnp.asarray([1.0], dtype)
    alpha = jnp.asarray(data.IRK_alpha, dtype)
    beta = jnp.asarray(data.IRK_beta, dtype)
    batch = {"x_0": jnp.asarray(data.x_0, dtype),
             "u_0": jnp.asarray(data.u_0, dtype),
             "x_1": jnp.asarray(data.x_1, dtype),
             "u_1": jnp.asarray(data.u_1, dtype)}

    net = mlp.init_mlp(key, hp["layers"], dtype)
    params0 = kdv.init_ide_params(net, dtype)
    case = "noisy" if noise else None
    params0 = maybe_load_params(hp, params0, case)

    def loss_fn(p, b):
        return kdv.loss_disc_identification(
            p, b["x_0"], b["u_0"], b["x_1"], b["u_1"],
            lbj, ubj, data.dt, alpha, beta)

    def epoch_extra(p):
        l1, l2 = get_lambdas(p)
        return f"l1 = {l1:5f}  l2 = {l2:8f}"

    trainer = Trainer(loss_fn, params0, batch, hp, logger,
                      epoch_extra=epoch_extra)
    logger.set_error_fn(lambda: kdv.lambda_error(trainer.params))
    params = trainer.fit()
    maybe_save_params(hp, params, case)

    predict_stages = jax.jit(lambda p, x: kdv.disc_ide_stage_maps(
        p, x, lbj, ubj, data.dt, alpha, beta))
    return params, data, lbj, ubj, predict_stages


def run(hp=None, plot=False, save_path=None):
    hp = {**DEFAULT_HP, **(hp or {})}
    setup(hp.get("seed", 1234))
    validate(hp)
    if hp.get("tpu_mesh"):
        # Same decision as the other discrete/identification modes:
        # N <= 250 points with SSE losses sits far below the sharding
        # crossover (PARITY.md S2.5).
        raise ValueError("tpu_mesh is not supported by this experiment "
                         "(tiny point sets; see PARITY.md S2.5)")
    dtype = resolve_dtype(hp)
    logger = Logger(hp)

    params, data, lbj, ubj, predict_stages = train_once(
        hp, dtype, noise=0.0, logger=logger)
    l1, l2 = get_lambdas(params)
    U_0_pred, U_1_pred = (np.asarray(a) for a in predict_stages(
        params, jnp.asarray(data.x, dtype)))

    params_n, _, _, _, _ = train_once(hp, dtype, noise=0.01, logger=logger)
    l1_noisy, l2_noisy = get_lambdas(params_n)

    print("l1: ", l1)
    print("l2: ", l2)
    print("noisy l1: ", l1_noisy)
    print("noisy l2: ", l2_noisy)

    if plot:
        from viz import plot_ide_disc_results
        plot_ide_disc_results(data.x, data.t, IDX_T_0, IDX_T_1,
                              data.x_0, data.u_0, data.x_1, data.u_1,
                              np.array([1.0]), np.array([-1.0]),
                              data.Exact_u, l1, l1_noisy, l2, l2_noisy,
                              save_path=save_path or "experiments",
                              save_hp=hp, lambda2_star=kdv.LAMBDA2_STAR,
                              deriv="u_{xxx}")
    return {"params": params, "lambdas": (l1, l2),
            "lambdas_noisy": (l1_noisy, l2_noisy),
            "U_0_pred": U_0_pred, "U_1_pred": U_1_pred,
            "error": kdv.lambda_error(params), "data": data, "hp": hp}


if __name__ == "__main__":
    hp = load_hp(sys.argv, DEFAULT_HP)
    result = run(hp, plot=True)
    print(f"mean relative lambda error: {result['error']:.4e}")
