"""Continuous-time Burgers identification: discover lambda1, lambda2.

Parity target: reference 1d-burgers/ide_cont_burgers.py (implementing
its evident intent — the committed file has broken indentation, see
SURVEY.md §2.3 #2): [2, 20x8, 1] net plus trainable lambda1 (init 0)
and log-lambda2 (init -6, exp-reparameterized); N_u=2000 points over
the whole domain; residual u_t + l1 u u_x - exp(l2) u_xx evaluated at
the data points; Adam 100 @ 1e-3 then L-BFGS 500; runs clean and
1%-noise cases; error = mean relative lambda error.

Usage: ``python experiments/ide_cont_burgers.py [hp.json]``
"""

from __future__ import annotations

import sys

from _common import (setup, resolve_dtype, maybe_load_params,  # noqa: F401
                     maybe_save_params, validate)

import jax
import jax.numpy as jnp
import numpy as np

from pinn.data import burgers_cont_identification
from pinn.models import mlp
from pinn.problems import burgers
from pinn.train import Trainer
from pinn.utils import Logger, load_hp

DEFAULT_HP = {
    "N_u": 2000,
    "layers": [2, 20, 20, 20, 20, 20, 20, 20, 20, 1],
    "tf_epochs": 100,
    "tf_lr": 0.001,
    "tf_b1": 0.9,
    "tf_eps": None,
    "nt_epochs": 500,
    "nt_lr": 0.8,
    "nt_ncorr": 50,
    "nt_line_search": "armijo",  # deviation from the reference's fixed
    # step: stable for long quasi-Newton runs (the fixed step diverges
    # past a few hundred iterations; set "none" for strict parity)
    "log_frequency": 10,
}

LAMBDAS_STAR = (1.0, 0.01 / np.pi)


def get_lambdas(params: burgers.IdeParams):
    return float(params.lambda1[0]), float(np.exp(params.log_lambda2[0]))


def lambda_error(params) -> float:
    l1, l2 = get_lambdas(params)
    l1s, l2s = LAMBDAS_STAR
    return float((abs(l1 - l1s) / l1s + abs(l2 - l2s) / l2s) / 2)


def train_once(hp, dtype, noise: float, logger):
    key = jax.random.PRNGKey(hp.get("seed", 1234))
    data = burgers_cont_identification(hp["N_u"], noise=noise)
    lb = jnp.asarray(data.lb, dtype)
    ub = jnp.asarray(data.ub, dtype)
    batch = {"X_u": jnp.asarray(data.X_u_train, dtype),
             "u": jnp.asarray(data.u_train, dtype)}

    net = mlp.init_mlp(key, hp["layers"], dtype)
    params0 = burgers.init_ide_params(net, dtype)
    case = "noisy" if noise else None
    params0 = maybe_load_params(hp, params0, case)

    if hp.get("fused_residual"):
        # Fused Pallas identification kernel: loss + net grads + both
        # lambda adjoints in one launch per step (pallas_train
        # .make_burgers_ide_loss).  f32 only — the XLA path covers f64.
        if dtype != jnp.float32:
            raise ValueError("fused_residual requires dtype=float32 "
                             "(the XLA path covers f64)")
        from pinn.ops.pallas_train import make_burgers_ide_loss
        sdt = ("bfloat16" if str(hp["fused_residual"]).lower()
               in ("bf16", "bfloat16") else None)
        loss_fn = make_burgers_ide_loss(
            lb, ub, interpret=jax.default_backend() != "tpu",
            stream_dtype=sdt)
    else:
        def loss_fn(p, b):
            return burgers.loss_cont_identification(p, b["X_u"], b["u"],
                                                    lb, ub)

    def epoch_extra(p):
        l1, l2 = get_lambdas(p)
        return f"l1 = {l1:5f}  l2 = {l2:8f}"

    trainer = Trainer(loss_fn, params0, batch, hp, logger,
                      epoch_extra=epoch_extra)
    logger.set_error_fn(lambda: lambda_error(trainer.params))
    params = trainer.fit()
    maybe_save_params(hp, params, case)
    return params, data, lb, ub


def run(hp=None, plot=False, save_path=None):
    hp = {**DEFAULT_HP, **(hp or {})}
    setup(hp.get("seed", 1234))
    validate(hp)
    if hp.get("tpu_mesh"):
        # Deliberately unsupported: the residual is evaluated at the
        # N_u=2,000 data points (no separate collocation set, reference
        # ide_cont_burgers.py:56) — far below the ~1e5 points where
        # sharding starts to pay (SCALING.md); see PARITY.md S2.5.
        raise ValueError("tpu_mesh is not supported by this experiment "
                         "(tiny point sets; see PARITY.md S2.5)")
    dtype = resolve_dtype(hp)
    logger = Logger(hp)

    params, data, lb, ub = train_once(hp, dtype, noise=0.0, logger=logger)
    l1, l2 = get_lambdas(params)

    params_n, _, _, _ = train_once(hp, dtype, noise=0.01, logger=logger)
    l1_noisy, l2_noisy = get_lambdas(params_n)

    print("l1: ", l1)
    print("l2: ", l2)
    print("l1_noise: ", l1_noisy)
    print("l2_noise: ", l2_noisy)

    predict_u = jax.jit(lambda p, X: mlp.apply(p.net, X, lb, ub))
    X_star = jnp.asarray(data.X_star, dtype)
    u_pred = np.asarray(predict_u(params, X_star))

    if plot:
        from viz import plot_ide_cont_results
        plot_ide_cont_results(data.X_star, u_pred, data.X_u_train,
                              data.u_train, data.Exact_u, data.X, data.T,
                              data.x, data.t, l1, l1_noisy, l2, l2_noisy,
                              save_path=save_path or "experiments",
                              save_hp=hp)
    return {"params": params, "lambdas": (l1, l2),
            "lambdas_noisy": (l1_noisy, l2_noisy),
            "error": lambda_error(params), "u_pred": u_pred,
            "data": data, "hp": hp}


if __name__ == "__main__":
    hp = load_hp(sys.argv, DEFAULT_HP)
    result = run(hp, plot=True)
    print(f"mean relative lambda error: {result['error']:.4e}")
