"""Discrete-time Burgers inference with q-stage IRK time stepping.

Parity target: reference 1d-burgers/inf_disc_burgers.py — [1, 50x3,
q+1] net mapping x to the q IRK stage values + the t1 solution; q=500,
N_n=250 points of the t=t10 snapshot; backward IRK map
U_0 = U_1 + dt (U U_x - nu U_xx) Wᵀ; loss = SSE(t0 data) +
SSE(boundary); Adam 200 @ 1e-3 then L-BFGS 1000; error = rel-L2 of the
predicted t1 snapshot.

Usage: ``python experiments/inf_disc_burgers.py [hp.json]``
"""

from __future__ import annotations

import sys

from _common import (setup, resolve_dtype, maybe_load_params,  # noqa: F401
                     maybe_save_params, validate)

import jax
import jax.numpy as jnp
import numpy as np

from pinn.data import burgers_disc_inference
from pinn.models import mlp
from pinn.problems import burgers
from pinn.train import Trainer
from pinn.utils import Logger, load_hp

DEFAULT_HP = {
    "N_n": 250,
    "q": 500,
    "layers": [1, 50, 50, 50, 501],
    "tf_epochs": 200,
    "tf_lr": 0.001,
    "tf_b1": 0.9,
    "tf_eps": 1e-8,
    "nt_epochs": 1000,
    "nt_lr": 0.8,
    "nt_ncorr": 50,
    "nt_line_search": "armijo",  # deviation from the reference's fixed
    # step: stable for long quasi-Newton runs (the fixed step diverges
    # past a few hundred iterations; set "none" for strict parity)
    "log_frequency": 10,
}

IDX_T_0 = 10
IDX_T_1 = 90


def run(hp=None, plot=False, save_path=None):
    hp = {**DEFAULT_HP, **(hp or {})}
    key = setup(hp.get("seed", 1234))
    validate(hp)
    if hp.get("tpu_mesh"):
        # Deliberately unsupported: this experiment trains on N <= 250
        # points with SSE losses — an 8-way shard of that axis spends
        # more on collectives than the sub-millisecond local matmuls it
        # saves, and the q-stage IRK coupling is a local MXU matmul by
        # design (PARITY.md S2.5).  The continuous-inference
        # experiments are the sharded ones.
        raise ValueError("tpu_mesh is not supported by this experiment "
                         "(tiny point sets; see PARITY.md S2.5)")
    hp["layers"] = list(hp["layers"])
    hp["layers"][-1] = hp["q"] + 1
    dtype = resolve_dtype(hp)

    lb = np.array([-1.0])
    ub = np.array([1.0])
    nu = 0.01 / np.pi
    data = burgers_disc_inference(hp["N_n"], hp["q"], lb, ub,
                                  IDX_T_0, IDX_T_1)
    lbj = jnp.asarray(lb, dtype)
    ubj = jnp.asarray(ub, dtype)
    irk_w = jnp.asarray(data.IRK_weights, dtype)
    batch = {"x_0": jnp.asarray(data.x_0, dtype),
             "u_0": jnp.asarray(data.u_0, dtype),
             "x_1": jnp.asarray(data.x_1, dtype)}

    net = mlp.init_mlp(key, hp["layers"], dtype)
    net = maybe_load_params(hp, net)

    if hp.get("net_impl") == "df32":
        # Compensated-f32 refinement engine (pinn/ops/df32.py) for the
        # D1-style warm-start tails — replaces the emulated-f64 stage.
        if dtype != jnp.float64:
            raise ValueError("net_impl='df32' requires dtype=float64")
        from pinn.ops.df32 import make_burgers_disc_inf_loss_df32

        _df32_loss = make_burgers_disc_inf_loss_df32(
            lb, ub, nu, data.dt, data.IRK_weights)

        def loss_fn(p, b):
            return _df32_loss(p, b)
    else:
        def loss_fn(p, b):
            return burgers.loss_disc_inference(
                p, b["x_0"], b["u_0"], b["x_1"], lbj, ubj, nu, data.dt,
                irk_w)

    # Prediction: the network's last output column is u(t1, x)
    # (reference inf_disc_burgers.py:125-127).
    predict_u1 = jax.jit(lambda p, x: mlp.apply(p, x, lbj, ubj)[:, -1])

    logger = Logger(hp)
    trainer = Trainer(loss_fn, net, batch, hp, logger)
    x_star = jnp.asarray(data.x_star, dtype)

    def error():
        u_pred = np.asarray(predict_u1(trainer.params, x_star))
        return float(np.linalg.norm(u_pred - data.u_star, 2)
                     / np.linalg.norm(data.u_star, 2))

    logger.set_error_fn(error)
    params = trainer.fit()
    maybe_save_params(hp, params)
    u_1_pred = np.asarray(predict_u1(params, x_star))
    rel_l2 = error()

    if plot:
        from viz import plot_inf_disc_results
        plot_inf_disc_results(data.x_star, IDX_T_0, IDX_T_1, data.x_0,
                              data.u_0, ub, lb, u_1_pred, data.Exact_u,
                              data.x, data.t,
                              save_path=save_path or "experiments",
                              save_hp=hp)
    return {"params": params, "u_1_pred": u_1_pred, "error": rel_l2,
            "data": data, "hp": hp}


if __name__ == "__main__":
    hp = load_hp(sys.argv, DEFAULT_HP)
    result = run(hp, plot=True)
    print(f"rel-L2 error (t1 snapshot): {result['error']:.4e}")
