"""PINN vs plain-NN benchmark for continuous Burgers inference.

Parity target: reference 1d-burgers/inf_cont_burgers_bench.py — train
the PINN once (timing it), then train plain data-MSE networks at
several data sizes, and render rel-L2-error-vs-data-size curves
annotated with wall-clock durations (the reference's notion of a
benchmark, SURVEY.md §3.5).  The reference file has latent bugs
(``N_u = ["N_u"]`` etc.); the evident intent is implemented.

Usage: ``python experiments/inf_cont_burgers_bench.py [--quick]``
"""

from __future__ import annotations

import sys
import time

from _common import setup, resolve_dtype  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

import inf_cont_burgers
from pinn.data import burgers_cont_identification
from pinn.models import mlp
from pinn.train import Trainer
from pinn.utils import Logger

QUICK = "--quick" in sys.argv

# Data sizes scanned by the reference (inf_cont_burgers_bench.py:54-89).
NU_DOMAIN = [50, 200, 400] if QUICK else [50, 200, 400, 1000, 2000]
NU_BOUNDARY = [50, 100] if QUICK else [50, 100, 200]


def train_plain_nn(N_u: int, boundary_only: bool, hp, dtype):
    """Plain Keras-style MSE regression net: same arch, no residual."""
    setup(1234)
    if boundary_only:
        from pinn.data import burgers_cont_inference
        d = burgers_cont_inference(N_u, N_f=10)
    else:
        d = burgers_cont_identification(N_u)
    lb, ub = jnp.asarray(d.lb, dtype), jnp.asarray(d.ub, dtype)
    batch = {"X_u": jnp.asarray(d.X_u_train, dtype),
             "u": jnp.asarray(d.u_train, dtype)}
    net = mlp.init_mlp(jax.random.PRNGKey(1234), hp["layers"], dtype)

    def loss_fn(p, b):
        u_pred = mlp.apply(p, b["X_u"], lb, ub)
        return jnp.mean(jnp.square(b["u"] - u_pred))

    t0 = time.time()
    trainer = Trainer(loss_fn, net, batch, hp, logger=None)
    params = trainer.fit()
    dur = time.time() - t0

    X_star = jnp.asarray(d.X_star, dtype)
    u_pred = np.asarray(jax.jit(lambda p, X: mlp.apply(p, X, lb, ub))(
        params, X_star))
    err = float(np.linalg.norm(d.u_star - u_pred, 2)
                / np.linalg.norm(d.u_star, 2))
    return err, dur


def main():
    hp_pinn = dict(inf_cont_burgers.DEFAULT_HP)
    if QUICK:
        hp_pinn.update(tf_epochs=50, nt_epochs=100)
    else:
        # Convergence-grade schedule (mixed precision; see RESULTS.md) —
        # the reference's default 100+200 epochs stops at ~0.36 rel-L2.
        hp_pinn.update(tf_epochs=1000, nt_epochs=5000,
                       nt_vector_dtype="float64", log_frequency=10**6)
    dtype = resolve_dtype(hp_pinn)

    t0 = time.time()
    res = inf_cont_burgers.run(hp_pinn, plot=False)
    pinn_time = time.time() - t0
    pinn_err = res["error"]
    print(f"PINN: rel-L2 {pinn_err:.4e} in {pinn_time:.1f}s "
          f"(N_u={hp_pinn['N_u']} boundary pts + {hp_pinn['N_f']} "
          f"collocation)")

    hp_nn = {**hp_pinn, "nt_epochs": 0,
             "tf_epochs": 200 if QUICK else 1000, "tf_lr": 1e-3}
    errs_dom, durs_dom = [], []
    for n in NU_DOMAIN:
        e, dur = train_plain_nn(n, boundary_only=False, hp=hp_nn, dtype=dtype)
        errs_dom.append(e)
        durs_dom.append(dur)
        print(f"NN (domain data)   N_u={n:5d}: rel-L2 {e:.4e} in {dur:.1f}s")
    errs_bnd, durs_bnd = [], []
    for n in NU_BOUNDARY:
        e, dur = train_plain_nn(n, boundary_only=True, hp=hp_nn, dtype=dtype)
        errs_bnd.append(e)
        durs_bnd.append(dur)
        print(f"NN (boundary data) N_u={n:5d}: rel-L2 {e:.4e} in {dur:.1f}s")

    import matplotlib.pyplot as plt
    from pinn.utils.plotting import newfig, save_result_dir
    fig, ax = newfig(1.2)
    ax.loglog(NU_DOMAIN, errs_dom, "o-", label="NN, domain data")
    ax.loglog(NU_BOUNDARY, errs_bnd, "s-", label="NN, boundary data only")
    ax.axhline(pinn_err, color="r", linestyle="--",
               label=f"PINN ({hp_pinn['N_u']} bnd pts, {pinn_time:.0f}s)")
    for n, e, dur in zip(NU_DOMAIN, errs_dom, durs_dom):
        ax.annotate(f"{dur:.0f}s", (n, e), fontsize=7,
                    textcoords="offset points", xytext=(4, 4))
    ax.set_xlabel("$N_u$ (training data size)")
    ax.set_ylabel("rel-$L_2$ error")
    ax.legend(frameon=False, fontsize=8)
    ax.set_title("Burgers: PINN vs plain NN", fontsize=10)
    save_result_dir("experiments", {"bench": "inf_cont_burgers",
                                    "quick": QUICK})

    # 3D training-set scatter views (reference
    # inf_cont_burgers_bench.py:111-136): the domain-sampled NN data set
    # and the boundary/initial + collocation PINN data set.
    from pinn.data import burgers_cont_identification, burgers_cont_inference
    np.random.seed(1234)
    d_dom = burgers_cont_identification(2000)
    np.random.seed(1234)
    d_bnd = burgers_cont_inference(100, 1000)
    for d, name in ((d_dom, "burgers_data_domain"),
                    (d_bnd, "burgers_data_inibnd")):
        fig = plt.figure(figsize=(5, 4))
        ax3 = fig.add_subplot(projection="3d")
        ax3.scatter(d.X_u_train[:, 0], d.X_u_train[:, 1],
                    d.u_train.ravel(), s=4)
        ax3.set_xlabel("x")
        ax3.set_ylabel("t")
        ax3.set_zlabel("u(x, t)")
        save_result_dir("experiments", {"bench": name})


if __name__ == "__main__":
    main()
