"""2D Navier–Stokes identification: discover lambda1 (advection) and
lambda2 (viscosity) from velocity samples of the Taylor–Green vortex.

Beyond-reference model family (the reference ships Burgers and
Schrödinger only): the original PINNs paper's flagship system
identification (Raissi et al. 2019 §4.1.1), rebuilt on this repo's own
pseudo-spectral DNS (datagen/navierstokes_spectral.py, decaying 2D
turbulence) instead of the paper's external CFD file.  hp
``dataset: "taylor-green"`` switches to the exact analytic vortex
(datagen/navierstokes_exact.py) — useful for lambda2/viscosity checks,
but note lambda1 is structurally NON-identifiable there (its advection
term is a pure pressure gradient; see the spectral module docstring).
The experiment contract mirrors the continuous
Burgers identification (reference 1d-burgers/ide_cont_burgers.py):
[3, 20x8, 2] psi–p net plus raw trainables lambda1, lambda2 (init 0);
N_u points sampled over the space-time box; Adam warmup then L-BFGS;
clean and 1%-noise cases; error = mean relative lambda error.

Usage: ``python experiments/ide_cont_navierstokes.py [hp.json]``
"""

from __future__ import annotations

import sys

from _common import (setup, resolve_dtype, maybe_load_params,  # noqa: F401
                     maybe_save_params, validate)

import jax
import jax.numpy as jnp
import numpy as np

from datagen.navierstokes_exact import NU_STAR
from datagen import navierstokes_exact, navierstokes_spectral
from pinn.models import mlp
from pinn.problems import navierstokes as ns
from pinn.train import Trainer
from pinn.utils import Logger, load_hp

DEFAULT_HP = {
    "N_u": 5000,
    "layers": [3, 20, 20, 20, 20, 20, 20, 20, 20, 2],
    "tf_epochs": 100,
    "tf_lr": 0.001,
    "tf_b1": 0.9,
    "tf_eps": None,
    "nt_epochs": 500,
    "nt_lr": 0.8,
    "nt_ncorr": 50,
    "nt_line_search": "armijo",
    "log_frequency": 10,
}

LAMBDAS_STAR = (1.0, NU_STAR)


def get_lambdas(params: ns.NSIdeParams):
    return float(params.lambda1[0]), float(params.lambda2[0])


def lambda_error(params) -> float:
    l1, l2 = get_lambdas(params)
    l1s, l2s = LAMBDAS_STAR
    return float((abs(l1 - l1s) / l1s + abs(l2 - l2s) / l2s) / 2)


def sample_training_set(data, N_u: int, noise: float, rng):
    """N_u random space-time samples of (u, v); optional 1% noise —
    the reference's noisy-case contract (ide_cont_burgers.py)."""
    idx = rng.choice(data.X_star.shape[0], N_u, replace=False)
    X = data.X_star[idx]
    u = data.u_star[idx]
    v = data.v_star[idx]
    if noise:
        u = u + noise * u.std() * rng.standard_normal(u.shape)
        v = v + noise * v.std() * rng.standard_normal(v.shape)
    return X, u, v


def train_once(hp, dtype, data, noise: float, logger):
    key = jax.random.PRNGKey(hp.get("seed", 1234))
    rng = np.random.default_rng(hp.get("seed", 1234))
    X, u, v = sample_training_set(data, hp["N_u"], noise, rng)
    lb = jnp.asarray(data.lb, dtype)
    ub = jnp.asarray(data.ub, dtype)
    batch = {"X": jnp.asarray(X, dtype),
             "u": jnp.asarray(u, dtype),
             "v": jnp.asarray(v, dtype)}
    X_f = None
    if hp.get("N_f"):
        # Separate residual collocation set (round-5 λ-bias lever, see
        # pinn.problems.navierstokes.loss_identification): data points
        # plus an LHS draw over the space-time box, so the residual set
        # is a strict superset of the Raissi-style data-points-only one.
        from pinn.data import lhs
        rs = np.random.RandomState(hp.get("seed", 1234) + 7919)
        draw = data.lb + (data.ub - data.lb) * lhs(3, hp["N_f"], rs)
        X_f = jnp.asarray(np.vstack([X, draw]), dtype)
        batch["X_f"] = X_f

    net = mlp.init_mlp(key, hp["layers"], dtype)
    params0 = ns.init_ide_params(net, dtype)
    case = "noisy" if noise else None
    params0 = maybe_load_params(hp, params0, case)

    if hp.get("net_impl") == "df32":
        # Compensated-f32 refinement engine (pinn/ops/df32.py): the
        # TPU-native replacement for the emulated-f64 warm-start tail —
        # NS is the family with the most wall-clock behind that tail
        # (8k f64 iters over 13 Taylor streams, RESULTS.md NS rows).
        if dtype != jnp.float64:
            raise ValueError("net_impl='df32' requires dtype=float64")
        if jax.default_backend() == "cpu":
            print("WARNING: net_impl='df32' on CPU degrades to ~f32 "
                  "accuracy under jit; drop net_impl on CPU — native "
                  "float64 is faster and more accurate there")
        from pinn.ops.df32 import make_ns_ide_loss_df32

        _df32_loss = make_ns_ide_loss_df32(np.asarray(data.lb),
                                           np.asarray(data.ub))

        def loss_fn(p, b):
            return _df32_loss(p, b)
    else:
        def loss_fn(p, b):
            return ns.loss_identification(p, b["X"], b["u"], b["v"],
                                          lb, ub, X_f=b.get("X_f"))

    def epoch_extra(p):
        l1, l2 = get_lambdas(p)
        return f"l1 = {l1:5f}  l2 = {l2:8f}"

    val_fn = None
    if hp.get("nt_val_every"):
        # Label-free-in-the-identification-sense validation: the same
        # loss on an independent draw of measured (u, v) samples (same
        # noise level as training) — the λ targets are never touched.
        # Feeds the Trainer's best-iterate selection (pinn/train.py).
        X_v, u_v, v_v = sample_training_set(data, min(hp["N_u"], 5000),
                                            noise, rng)
        bv = {"X": jnp.asarray(X_v, dtype), "u": jnp.asarray(u_v, dtype),
              "v": jnp.asarray(v_v, dtype)}
        _val = jax.jit(lambda p: ns.loss_identification(
            p, bv["X"], bv["u"], bv["v"], lb, ub))

        def val_fn(p):
            return float(_val(p))

    trainer = Trainer(loss_fn, params0, batch, hp, logger,
                      epoch_extra=epoch_extra, val_fn=val_fn)
    logger.set_error_fn(lambda: lambda_error(trainer.params))
    params = trainer.fit()
    maybe_save_params(hp, params, case)
    return params


def field_errors(params, data, dtype, chunk: int = 16384):
    """Relative L2 of (u, v) and gauge-adjusted p on the full grid."""
    lb = jnp.asarray(data.lb, dtype)
    ub = jnp.asarray(data.ub, dtype)
    pred = jax.jit(lambda X: ns.predict_uvp(params.net, X, lb, ub))
    us, vs, ps = [], [], []
    for i in range(0, data.X_star.shape[0], chunk):
        X = jnp.asarray(data.X_star[i:i + chunk], dtype)
        u, v, p = pred(X)
        us.append(np.asarray(u)); vs.append(np.asarray(v))
        ps.append(np.asarray(p))
    u = np.concatenate(us); v = np.concatenate(vs); p = np.concatenate(ps)

    def rel(a, b):
        return float(np.linalg.norm(a - b) / np.linalg.norm(b))

    # Pressure enters the PDE only through its gradient: remove the gauge
    # constant before comparing (Raissi et al. 2019 §4.1.1 does the same).
    p_adj = p - p.mean() + data.p_star.mean()
    return {"u": rel(u, data.u_star), "v": rel(v, data.v_star),
            "p": rel(p_adj, data.p_star)}, (u, v, p_adj)


def run(hp=None, plot=False, save_path=None):
    hp = {**DEFAULT_HP, **(hp or {})}
    setup(hp.get("seed", 1234))
    validate(hp)
    if hp.get("tpu_mesh"):
        raise ValueError("tpu_mesh is not supported by this experiment "
                         "(residual at the N_u data points only; see "
                         "PARITY.md S2.5)")
    dtype = resolve_dtype(hp)
    logger = Logger(hp)
    if hp.get("dataset", "spectral") == "taylor-green":
        data = navierstokes_exact.generate(
            nx=hp.get("grid_nx", 64), ny=hp.get("grid_ny", 64),
            nt=hp.get("grid_nt", 21), t_max=hp.get("t_max", 2.0))
    else:
        data = navierstokes_spectral.generate(
            nx=hp.get("grid_nx", 128), ny=hp.get("grid_ny", 128),
            nt=hp.get("grid_nt", 41), t_max=hp.get("t_max", 2.0))

    params = train_once(hp, dtype, data, noise=0.0, logger=logger)
    l1, l2 = get_lambdas(params)

    params_n = train_once(hp, dtype, data, noise=0.01, logger=logger)
    l1_noisy, l2_noisy = get_lambdas(params_n)

    print("l1: ", l1)
    print("l2: ", l2)
    print("l1_noise: ", l1_noisy)
    print("l2_noise: ", l2_noisy)

    errs, (u_pred, v_pred, p_pred) = field_errors(params, data, dtype)
    print(f"rel-L2  u: {errs['u']:.4e}  v: {errs['v']:.4e}  "
          f"p (gauge-adjusted): {errs['p']:.4e}")

    if plot:
        from viz import plot_ide_navierstokes_results
        plot_ide_navierstokes_results(
            data, u_pred, v_pred, p_pred, l1, l1_noisy, l2, l2_noisy,
            save_path=save_path or "experiments", save_hp=hp)
    return {"params": params, "lambdas": (l1, l2),
            "lambdas_noisy": (l1_noisy, l2_noisy),
            "error": lambda_error(params), "field_errors": errs,
            "data": data, "hp": hp}


if __name__ == "__main__":
    hp = load_hp(sys.argv, DEFAULT_HP)
    result = run(hp, plot=True)
    print(f"mean relative lambda error: {result['error']:.4e}")
