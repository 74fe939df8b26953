"""Continuous-time 1D Burgers inference.

Parity target: reference 1d-burgers/inf_cont_burgers.py — [2, 20x8, 1]
tanh MLP, N_u=100 boundary/initial data points, N_f=10,000 LHS
collocation points, loss = MSE(data) + MSE(u_t + u u_x - nu u_xx),
nu = 0.01/pi, Adam 100 @ lr .03 then L-BFGS 200 @ lr .8, rel-L2 error
against the exact solution on the full grid.

Usage: ``python experiments/inf_cont_burgers.py [hp.json]``
"""

from __future__ import annotations

import sys

from _common import (setup, resolve_dtype, maybe_load_params,  # noqa: F401
                     maybe_save_params, validate)

import jax
import jax.numpy as jnp
import numpy as np

from pinn.data import burgers_cont_inference, lhs
from pinn.models import mlp
from pinn.problems import burgers
from pinn.train import Trainer
from pinn.utils import Logger, load_hp

DEFAULT_HP = {
    "N_u": 100,
    "N_f": 10000,
    "layers": [2, 20, 20, 20, 20, 20, 20, 20, 20, 1],
    "tf_epochs": 100,
    "tf_lr": 0.03,
    "tf_b1": 0.9,
    "tf_eps": None,
    "nt_epochs": 200,
    "nt_lr": 0.8,
    "nt_ncorr": 50,
    "nt_line_search": "armijo",  # deviation from the reference's fixed
    # step: stable for long quasi-Newton runs (the fixed step diverges
    # past a few hundred iterations; set "none" for strict parity)
    "log_frequency": 10,
}


def run(hp=None, plot=False, save_path=None):
    hp = {**DEFAULT_HP, **(hp or {})}
    key = setup(hp.get("seed", 1234))
    validate(hp)
    dtype = resolve_dtype(hp)

    if hp.get("rar_pool") and int(hp["rar_pool"]) < hp["N_f"]:
        raise ValueError(
            f"rar_pool ({hp['rar_pool']}) must be >= N_f ({hp['N_f']}): "
            "the RAR draw keeps N_f points out of the candidate pool")

    data = burgers_cont_inference(hp["N_u"], hp["N_f"])
    lb = jnp.asarray(data.lb, dtype)
    ub = jnp.asarray(data.ub, dtype)
    X_u = jnp.asarray(data.X_u_train, dtype)
    u = jnp.asarray(data.u_train, dtype)
    X_f = jnp.asarray(data.X_f, dtype)
    X_star = jnp.asarray(data.X_star, dtype)
    nu = 0.01 / np.pi

    # hp["init_seed"]: decouple the weight init from the data seed —
    # multi-start drivers vary the init while keeping the train set
    # fixed (the basin lottery is decided at init; see tune_burgers P8).
    if hp.get("init_seed") is not None:
        key = jax.random.PRNGKey(int(hp["init_seed"]))
    net = mlp.init_mlp(key, hp["layers"], dtype)
    net = maybe_load_params(hp, net)

    # hp["tpu_mesh"]: shard the collocation axis over the first N
    # devices (true/0 = all).  Collocation points are padded to the
    # mesh size with masked weights so the loss is bit-equal to the
    # unsharded run (SURVEY.md §2.5 DP row).
    mesh, f_w = None, None
    if hp.get("tpu_mesh"):
        from pinn.parallel import make_mesh, pad_points_with_weights
        req = hp["tpu_mesh"]
        mesh = make_mesh(None if req is True else int(req))

        if not hp.get("fused_residual"):
            # XLA mesh path: pad the collocation axis with zero-weight
            # rows so any N_f divides the mesh.  The fused DP path has
            # no weight rows; it requires N_f % devices == 0 instead
            # (checked inside make_burgers_loss_dp).
            Xp, w = pad_points_with_weights(np.asarray(data.X_f),
                                            mesh.devices.size)
            X_f, f_w = jnp.asarray(Xp, dtype), jnp.asarray(w, dtype)

    batch = {"X_u": X_u, "u": u, "X_f": X_f}
    if f_w is not None:
        batch["f_w"] = f_w

    adam_loss_fn = None  # optional warmup-phase loss (bf16 streams)
    if hp.get("fused_residual"):
        # Fused Pallas forward+backward residual kernel (f32): one VMEM
        # pass per point tile, no HBM activation traffic — the
        # throughput path for large N_f (SCALING.md).  With tpu_mesh it
        # composes via shard_map: one kernel launch per device per
        # step, gradients psum'd over ICI (make_burgers_loss_dp).
        if dtype != jnp.float32:
            raise ValueError("fused_residual requires dtype=float32 "
                             "(the XLA path covers f64)")
        from pinn.ops.pallas_train import (make_burgers_loss,
                                           make_burgers_loss_dp)
        # fused_residual: True = exact f32 streams; "bf16"/"bfloat16" =
        # bf16 streams with f32 accumulation (warmup-grade precision).
        sdt = ("bfloat16" if str(hp["fused_residual"]).lower()
               in ("bf16", "bfloat16") else None)
        interp = jax.default_backend() != "tpu"

        def build_fused(stream):
            if mesh is not None:
                return make_burgers_loss_dp(lb, ub, nu, mesh,
                                            interpret=interp,
                                            stream_dtype=stream)
            return make_burgers_loss(lb, ub, nu, interpret=interp,
                                     stream_dtype=stream)

        loss_fn = build_fused(sdt)
        if str(hp.get("tf_net_dtype", "")).lower() in ("bf16", "bfloat16"):
            # bf16 warmup on the fused path: the Adam phase optimizes
            # the bf16-STREAM variant of the same kernel (f32 master
            # weights in/out — the fused custom_vjp emits f32 gradients,
            # so the AdamRunner cast wrapper must not also quantize the
            # params); L-BFGS keeps the exact kernel.
            adam_loss_fn = build_fused("bfloat16")
            hp = {k: v for k, v in hp.items() if k != "tf_net_dtype"}
    elif hp.get("net_impl") == "df32":
        # Double-f32 extended-precision engine (pinn/ops/df32.py): the
        # TPU-native replacement for the emulated-f64 refinement stage.
        # Params/iterate stay float64 (codec, checkpoints, L-BFGS
        # vector algebra unchanged); the network/residual evaluation
        # runs in compensated f32 pairs on the VPU.
        if dtype != jnp.float64:
            raise ValueError("net_impl='df32' requires dtype=float64 "
                             "(the f64 iterate is what df32 refines)")
        if mesh is not None:
            raise ValueError("net_impl='df32' is single-chip "
                             "(refinement stages; see df32.py)")
        if jax.default_backend() == "cpu":
            # CPU jit breaks the error-free transforms (fusion-emitter
            # FMA contraction — df32.py docstring); native f64 is the
            # right CPU engine.  Allowed for wiring smoke tests only.
            print("WARNING: net_impl='df32' on CPU degrades to ~f32 "
                  "accuracy under jit; drop net_impl on CPU — native "
                  "float64 is faster and more accurate there")
        from pinn.ops.df32 import make_burgers_loss_df32

        _df32_loss = make_burgers_loss_df32(np.asarray(data.lb),
                                            np.asarray(data.ub), nu)

        def loss_fn(p, b):
            return _df32_loss(p, b)
    else:
        def loss_fn(p, b):
            return burgers.loss_cont_inference(p, b["X_u"], b["u"],
                                               b["X_f"], lb, ub, nu,
                                               f_weights=b.get("f_w"))

    predict_u = jax.jit(lambda p, X: mlp.apply(p, X, lb, ub))
    residual_f = jax.jit(lambda p, X: burgers.residual_cont(p, X, lb, ub, nu=nu))

    holder = {}  # filled with the live Trainer below (RAR needs params)

    def resample_fn(i):
        # Fresh LHS collocation draw (same sampler as prep, new stream);
        # data points stay fixed.  Active via hp tf_resample/nt_resample.
        rng = np.random.RandomState(hp.get("seed", 1234) + i)
        if hp.get("rar_pool"):
            # Residual-based adaptive refinement: draw a large candidate
            # pool, keep the half of N_f with the largest |residual|
            # under the CURRENT iterate, fill the rest uniformly (pure
            # top-k collapses coverage onto the shock line).
            M = int(hp["rar_pool"])
            cand = data.lb + (data.ub - data.lb) * lhs(2, M, rng)
            f = np.abs(np.asarray(residual_f(
                holder["trainer"].params, jnp.asarray(cand, dtype))))[:, 0]
            k = hp["N_f"] // 2
            top = np.argsort(-f)[:k]
            rest = rng.choice(np.setdiff1d(np.arange(M), top),
                              hp["N_f"] - k, replace=False)
            X_f_new = cand[np.concatenate([top, rest])]
        else:
            X_f_new = data.lb + (data.ub - data.lb) * lhs(2, hp["N_f"], rng)
        b = dict(batch)
        if mesh is not None and not hp.get("fused_residual"):
            from pinn.parallel import pad_points_with_weights
            Xp, w = pad_points_with_weights(np.asarray(X_f_new),
                                            mesh.devices.size)
            b["X_f"], b["f_w"] = jnp.asarray(Xp, dtype), jnp.asarray(w, dtype)
        else:
            # Unsharded, or fused DP (no pad rows — N_f stays a
            # multiple of the device count by construction).
            b["X_f"] = jnp.asarray(X_f_new, dtype)
        return b

    if hp.get("rar_init") and hp.get("rar_pool") and mesh is None:
        # One-shot RAR draw before training (refinement stages that
        # warm-start from a checkpoint): place half of N_f on the
        # highest-|residual| candidates of the CURRENT net — for
        # Burgers that concentrates collocation on the shock line,
        # which is where bad-basin error lives.
        rng = np.random.RandomState(hp.get("seed", 1234) + 999)
        M = int(hp["rar_pool"])
        cand = data.lb + (data.ub - data.lb) * lhs(2, M, rng)
        fvals = np.abs(np.asarray(residual_f(
            net, jnp.asarray(cand, dtype))))[:, 0]
        k = hp["N_f"] // 2
        top = np.argsort(-fvals)[:k]
        rest = rng.choice(np.setdiff1d(np.arange(M), top),
                          hp["N_f"] - k, replace=False)
        batch["X_f"] = jnp.asarray(cand[np.concatenate([top, rest])], dtype)

    val_fn = None
    if hp.get("nt_val_every"):
        # Label-free held-out validation: the training loss with the
        # residual term evaluated on an INDEPENDENT LHS draw the
        # optimizer never sees (data term unchanged — it is the
        # problem's fixed boundary/IC set, not a sample).  Feeds the
        # Trainer's best-iterate selection: refinement tails measurably
        # overfit the fixed collocation draw (logs/df32_ab.log), and
        # this metric sees that without touching exact-solution labels.
        rng_v = np.random.RandomState(hp.get("seed", 1234) + 424242)
        X_f_val = jnp.asarray(
            data.lb + (data.ub - data.lb) * lhs(2, hp["N_f"], rng_v), dtype)
        _val = jax.jit(lambda p: burgers.loss_cont_inference(
            p, X_u, u, X_f_val, lb, ub, nu))

        def val_fn(p):
            return float(_val(p))

    logger = Logger(hp)
    trainer = Trainer(loss_fn, net, batch, hp, logger, mesh=mesh,
                      resample_fn=resample_fn, adam_loss_fn=adam_loss_fn,
                      val_fn=val_fn)
    holder["trainer"] = trainer

    def error():
        u_pred = np.asarray(predict_u(trainer.params, X_star))
        return float(np.linalg.norm(data.u_star - u_pred, 2)
                     / np.linalg.norm(data.u_star, 2))

    logger.set_error_fn(error)
    params = trainer.fit()
    maybe_save_params(hp, params)

    u_pred = np.asarray(predict_u(params, X_star))
    rel_l2 = error()

    if plot:
        from viz import plot_inf_cont_results
        plot_inf_cont_results(data.X_star, u_pred, data.X_u_train,
                              data.u_train, data.Exact_u, data.X, data.T,
                              data.x, data.t,
                              save_path=save_path or "experiments",
                              save_hp=hp)
    f_pred = np.asarray(residual_f(params, X_f))
    return {"params": params, "u_pred": u_pred, "f_pred": f_pred,
            "error": rel_l2, "data": data, "hp": hp, "loss_fn": loss_fn,
            "batch": batch, "predict_u": predict_u}


if __name__ == "__main__":
    hp = load_hp(sys.argv, DEFAULT_HP)
    result = run(hp, plot=True)
    print(f"rel-L2 error: {result['error']:.4e}")
