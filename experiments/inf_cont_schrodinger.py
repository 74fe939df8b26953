"""Continuous-time 1D nonlinear Schrödinger inference.

Parity target: reference 1dcomplex-schrodinger/inf_cont_schrodinger.py —
[2, 100x4, 2] tanh MLP for (u, v) = (Re h, Im h); N_0=50 initial
points, N_b=50 boundary times (periodic BCs on value and x-derivative),
N_f=20,000 LHS collocation points; Adam 200 @ lr .05 (beta1=.99,
eps=.1), L-BFGS off by default; error = rel-L2 of |h| on the grid.

Usage: ``python experiments/inf_cont_schrodinger.py [hp.json]``
"""

from __future__ import annotations

import sys

from _common import (setup, resolve_dtype, maybe_load_params,  # noqa: F401
                     maybe_save_params, validate)

import jax
import jax.numpy as jnp
import numpy as np

from pinn.data import lhs, schrodinger_inference
from pinn.models import mlp
from pinn.problems import schrodinger
from pinn.train import Trainer
from pinn.utils import Logger, load_hp

DEFAULT_HP = {
    "N_0": 50,
    "N_b": 50,
    "N_f": 20000,
    "layers": [2, 100, 100, 100, 100, 2],
    "tf_epochs": 200,
    "tf_lr": 0.05,
    "tf_b1": 0.99,
    "tf_eps": 1e-1,
    "nt_epochs": 0,
    "nt_lr": 1.2,
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

    data = schrodinger_inference(hp["N_0"], hp["N_b"], hp["N_f"])
    lb = jnp.asarray(data.lb, dtype)
    ub = jnp.asarray(data.ub, dtype)

    # Point sets (reference inf_cont_schrodinger.py:49-56).
    X0 = np.concatenate([data.x0, 0 * data.x0], axis=1)
    H0 = np.hstack([data.u0, data.v0])
    X_lb = np.concatenate([0 * data.tb + data.lb[0], data.tb], axis=1)
    X_ub = np.concatenate([0 * data.tb + data.ub[0], data.tb], axis=1)

    batch = {
        "X0": jnp.asarray(X0, dtype), "H0": jnp.asarray(H0, dtype),
        "X_lb": jnp.asarray(X_lb, dtype), "X_ub": jnp.asarray(X_ub, dtype),
        "X_f": jnp.asarray(data.X_f, dtype),
    }
    # hp["tpu_mesh"]: shard the collocation axis over the first N
    # devices (true/0 = all); small IC/BC stacks are replicated by the
    # Trainer, collocation points padded with masked weights so the
    # loss is bit-equal to the unsharded run (SURVEY.md §2.5 DP row).
    mesh = None
    if hp.get("tpu_mesh"):
        from pinn.parallel import make_mesh, pad_points_with_weights
        req = hp["tpu_mesh"]
        mesh = make_mesh(None if req is True else int(req))
        if not hp.get("fused_residual"):
            # XLA mesh path: pad the collocation axis with zero-weight
            # rows so any N_f divides the mesh.  The fused DP path has
            # no weight rows; it requires N_f % devices == 0 instead
            # (checked inside make_schrodinger_loss_dp).
            Xp, w = pad_points_with_weights(np.asarray(data.X_f),
                                            mesh.devices.size)
            batch["X_f"] = jnp.asarray(Xp, dtype)
            batch["f_w"] = jnp.asarray(w, dtype)
    X_star = jnp.asarray(data.X_star, dtype)

    net = mlp.init_mlp(key, hp["layers"], dtype)
    net = maybe_load_params(hp, net)

    adam_loss_fn = None  # optional warmup-phase loss (bf16 streams)
    if hp.get("fused_residual"):
        # Fused Pallas forward+backward residual kernel (f32): one
        # launch per step covers the N_f residual term; IC/BC terms
        # stay XLA (SCALING.md).  With tpu_mesh it composes via
        # shard_map: one kernel launch per device per step, gradients
        # psum'd over ICI (make_schrodinger_loss_dp).
        if dtype != jnp.float32:
            raise ValueError("fused_residual requires dtype=float32 "
                             "(the XLA path covers f64)")
        from pinn.ops.pallas_schrodinger import (make_schrodinger_loss,
                                                 make_schrodinger_loss_dp)
        # fused_residual: True = exact f32 streams; "bf16"/"bfloat16" =
        # bf16 streams with f32 accumulation (warmup-grade precision).
        sdt = ("bfloat16" if str(hp["fused_residual"]).lower()
               in ("bf16", "bfloat16") else None)
        interp = jax.default_backend() != "tpu"

        def build_fused(stream):
            if mesh is not None:
                return make_schrodinger_loss_dp(
                    np.asarray(data.lb), np.asarray(data.ub), mesh,
                    interpret=interp, stream_dtype=stream)
            return make_schrodinger_loss(
                np.asarray(data.lb), np.asarray(data.ub),
                interpret=interp, stream_dtype=stream)

        loss_fn = build_fused(sdt)
        if str(hp.get("tf_net_dtype", "")).lower() in ("bf16", "bfloat16"):
            # bf16 warmup on the fused path: Adam optimizes the
            # bf16-stream variant (f32 master weights — the fused
            # custom_vjp emits f32 gradients, so the AdamRunner cast
            # wrapper must not also quantize); L-BFGS keeps the exact
            # kernel.
            adam_loss_fn = build_fused("bfloat16")
            hp = {k: v for k, v in hp.items() if k != "tf_net_dtype"}
    elif hp.get("net_impl") == "df32":
        # Double-f32 extended-precision engine for the refinement
        # stage (pinn/ops/df32.py) — f64 iterate, compensated-f32 net
        # evaluation; the emulated-f64 replacement.  See
        # experiments/inf_cont_burgers.py for the guard rationale.
        if dtype != jnp.float64:
            raise ValueError("net_impl='df32' requires dtype=float64")
        if mesh is not None:
            raise ValueError("net_impl='df32' is single-chip")
        if jax.default_backend() == "cpu":
            print("WARNING: net_impl='df32' on CPU degrades to ~f32 "
                  "accuracy under jit; drop net_impl on CPU — native "
                  "float64 is faster and more accurate there")
        from pinn.ops.df32 import make_schrodinger_loss_df32

        _df32_loss = make_schrodinger_loss_df32(np.asarray(data.lb),
                                                np.asarray(data.ub))

        def loss_fn(p, b):
            return _df32_loss(p, b)
    else:
        def loss_fn(p, b):
            return schrodinger.loss(p, b["X0"], b["H0"], b["X_lb"],
                                    b["X_ub"], b["X_f"], lb, ub,
                                    f_weights=b.get("f_w"))

    terms_fn = jax.jit(lambda p, b: schrodinger.loss_terms(
        p, b["X0"], b["H0"], b["X_lb"], b["X_ub"], b["X_f"], lb, ub,
        b.get("f_w")))

    if hp.get("print_loss_terms"):
        # Strict observability parity (opt-in): the reference tf.prints
        # the three loss terms on EVERY loss evaluation (reference
        # inf_cont_schrodinger.py:128).  jax.debug.print reproduces
        # that from inside the compiled step via a host callback — it
        # serializes the hot loop on host round-trips, so it is a
        # debug/parity mode, never a throughput configuration (the
        # default prints the same terms at logger cadence instead).
        def _print_wrap(base):
            def wrapped(p, b):
                t = schrodinger.loss_terms(p, b["X0"], b["H0"], b["X_lb"],
                                           b["X_ub"], b["X_f"], lb, ub,
                                           b.get("f_w"))
                jax.debug.print("mse_0 {a}    mse_b {b}    mse_f    {c}",
                                a=t.mse_0, b=t.mse_b, c=t.mse_f)
                return base(p, b)
            return wrapped

        loss_fn = _print_wrap(loss_fn)
        if adam_loss_fn is not None:
            # The bf16 warmup path optimizes a separate Adam-phase loss
            # — it must print per evaluation too, or the parity contract
            # silently breaks for the whole Adam phase.
            adam_loss_fn = _print_wrap(adam_loss_fn)
    predict_h = jax.jit(lambda p, X: mlp.apply(p, X, lb, ub))

    logger = Logger(hp)

    def epoch_extra(p):
        # The reference prints the three loss terms each step
        # (inf_cont_schrodinger.py:128); here once per log line.
        t = terms_fn(p, batch)
        return (f"mse_0 = {float(t.mse_0):.4e}  "
                f"mse_b = {float(t.mse_b):.4e}  "
                f"mse_f = {float(t.mse_f):.4e}")

    def resample_fn(i):
        # Fresh LHS collocation draw (hp tf_resample/nt_resample);
        # IC/BC stacks stay fixed.
        rng = np.random.RandomState(hp.get("seed", 1234) + i)
        X_f_new = data.lb + (data.ub - data.lb) * lhs(2, hp["N_f"], rng)
        b = dict(batch)
        if mesh is not None and not hp.get("fused_residual"):
            from pinn.parallel import pad_points_with_weights
            Xp, w = pad_points_with_weights(X_f_new, mesh.devices.size)
            b["X_f"] = jnp.asarray(Xp, dtype)
            b["f_w"] = jnp.asarray(w, dtype)
        else:
            # Unsharded, or fused DP (no pad rows — N_f stays a
            # multiple of the device count by construction).
            b["X_f"] = jnp.asarray(X_f_new, dtype)
        return b

    val_fn = None
    if hp.get("nt_val_every"):
        # Label-free held-out validation loss for best-iterate selection
        # (same contract as inf_cont_burgers): residual term on an
        # independent LHS draw, IC/BC terms unchanged.
        rng_v = np.random.RandomState(hp.get("seed", 1234) + 424242)
        bv = dict(batch)
        bv.pop("f_w", None)
        bv["X_f"] = jnp.asarray(
            data.lb + (data.ub - data.lb) * lhs(2, hp["N_f"], rng_v), dtype)
        _val = jax.jit(lambda p: schrodinger.loss(
            p, bv["X0"], bv["H0"], bv["X_lb"], bv["X_ub"], bv["X_f"],
            lb, ub))

        def val_fn(p):
            return float(_val(p))

    trainer = Trainer(loss_fn, net, batch, hp, logger,
                      epoch_extra=epoch_extra, mesh=mesh,
                      resample_fn=resample_fn, adam_loss_fn=adam_loss_fn,
                      val_fn=val_fn)

    def error():
        H = np.asarray(predict_h(trainer.params, X_star))
        h_pred = np.sqrt(H[:, 0:1] ** 2 + H[:, 1:2] ** 2)
        return float(np.linalg.norm(data.h_star - h_pred, 2)
                     / np.linalg.norm(data.h_star, 2))

    logger.set_error_fn(error)
    params = trainer.fit()
    maybe_save_params(hp, params)

    H = np.asarray(predict_h(params, X_star))
    u_pred, v_pred = H[:, 0:1], H[:, 1:2]
    h_pred = np.sqrt(u_pred ** 2 + v_pred ** 2)
    rel_l2 = error()

    if plot:
        from viz import plot_schrodinger_results
        plot_schrodinger_results(data.X_star, u_pred, v_pred, h_pred,
                                 data.Exact_h, data.X, data.T, data.x,
                                 data.t, data.lb, data.ub, data.x0, data.tb,
                                 save_path=save_path or "experiments",
                                 save_hp=hp)
    return {"params": params, "u_pred": u_pred, "v_pred": v_pred,
            "h_pred": h_pred, "error": rel_l2, "data": data, "hp": hp,
            "loss_fn": loss_fn, "batch": batch}


if __name__ == "__main__":
    hp = load_hp(sys.argv, DEFAULT_HP)
    result = run(hp, plot=True)
    print(f"rel-L2 error (|h|): {result['error']:.4e}")
