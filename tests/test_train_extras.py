"""Trainer extras added in round 2: collocation resampling,
params_callback, model_description summary, .npy data loading."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pinn.data import load_burgers
from pinn.models import mlp
from pinn.train import Trainer
from pinn.utils.logger import Logger


def _quad_setup(key=0):
    """Tiny least-squares problem: fit an MLP to u = sin(pi x)."""
    params = mlp.init_mlp(jax.random.PRNGKey(key), [1, 8, 1], jnp.float32)
    lb, ub = jnp.array([-1.0]), jnp.array([1.0])
    X = jnp.linspace(-1, 1, 32).reshape(-1, 1)
    u = jnp.sin(np.pi * X)

    def loss_fn(p, b):
        pred = mlp.apply(p, b["X"], lb, ub)
        return jnp.mean((pred - b["u"]) ** 2)

    return params, {"X": X, "u": u}, loss_fn


def test_resample_fn_called_and_descends():
    params, batch, loss_fn = _quad_setup()
    calls = []

    def resample_fn(i):
        calls.append(i)
        return batch  # same data: pure plumbing check

    hp = {"tf_epochs": 12, "tf_resample": 4, "nt_epochs": 10, "tf_lr": 0.01,
          "nt_resample": 5, "nt_line_search": "wolfe",
          "log_frequency": 100}
    tr = Trainer(loss_fn, params, batch, hp, resample_fn=resample_fn)
    f0 = float(loss_fn(params, batch))
    p = tr.fit()
    assert float(loss_fn(p, batch)) < f0
    # Adam refreshes at 4, 8; L-BFGS at 5 (plus stall revivals).
    assert 4 in calls and 8 in calls and 5 in calls


def test_resample_revives_stalled_lbfgs():
    """A terminal stop on one draw must not end training when
    resampling is on — unless the fresh draw stalls immediately too."""
    params, batch, loss_fn = _quad_setup()

    draws = []

    def resample_fn(i):
        draws.append(i)
        return batch

    # tol_x is huge by default standards? Use the normal config; force
    # an early F_TOL stall by making the loss flat: constant target.
    flat_batch = {"X": batch["X"], "u": jnp.zeros_like(batch["u"])}
    hp = {"tf_epochs": 0, "nt_epochs": 40, "nt_resample": 10,
          "nt_line_search": "wolfe", "log_frequency": 100}
    tr = Trainer(loss_fn, params, flat_batch, hp, resample_fn=resample_fn)
    tr.fit()  # must terminate (no infinite revive loop)


def test_params_callback_sees_live_iterate():
    params, batch, loss_fn = _quad_setup()
    seen = []
    hp = {"tf_epochs": 6, "nt_epochs": 0, "log_frequency": 2, "tf_lr": 0.01}
    tr = Trainer(loss_fn, params, batch, hp,
                 params_callback=lambda p: seen.append(p))
    tr.fit()
    assert len(seen) >= 3
    # Later snapshots differ from the initial params (training moved).
    first = jax.tree_util.tree_leaves(seen[0])[0]
    last = jax.tree_util.tree_leaves(seen[-1])[0]
    assert not np.allclose(np.asarray(first), np.asarray(last))


def test_model_description_prints_summary():
    params, batch, loss_fn = _quad_setup()
    lines = []
    hp = {"tf_epochs": 2, "nt_epochs": 0, "log_frequency": 10, "tf_lr": 0.01,
          "model_description": True}
    logger = Logger(hp, print_fn=lines.append)
    Trainer(loss_fn, params, batch, hp, logger).fit()
    text = "\n".join(str(x) for x in lines)
    assert "total parameters:" in text


def test_tf_net_dtype_bf16_keeps_f32_masters_and_descends():
    """hp["tf_net_dtype"]="bfloat16": Adam evaluates the loss in bf16
    but the master weights (and moments) stay in the model dtype."""
    params, batch, loss_fn = _quad_setup()
    hp = {"tf_epochs": 30, "nt_epochs": 0, "tf_lr": 0.01,
          "tf_net_dtype": "bfloat16", "log_frequency": 100}
    tr = Trainer(loss_fn, params, batch, hp)
    f0 = float(loss_fn(params, batch))
    p = tr.fit()
    for leaf in jax.tree_util.tree_leaves(p):
        assert leaf.dtype == jnp.float32
    assert float(loss_fn(p, batch)) < f0


def test_save_every_periodic_checkpoint_and_resume(tmp_path):
    """hp["save_every"] persists the live iterate atomically at that
    cadence; a warm restart from the file keeps descending (fault
    tolerance — the reference persists nothing, SURVEY.md §5)."""
    from pinn.utils import checkpoint
    params, batch, loss_fn = _quad_setup()
    ck = str(tmp_path / "periodic.npz")
    hp = {"tf_epochs": 8, "nt_epochs": 12, "tf_lr": 0.01,
          "save_every": 5, "save_checkpoint": ck,
          "nt_line_search": "wolfe", "log_frequency": 100}
    Trainer(loss_fn, params, batch, hp).fit()
    assert os.path.exists(ck) and not os.path.exists(ck + ".tmp.npz")
    meta = checkpoint.resume_meta(ck)
    # Adam saves at 5; L-BFGS at 5 and 10 (global 13/18) unless it
    # stopped early on this tiny problem.
    assert meta["phase"] in ("adam", "lbfgs")
    assert meta["phase_epoch"] % 5 == 0 and meta["phase_epoch"] > 0
    if meta["phase"] == "lbfgs":
        assert meta["epoch"] == 8 + meta["phase_epoch"]
    loaded, _ = checkpoint.load_npz(ck, like=params)
    f_ck = float(loss_fn(loaded, batch))
    assert np.isfinite(f_ck) and f_ck < float(loss_fn(params, batch))
    # Warm-resume from the periodic save: training continues down.
    p2 = Trainer(loss_fn, loaded, batch,
                 {"tf_epochs": 0, "nt_epochs": 10,
                  "nt_line_search": "wolfe", "log_frequency": 100}).fit()
    assert float(loss_fn(p2, batch)) <= f_ck


def test_save_every_requires_path():
    params, batch, loss_fn = _quad_setup()
    import pytest
    with pytest.raises(ValueError, match="save_checkpoint"):
        Trainer(loss_fn, params, batch,
                {"tf_epochs": 2, "nt_epochs": 0, "save_every": 1})


def test_val_select_restores_best_iterate():
    """hp["nt_val_every"] + val_fn: the Trainer tracks a label-free
    validation metric through the L-BFGS tail and restores the
    best-scoring iterate (tail-overfitting control, logs/df32_ab.log).
    An adversarial metric minimized at the warm start must win."""
    params, batch, loss_fn = _quad_setup()
    leaves0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]

    def val_fn(p):
        return float(sum(np.linalg.norm(np.asarray(x) - x0)
                         for x, x0 in zip(jax.tree_util.tree_leaves(p),
                                          leaves0)))

    hp = {"tf_epochs": 0, "nt_epochs": 20, "nt_val_every": 5,
          "nt_line_search": "wolfe", "log_frequency": 100}
    lines = []
    logger = Logger(hp, print_fn=lines.append)
    p = Trainer(loss_fn, params, batch, hp, logger, val_fn=val_fn).fit()
    for got, x0 in zip(jax.tree_util.tree_leaves(p), leaves0):
        np.testing.assert_allclose(np.asarray(got), x0)
    assert any("val select" in str(ln) for ln in lines)


def test_val_select_keeps_final_when_val_tracks_loss():
    """With the metric = the training loss, the (monotone) final
    iterate is best and no restore happens."""
    params, batch, loss_fn = _quad_setup()

    def val_fn(p):
        return float(loss_fn(p, batch))

    hp = {"tf_epochs": 0, "nt_epochs": 20, "nt_val_every": 5,
          "nt_line_search": "wolfe", "log_frequency": 100}
    lines = []
    logger = Logger(hp, print_fn=lines.append)
    tr = Trainer(loss_fn, params, batch, hp, logger, val_fn=val_fn)
    p = tr.fit()
    assert float(loss_fn(p, batch)) < float(loss_fn(params, batch))
    assert not any("val select" in str(ln) for ln in lines)


def test_nt_val_every_experiment_wiring():
    """inf_cont_burgers builds the held-out residual draw when
    hp["nt_val_every"] is set and the run stays finite."""
    m = _exp_module()
    r = m.run({"N_u": 30, "N_f": 400, "layers": [2, 12, 1],
               "tf_epochs": 10, "nt_epochs": 30, "nt_val_every": 10,
               "log_frequency": 1000})
    assert np.isfinite(r["error"])


def test_load_burgers_npy_triple(tmp_path):
    """Reference .npy triple loads through the same entry point
    (reference datagen/1d-burgers/datagen_old.py:7-16)."""
    x, t, usol = load_burgers()
    np.save(tmp_path / "b_x.npy", x.ravel())
    np.save(tmp_path / "b_t.npy", t.ravel())
    np.save(tmp_path / "b_u.npy", usol)
    for member in ("b_u.npy", "b_x.npy", "b_t.npy"):
        x2, t2, u2 = load_burgers(str(tmp_path / member))
        np.testing.assert_array_equal(x2, x)
        np.testing.assert_array_equal(t2, t)
        np.testing.assert_array_equal(u2, usol)


def _exp_module():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "experiments"))
    import inf_cont_burgers
    return inf_cont_burgers


def test_rar_resample_and_init_seed():
    """hp rar_pool routes resamples through residual-ranked candidates;
    init_seed decouples weight init from the data seed."""
    m = _exp_module()
    hp = {"N_u": 30, "N_f": 400, "layers": [2, 12, 1], "tf_epochs": 10,
          "nt_epochs": 30, "nt_resample": 10, "rar_pool": 2000,
          "log_frequency": 1000}
    r = m.run(dict(hp))
    assert np.isfinite(r["error"])
    # Different init_seed, same data seed -> same train set, different
    # trained weights.
    r2 = m.run({**hp, "init_seed": 99})
    np.testing.assert_array_equal(np.asarray(r["batch"]["X_u"]),
                                  np.asarray(r2["batch"]["X_u"]))
    w1 = np.asarray(r["params"][0][0])
    w2 = np.asarray(r2["params"][0][0])
    assert not np.allclose(w1, w2)


def test_rar_init_draw_on_warm_start(tmp_path):
    """rar_init redraws collocation from the checkpointed net's
    residual before a warm-started refinement stage."""
    m = _exp_module()
    ck = str(tmp_path / "warm.npz")
    base = {"N_u": 30, "N_f": 400, "layers": [2, 12, 1],
            "log_frequency": 1000}
    m.run({**base, "tf_epochs": 10, "nt_epochs": 10,
           "save_checkpoint": ck})
    r = m.run({**base, "tf_epochs": 0, "nt_epochs": 10,
               "init_checkpoint": ck, "rar_init": True, "rar_pool": 2000})
    assert np.isfinite(r["error"])
    # The RAR draw must differ from the plain LHS draw.
    r_plain = m.run({**base, "tf_epochs": 0, "nt_epochs": 10,
                     "init_checkpoint": ck})
    assert not np.array_equal(np.asarray(r["batch"]["X_f"]),
                              np.asarray(r_plain["batch"]["X_f"]))
