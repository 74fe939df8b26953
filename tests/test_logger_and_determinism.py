"""Logger line-format parity + seed determinism contract."""

import re

import jax
import jax.numpy as jnp
import numpy as np

from pinn.utils import Logger
from pinn.models import mlp


def test_logger_epoch_line_format():
    """Line shape parity with the reference (utils/logger.py:45-51):
    '<name> = <6d>  elapsed = MM:SS (+S.S)  loss = X.XXXXe+EE  <custom>'"""
    lines = []
    log = Logger({"log_frequency": 5}, print_fn=lines.append)
    lines.clear()  # drop the constructor's hp/env banner
    log.log_train_opt("Adam")
    log.log_train_epoch(0, 1.5, custom="l1 = 0.5")
    log.log_train_epoch(3, 1.0)          # suppressed (not a multiple of 5)
    log.log_train_epoch(5, 0.25, is_iter=True)
    pat = re.compile(
        r"^(tf|nt)_epoch = +\d+  elapsed = \d{2}:\d{2} \(\+[\d.]+\)  "
        r"loss = \d\.\d{4}e[+-]\d{2}  .*$")
    assert lines[0] == "-- Starting Adam optimization --"
    assert pat.match(lines[1]), lines[1]
    assert "tf_epoch" in lines[1] and "l1 = 0.5" in lines[1]
    assert len(lines) == 3  # epoch 3 suppressed
    assert "nt_epoch" in lines[2]


def test_logger_end_line_uses_error_fn():
    lines = []
    log = Logger({"log_frequency": 1}, print_fn=lines.append)
    log.set_error_fn(lambda: 4.2e-3)
    log.log_train_end(100, custom="x")
    assert "error = 4.2000e-03" in lines[-1]


def test_training_determinism():
    """Same seed => bit-identical training trajectory (the reference
    pins np/tf seeds for this, inf_cont_burgers.py:8-10)."""
    from pinn.train import Trainer

    def make():
        params = mlp.init_mlp(jax.random.PRNGKey(7), [2, 8, 1], jnp.float32)
        rng = np.random.RandomState(7)
        batch = {"X_u": jnp.asarray(rng.rand(10, 2), jnp.float32),
                 "u": jnp.asarray(rng.rand(10, 1), jnp.float32)}
        lb, ub = jnp.zeros(2, jnp.float32), jnp.ones(2, jnp.float32)

        def loss_fn(p, b):
            return jnp.mean((mlp.apply(p, b["X_u"], lb, ub) - b["u"]) ** 2)

        hp = {"tf_epochs": 12, "tf_lr": 0.01, "tf_b1": 0.9, "tf_eps": None,
              "nt_epochs": 8, "nt_lr": 0.5, "nt_ncorr": 5,
              "log_frequency": 100}
        t = Trainer(loss_fn, params, batch, hp, logger=None)
        return t.fit()

    p1 = make()
    p2 = make()
    for (w1, b1), (w2, b2) in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_mixed_precision_lbfgs_runs_and_descends():
    """f32 network + f64 L-BFGS vector algebra (nt_vector_dtype)."""
    from pinn.train import Trainer

    params = mlp.init_mlp(jax.random.PRNGKey(3), [2, 8, 1], jnp.float32)
    rng = np.random.RandomState(3)
    batch = {"X_u": jnp.asarray(rng.rand(16, 2), jnp.float32),
             "u": jnp.asarray(rng.rand(16, 1), jnp.float32)}
    lb, ub = jnp.zeros(2, jnp.float32), jnp.ones(2, jnp.float32)

    def loss_fn(p, b):
        return jnp.mean((mlp.apply(p, b["X_u"], lb, ub) - b["u"]) ** 2)

    hp = {"tf_epochs": 0, "nt_epochs": 40, "nt_lr": 1.0, "nt_ncorr": 10,
          "nt_line_search": "armijo", "nt_vector_dtype": "float64",
          "log_frequency": 100}
    t = Trainer(loss_fn, params, batch, hp, logger=None)
    loss0 = float(loss_fn(params, batch))
    p = t.fit()
    assert float(loss_fn(p, batch)) < 0.2 * loss0
    # Network params stay f32; optimizer state was f64.
    assert p[0][0].dtype == jnp.float32
    assert t.last_lbfgs_state.x.dtype == jnp.float64


def test_hp_validation():
    import pytest
    import warnings
    from pinn.utils.config import validate_hp

    with pytest.raises(KeyError):
        validate_hp({"tf_epochs": 10})
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        validate_hp({"layers": [2, 1], "nt_epochz": 5})
    assert any("nt_epochz" in str(w.message) for w in rec)
    validate_hp({"layers": [2, 1], "tf_epochs": 3})  # clean


def test_log_frequency_not_multiple_of_chunk_cap():
    """log_frequency=25 with CHUNK_CAP=10 must still log epochs 0, 25,
    50, 75 (chunks land exactly on log boundaries)."""
    from pinn.train import Trainer
    from pinn.utils import Logger

    params = mlp.init_mlp(jax.random.PRNGKey(4), [2, 4, 1], jnp.float32)
    rng = np.random.RandomState(4)
    batch = {"X_u": jnp.asarray(rng.rand(8, 2), jnp.float32),
             "u": jnp.asarray(rng.rand(8, 1), jnp.float32)}
    lb_, ub_ = jnp.zeros(2, jnp.float32), jnp.ones(2, jnp.float32)

    def loss_fn(p, b):
        return jnp.mean((mlp.apply(p, b["X_u"], lb_, ub_) - b["u"]) ** 2)

    lines = []
    logger = Logger({"log_frequency": 25}, print_fn=lines.append)
    hp = {"tf_epochs": 100, "tf_lr": 0.01, "tf_b1": 0.9, "tf_eps": None,
          "nt_epochs": 0, "log_frequency": 25}
    Trainer(loss_fn, params, batch, hp, logger).fit()
    logged = [ln for ln in lines if ln.startswith("tf_epoch")]
    epochs = [int(ln.split("=")[1].split()[0]) for ln in logged]
    assert epochs == [0, 25, 50, 75], epochs


def test_log_file_jsonl_history(tmp_path):
    """hp["log_file"]: machine-readable JSONL training history
    (init/epoch/end records) alongside the printed lines."""
    import json as _json
    from pinn.utils.logger import Logger

    path = str(tmp_path / "hist.jsonl")
    hp = {"log_frequency": 1, "log_file": path, "layers": [1, 4, 1]}
    lg = Logger(hp, print_fn=lambda s: None)
    lg.log_train_start()
    lg.log_train_epoch(0, 1.5, "", False)
    lg.log_train_epoch(1, 0.5, "l1=2", True)
    lg.set_error_fn(lambda: 0.25)
    lg.log_train_end(2, "")
    recs = [_json.loads(line) for line in open(path)]
    events = [r["event"] for r in recs]
    assert events == ["init", "epoch", "epoch", "end"]
    assert recs[1]["phase"] == "tf_epoch" and recs[1]["loss"] == 1.5
    assert recs[2]["phase"] == "nt_epoch" and recs[2]["extra"] == "l1=2"
    assert recs[3]["error"] == 0.25
