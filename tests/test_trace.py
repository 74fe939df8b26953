"""Profiler-trace hook (SURVEY.md §5 tracing row)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from pinn.models import mlp
from pinn.train import Trainer


def test_trace_dir_writes_profile(tmp_path):
    params = mlp.init_mlp(jax.random.PRNGKey(0), [2, 4, 1], jnp.float32)
    rng = np.random.RandomState(0)
    batch = {"X_u": jnp.asarray(rng.rand(8, 2), jnp.float32),
             "u": jnp.asarray(rng.rand(8, 1), jnp.float32)}
    lb, ub = jnp.zeros(2, jnp.float32), jnp.ones(2, jnp.float32)

    def loss_fn(p, b):
        return jnp.mean((mlp.apply(p, b["X_u"], lb, ub) - b["u"]) ** 2)

    trace_dir = str(tmp_path / "trace")
    hp = {"tf_epochs": 3, "tf_lr": 0.01, "tf_b1": 0.9, "tf_eps": None,
          "nt_epochs": 0, "log_frequency": 10, "trace_dir": trace_dir}
    Trainer(loss_fn, params, batch, hp, logger=None).fit()
    files = glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts"
