"""Shared experiment scaffolding: path setup, seeding, dtype resolution."""

from __future__ import annotations

import os
import sys

# Experiments are runnable both as scripts and as modules from repo root.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax  # noqa: E402
import numpy as np  # noqa: E402

# Persistent compilation cache: compiles through the remote TPU tunnel
# take minutes; cache them across processes.
try:
    # TPU-only: remote compiles take minutes and are worth caching.
    # CPU compiles are fast AND the cache can hold artifacts built with
    # mismatched machine-feature sets (SIGILL risk on load) — skip it.
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass


def setup(seed: int = 1234):
    """Reference seeding contract (reference inf_cont_burgers.py:8-10):
    numpy drives data sampling; jax PRNG keys thread from the same seed."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def validate(hp):
    from pinn.utils.config import validate_hp
    return validate_hp(hp)


def resolve_dtype(hp):
    """hp['dtype'] in {'float32','float64','bfloat16'}; default f32
    (TPU-native), f64 enables x64 for reference-parity runs.

    For f32 the default TPU matmul path rounds operands to bfloat16 on
    the MXU; PINN residuals are second derivatives and that noise floor
    corrupts L-BFGS curvature pairs, so full-f32 matmuls are forced
    (tiny nets — the cost is negligible)."""
    import jax.numpy as jnp
    name = hp.get("dtype", "float32")
    # Set x64 explicitly BOTH ways: multi-stage same-process runs
    # (run_campaign) must not inherit x64 from a previous f64 stage.
    want_x64 = (name == "float64"
                or hp.get("nt_vector_dtype") == "float64")
    jax.config.update("jax_enable_x64", want_x64)
    if name != "float64":
        jax.config.update("jax_default_matmul_precision", "highest")
    return jnp.dtype(name)


def _case_path(path: str, case) -> str:
    """Suffix a checkpoint path per sub-case: the identification
    experiments train clean AND noisy models inside one run(), and a
    multi-stage chain must warm-start each case from ITS OWN stage-1
    result, not whichever case saved last."""
    if not case:
        return path
    root, ext = os.path.splitext(path)
    return f"{root}-{case}{ext or '.npz'}"


def maybe_load_params(hp, params, case=None):
    """hp["init_checkpoint"]: warm-start from a saved flat-vector npz
    (two-stage precision schedules, resumed runs)."""
    path = hp.get("init_checkpoint")
    if path:
        from pinn.utils import checkpoint
        path = _case_path(path, case)
        params, _ = checkpoint.load_npz(path, like=params)
        print(f"Loaded initial parameters from {path}")
    return params


def maybe_save_params(hp, params, case=None):
    """hp["save_checkpoint"]: persist the trained parameters."""
    path = hp.get("save_checkpoint")
    if path:
        from pinn.utils import checkpoint
        path = _case_path(path, case)
        checkpoint.save_npz_atomic(path, params, hp=hp)
        print(f"Saved checkpoint to {path}")
