"""Precision policy.

The TF2 reference runs everything in float64 (reference
utils/neuralnetwork.py:24-26 sets Keras floatx to "float64").  TPUs
execute float64 only via slow software emulation, so the TPU-native
default here is float32; float64 is available as an opt-in parity mode
(useful on CPU, where jax x64 is native) via ``set_default_dtype`` or
the ``PINN_X64=1`` environment variable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_DEFAULT = jnp.float64 if os.environ.get("PINN_X64") == "1" else jnp.float32

if os.environ.get("PINN_X64") == "1":
    jax.config.update("jax_enable_x64", True)


def default_dtype():
    """The framework-wide default floating dtype."""
    return _DEFAULT


def set_default_dtype(dtype) -> None:
    """Set the framework-wide default floating dtype.

    Passing ``jnp.float64`` also enables jax x64 mode (must happen
    before arrays are created).
    """
    global _DEFAULT
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    _DEFAULT = dtype
