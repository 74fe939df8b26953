"""Test configuration.

Tests run on a virtual 8-device CPU backend
(``xla_force_host_platform_device_count=8``) so mesh/sharding paths are
exercised without TPU hardware — the standard JAX fake-backend trick
(see SURVEY.md §4).

Note: the session's sitecustomize registers the ``axon`` TPU backend in
every interpreter and forces ``jax_platforms="axon,cpu"`` — env vars
alone don't win, so we re-force ``cpu`` via jax.config after import,
before any backend initialization.
"""

import os

# Opt-in real-TPU tier: ``PINN_TPU_TESTS=1 pytest -m tpu`` keeps the
# session's axon TPU backend (no CPU forcing, no x64 — the chip has no
# f64) so tpu-marked tests compile the Pallas kernels through Mosaic,
# the layer the interpret-mode tier cannot reach.
TPU_TIER = bool(os.environ.get("PINN_TPU_TESTS"))

if not TPU_TIER:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    # Float64 available for parity tests; default dtype stays f32.
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(autouse=True)
def _x64_stays_enabled():
    """Keep tests order-independent: experiments' ``resolve_dtype``
    sets the global ``jax_enable_x64`` flag both ways (so same-process
    multi-stage runs get independent stage dtypes), which would leak an
    f32 stage's x64=False into whatever f64 test runs next."""
    yield
    if not TPU_TIER:
        jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(1234)
