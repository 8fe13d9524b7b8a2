"""Test config: run everything on a virtual 8-device CPU mesh.

JAX's CPU backend is the 'fake backend' for CI; multi-chip sharding tests use
xla_force_host_platform_device_count (SURVEY.md §4).

Note: this environment's sitecustomize pins jax_platforms='axon,cpu' (a
remote-TPU tunnel). jax.config.update after import overrides it — required,
or every test op round-trips through the tunnel.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# ZDR_TPU_TESTS=1 keeps the real backend so TPU-marked tests (e.g.
# tests/test_tpu_smoke.py, which compiles the fused kernels through Mosaic)
# run on hardware; default CI forces the CPU backend.
if os.environ.get("ZDR_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA's CPU backend_compile segfaults nondeterministically deep into
    long many-compile pytest sessions (observed twice, different tests,
    always inside backend_compile_and_load; every file passes alone).
    Dropping the accumulated compiled-program state between modules keeps
    the per-process compile count bounded."""
    yield
    jax.clear_caches()
