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

jax.config.update("jax_platforms", "cpu")
