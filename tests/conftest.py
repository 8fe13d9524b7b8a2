"""Test config: run everything on a virtual 8-device CPU mesh.

JAX's CPU backend is the 'fake backend' for CI; multi-chip sharding tests use
xla_force_host_platform_device_count (SURVEY.md §4). Must run before jax
imports anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
