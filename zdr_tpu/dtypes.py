"""Small value types shared across the renderer.

The reference exposes `Camera` as a LuisaCompute struct and `float3` as a
CUDA vector constructor (/root/reference/render.py:28, __init__.py:1). Here
they are plain pytrees / jnp arrays so they can flow through jit and AD.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def float3(*args: Any) -> jnp.ndarray:
    """Construct a float32 3-vector (broadcast a scalar, like CUDA float3)."""
    if len(args) == 1:
        a = args[0]
        if np.ndim(a) == 0:
            return jnp.full((3,), a, dtype=jnp.float32)
        return jnp.asarray(a, dtype=jnp.float32).reshape(3)
    if len(args) == 3:
        return jnp.array(args, dtype=jnp.float32)
    raise TypeError(f"float3 takes 1 or 3 arguments, got {len(args)}")


def float2(*args: Any) -> jnp.ndarray:
    if len(args) == 1:
        a = args[0]
        if np.ndim(a) == 0:
            return jnp.full((2,), a, dtype=jnp.float32)
        return jnp.asarray(a, dtype=jnp.float32).reshape(2)
    if len(args) == 2:
        return jnp.array(args, dtype=jnp.float32)
    raise TypeError(f"float2 takes 1 or 2 arguments, got {len(args)}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """Perspective camera (reference: render.py:28, camera.py:5-17).

    Attributes:
        fov: vertical-ish field of view in radians (applied to x, with y
            aspect-corrected by the integrator wrapper like the reference).
        origin / target / up: float3 world-space vectors.
    """

    fov: jnp.ndarray
    origin: jnp.ndarray
    target: jnp.ndarray
    up: jnp.ndarray

    def __init__(self, fov=0.6981317, origin=None, target=None, up=None):
        # Convert only host-side python values; tracers/arrays (and pytree
        # unflattening sentinels) must pass through untouched.
        def conv(v, default):
            if v is None:
                return float3(*default)
            if isinstance(v, (int, float, tuple, list, np.ndarray)):
                return float3(v)
            return v

        if isinstance(fov, (int, float)):
            fov = jnp.asarray(fov, dtype=jnp.float32)
        self.fov = fov
        self.origin = conv(origin, (1.0, 0.5, 0.0))
        self.target = conv(target, (0.0, 0.0, 0.0))
        self.up = conv(up, (0.0, 1.0, 0.0))


def default_camera() -> Camera:
    """Reference default camera (render.py:57-62)."""
    return Camera(
        fov=40 / 180 * 3.1415926,
        origin=float3(1.0, 0.5, 0.0),
        target=float3(0.0, 0.0, 0.0),
        up=float3(0.0, 1.0, 0.0),
    )
