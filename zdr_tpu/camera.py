"""Perspective ray generation + tent reconstruction filter.

Reference: /root/reference/camera.py:5-31. Batched: `p` is (..., 2) NDC
coords in [-1, 1]^2 (y already aspect-corrected by the caller, matching
integrator.py:23 in the reference).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .dtypes import Camera
from .vecmath import cross, normalize


def generate_ray(camera: Camera, p: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perspective projection. Returns (origin, direction), each (..., 3)."""
    forward = normalize(camera.target - camera.origin)
    right = normalize(cross(forward, camera.up))
    up_perp = cross(right, forward)
    scale = jnp.tan(0.5 * camera.fov)
    px = p[..., 0:1] * scale
    py = p[..., 1:2] * scale
    direction = normalize(px * right - py * up_perp + forward)
    origin = jnp.broadcast_to(camera.origin, direction.shape)
    return origin, direction


def tent_warp(u: jnp.ndarray, radius: float = 1.0) -> jnp.ndarray:
    """Warp U[0,1) samples to a tent distribution on [-radius, radius].

    Component-wise select, like the reference (camera.py:20-31).
    """
    lo = radius * (jnp.sqrt(2.0 * u) - 1.0)
    hi = radius * (1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * u, 0.0)))
    return jnp.where(u < 0.5, lo, hi)
