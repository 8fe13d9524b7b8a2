"""Batched 3D vector math over the last axis.

All renderer code operates on arrays whose last axis is the vector dimension
(..., 3). Written once here so integrators stay readable and XLA fuses
everything into the surrounding elementwise graph.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def length_squared(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_squared(a))


def normalize(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return a * jnp.reciprocal(jnp.maximum(length(a), eps))[..., None]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction d about normal n (d points *into* the surface)."""
    return d - 2.0 * dot(d, n)[..., None] * n


def lerp(a, b, t):
    return a + (b - a) * t


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """CIE Y from linear RGB (reference: prb.py:80, envmap.py:110)."""
    w = jnp.array([0.212671, 0.715160, 0.072169], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def offset_ray_origin(p: jnp.ndarray, ng: jnp.ndarray, dist: float = 1e-4) -> jnp.ndarray:
    """Nudge a ray origin along the geometric normal to avoid self-hits.

    The reference relies on luisa.offset_ray_origin (direct.py:61); a fixed
    epsilon along ng is sufficient at the scene scales exercised here.
    """
    return p + dist * ng
