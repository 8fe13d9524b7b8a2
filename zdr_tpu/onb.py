"""Orthonormal basis (local shading frame).

Reference: /root/reference/onb.py (Frisvad-style branchless-ish basis).
Functions are batched over the last axis; an ONB is the tuple
(tangent, binormal, normal), each (..., 3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .vecmath import cross, dot, normalize


class Onb(NamedTuple):
    tangent: jnp.ndarray
    binormal: jnp.ndarray
    normal: jnp.ndarray

    def to_world(self, v: jnp.ndarray) -> jnp.ndarray:
        return (
            v[..., 0:1] * self.tangent
            + v[..., 1:2] * self.binormal
            + v[..., 2:3] * self.normal
        )

    def to_local(self, v: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack(
            [dot(v, self.tangent), dot(v, self.binormal), dot(v, self.normal)],
            axis=-1,
        )


def make_onb(normal: jnp.ndarray) -> Onb:
    """Build a local frame around `normal` (reference onb.py:20-28).

    Branch `abs(n.x) > abs(n.z)` becomes a jnp.where select.
    """
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    cond = (jnp.abs(nx) > jnp.abs(nz))[..., None]
    b_a = jnp.stack([-ny, nx, jnp.zeros_like(nx)], axis=-1)
    b_b = jnp.stack([jnp.zeros_like(nx), -nz, ny], axis=-1)
    binormal = normalize(jnp.where(cond, b_a, b_b))
    tangent = normalize(cross(binormal, normal))
    return Onb(tangent=tangent, binormal=binormal, normal=normal)
