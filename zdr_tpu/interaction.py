"""Hit → surface info, batched (reference: /root/reference/interaction.py:9-30).

Simpler than the reference because geometry is pre-transformed to world space
at build time (see geometry/mesh.py): no bindless reads, no per-hit instance
transform or inverse-transpose — just three gathers and interpolation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .accel import Hit
from .geometry.mesh import Geometry
from .vecmath import cross, normalize


class Interaction(NamedTuple):
    p: jnp.ndarray  # (N, 3) hit position
    uv: jnp.ndarray  # (N, 2) texture coords
    ns: jnp.ndarray  # (N, 3) shading normal (interpolated)
    ng: jnp.ndarray  # (N, 3) geometric normal


def surface_interact(hit: Hit, geom: Geometry) -> Interaction:
    prim = jnp.maximum(hit.prim, 0)  # clamp misses; callers mask by hit.miss
    tri = geom.triangles[prim]  # (N, 3)
    p0 = geom.positions[tri[..., 0]]
    p1 = geom.positions[tri[..., 1]]
    p2 = geom.positions[tri[..., 2]]
    uv = hit.interpolate(geom.uvs[tri[..., 0]], geom.uvs[tri[..., 1]], geom.uvs[tri[..., 2]])
    ns = normalize(
        hit.interpolate(
            geom.normals[tri[..., 0]], geom.normals[tri[..., 1]], geom.normals[tri[..., 2]]
        )
    )
    ng = normalize(cross(p1 - p0, p2 - p0))
    p = hit.interpolate(p0, p1, p2)
    return Interaction(p=p, uv=uv, ns=ns, ng=ng)
