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


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows (N, C) from (M, C) via per-component flat gathers.

    On TPU, `table[idx]` with a small trailing C pads C up to 128 lanes per
    gathered row (~30x wasted bandwidth); C separate (N,)-shaped gathers from
    column slices keep the lane axis on N. XLA hoists the column slices.
    """
    cols = [table[:, c][idx] for c in range(table.shape[1])]
    return jnp.stack(cols, axis=-1)


def surface_interact(hit: Hit, geom: Geometry) -> Interaction:
    prim = jnp.maximum(hit.prim, 0)  # clamp misses; callers mask by hit.miss
    tri = gather_rows(geom.triangles, prim)  # (N, 3)
    i0, i1, i2 = tri[..., 0], tri[..., 1], tri[..., 2]
    p0 = gather_rows(geom.positions, i0)
    p1 = gather_rows(geom.positions, i1)
    p2 = gather_rows(geom.positions, i2)
    uv = hit.interpolate(
        gather_rows(geom.uvs, i0), gather_rows(geom.uvs, i1), gather_rows(geom.uvs, i2)
    )
    ns = normalize(
        hit.interpolate(
            gather_rows(geom.normals, i0),
            gather_rows(geom.normals, i1),
            gather_rows(geom.normals, i2),
        )
    )
    ng = normalize(cross(p1 - p0, p2 - p0))
    p = hit.interpolate(p0, p1, p2)
    return Interaction(p=p, uv=uv, ns=ns, ng=ng)
