"""Accel / Hit pytree types."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Hit(NamedTuple):
    """Batched hit record (reference: luisa hit with .inst/.prim/.ray_t/bary).

    Barycentric convention matches LuisaCompute's `hit.interpolate`:
    p = (1-u-v)*p0 + u*p1 + v*p2 (interaction.py:24-26).
    """

    t: jnp.ndarray  # (N,) float32; +inf on miss
    prim: jnp.ndarray  # (N,) int32 global triangle index; -1 on miss
    inst: jnp.ndarray  # (N,) int32 instance id; -1 on miss
    bary_u: jnp.ndarray  # (N,)
    bary_v: jnp.ndarray  # (N,)

    @property
    def miss(self) -> jnp.ndarray:
        return self.prim < 0

    def interpolate(self, a0, a1, a2):
        """Barycentric interpolation of per-vertex attributes (..., C)."""
        w0 = (1.0 - self.bary_u - self.bary_v)[..., None]
        return w0 * a0 + self.bary_u[..., None] * a1 + self.bary_v[..., None] * a2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Accel:
    """Intersection-ready triangle data (+ optional BVH arrays).

    Triangles are stored as (p0, e1, e2) so Möller–Trumbore needs no
    per-intersection edge computation. `tri_perm` maps the accel's triangle
    order back to the Geometry's global triangle ids (BVH builds reorder
    triangles for leaf locality; brute force keeps identity).
    """

    p0: jnp.ndarray  # (T, 3)
    e1: jnp.ndarray  # (T, 3)
    e2: jnp.ndarray  # (T, 3)
    tri_perm: jnp.ndarray  # (T,) int32: accel index -> global triangle id
    tri_inst: jnp.ndarray  # int32: instance id per *global* triangle id
    # BVH arrays (size-1 dummies for brute force)
    node_lo: jnp.ndarray  # (M, 3) child-union AABB min
    node_hi: jnp.ndarray  # (M, 3)
    node_left: jnp.ndarray  # (M,) int32; internal: child index, leaf: tri start
    node_right: jnp.ndarray  # (M,) int32; internal: child index, leaf: -count
    node_is_leaf: jnp.ndarray  # (M,) bool
    # stackless (escape-link) node rows, DFS preorder: [lo3, hi3,
    # bitcast(escape), bitcast(is_leaf ? tri_start+1 : 0)] — one row-gather
    # per node visit in the TPU traversal (bvh.to_stackless)
    node_packed: jnp.ndarray = None  # (M, 8) float32
    # HBM-streamed MXU sweep tables (method == "stream"; pallas_stream):
    # (gat, boxes, verts9, order) arrays + static (t_pad, tile, chunk)
    stream_arrays: tuple = None
    stream_meta: tuple = dataclasses.field(
        metadata=dict(static=True), default=None
    )
    method: str = dataclasses.field(metadata=dict(static=True), default="bruteforce")
    chunk: int = dataclasses.field(metadata=dict(static=True), default=256)
    # BVH traversal flavor (static, part of the jit key — replaces round-2's
    # mutable module global, which jit-cached programs silently ignored):
    #   "auto"      — 2-tier compacted loop for big ray batches, plain
    #                 stackless otherwise (the in-render default)
    #   "stackless" — plain escape-link loop
    # (a "tiered4" 4-width lax.switch variant existed in rounds 2-3; it was
    # compile-prohibitive inside render graphs and is retired — big meshes
    # route to the HBM-streamed MXU sweep instead, method="stream")
    traversal: str = dataclasses.field(metadata=dict(static=True), default="auto")

    @property
    def num_triangles(self) -> int:
        return self.p0.shape[0]

    @property
    def stream_pack(self):
        """(gat, boxes, t_pad, tile, chunk, verts9, order) — the tuple
        pallas_stream's standalone wrappers consume."""
        gat, boxes, verts9, order = self.stream_arrays
        t_pad, tile, chunk = self.stream_meta
        return gat, boxes, t_pad, tile, chunk, verts9, order
