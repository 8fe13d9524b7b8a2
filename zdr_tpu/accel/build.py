"""Accel construction from Geometry."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry.mesh import Geometry
from .bvh import build_bvh
from .types import Accel

# Below this many triangles the dense Pallas sweep wins on TPU: it streams
# the whole VMEM-resident triangle table with zero gathers, and measured
# (262k rays, packed (T_pad, 16) layout) it beats the stackless BVH across
# its entire VMEM-feasible range — 18 ms at 960 tris vs ~420 ms traversal,
# 208 ms at 25k tris vs >1 s. The cap is derived from the ~512 B/triangle
# VMEM footprint (Mosaic needs the dynamic scalar index on sublanes, so the
# 16-wide component axis pads to 128 lanes): 16k tris x 512 B = 8 MB,
# leaving half of the 16 MB VMEM for the double-buffered ray blocks.
# (Round-2 used 20480, past the verified-safe bound — ADVICE.md r2 medium.)
AUTO_BVH_THRESHOLD = (8 << 20) // 512  # = 16384
# On CPU there is no Pallas sweep: "auto" uses the O(rays x T) jnp brute
# force, which is only sane for small scenes — beyond this the BVH's
# log-depth traversal wins despite its gather-heavy inner loop.
AUTO_BVH_THRESHOLD_CPU = 1024


def build_accel(geom: Geometry, method: str = "auto", chunk: int = 0) -> Accel:
    """Build an intersection structure for `geom`.

    Note on index spaces: `tri_perm` maps accel-order triangles to *global*
    triangle ids; `Accel.tri_inst` is indexed by global id (it is Geometry's
    own table), so Hit.prim is always a global triangle id regardless of
    method.
    """
    tris = np.asarray(geom.triangles)
    pos = np.asarray(geom.positions)
    v0 = pos[tris[:, 0]]
    v1 = pos[tris[:, 1]]
    v2 = pos[tris[:, 2]]
    T = tris.shape[0]

    if method == "auto":
        import jax

        on_cpu = jax.default_backend() == "cpu"
        if T > (AUTO_BVH_THRESHOLD_CPU if on_cpu else AUTO_BVH_THRESHOLD):
            # on accelerators the HBM-streamed MXU sweep (pallas_stream)
            # replaces tree traversal past the dense sweep's VMEM cap; the
            # BVH remains the CPU big-mesh path and available explicitly
            method = "bvh" if on_cpu else "stream"
        else:
            # dense sweep: pallas kernel on real accelerators (1.5x+ the jnp
            # brute force, measured); jnp on CPU (pallas interpret is slow)
            method = "bruteforce" if on_cpu else "pallas"

    if chunk <= 0:
        # Small chunks keep the (N_rays, chunk) intermediates fused in VMEM
        # instead of spilling to HBM; padding a tiny scene to a huge chunk
        # multiplies both compute and memory traffic (measured 20x+ on cbox).
        chunk = min(max(16, -(-T // 8) * 8), 128)

    dummy3 = jnp.zeros((1, 3), jnp.float32)
    dummy1i = jnp.zeros((1,), jnp.int32)
    dummy1b = jnp.zeros((1,), bool)

    if method == "stream":
        from ..integrators.pallas_stream import build_stream_tris

        p0j = jnp.asarray(v0)
        e1j = jnp.asarray(v1 - v0)
        e2j = jnp.asarray(v2 - v0)
        gat, boxes, t_pad, tile, schunk, verts9, order = build_stream_tris(
            p0j, e1j, e2j
        )
        return Accel(
            p0=p0j,
            e1=e1j,
            e2=e2j,
            tri_perm=jnp.arange(T, dtype=jnp.int32),
            tri_inst=geom.tri_inst,
            node_lo=dummy3,
            node_hi=dummy3,
            node_left=dummy1i,
            node_right=dummy1i,
            node_is_leaf=dummy1b,
            stream_arrays=(gat, boxes, verts9, order),
            stream_meta=(t_pad, tile, schunk),
            method="stream",
            chunk=chunk,
        )

    if method in ("bruteforce", "pallas"):
        return Accel(
            p0=jnp.asarray(v0),
            e1=jnp.asarray(v1 - v0),
            e2=jnp.asarray(v2 - v0),
            tri_perm=jnp.arange(T, dtype=jnp.int32),
            tri_inst=geom.tri_inst,
            node_lo=dummy3,
            node_hi=dummy3,
            node_left=dummy1i,
            node_right=dummy1i,
            node_is_leaf=dummy1b,
            method=method,
            chunk=chunk,
        )

    if method == "bvh":
        from .bvh import LEAF_SIZE, to_stackless
        from .native import build_bvh_native

        b = build_bvh_native(v0, v1, v2, LEAF_SIZE)
        if b is None:  # toolchain unavailable: python median-split fallback
            b = build_bvh(v0, v1, v2)
        stackless = to_stackless(b)
        perm = b.tri_perm  # (T_padded,) global ids, -1 pads
        safe = np.maximum(perm, 0)
        p0 = np.where(perm[:, None] >= 0, v0[safe], 0.0).astype(np.float32)
        e1 = np.where(perm[:, None] >= 0, (v1 - v0)[safe], 0.0).astype(np.float32)
        e2 = np.where(perm[:, None] >= 0, (v2 - v0)[safe], 0.0).astype(np.float32)
        return Accel(
            p0=jnp.asarray(p0),
            e1=jnp.asarray(e1),
            e2=jnp.asarray(e2),
            tri_perm=jnp.asarray(perm),
            tri_inst=geom.tri_inst,
            node_lo=jnp.asarray(b.node_lo),
            node_hi=jnp.asarray(b.node_hi),
            node_left=jnp.asarray(b.node_left),
            node_right=jnp.asarray(b.node_right),
            node_is_leaf=jnp.asarray(b.node_is_leaf),
            node_packed=jnp.asarray(stackless.node_packed),
            method="bvh",
            chunk=chunk,
        )

    raise ValueError(f"unknown accel method {method!r}")
