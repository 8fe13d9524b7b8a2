"""Ray-scene intersection (the reference's `luisa.Accel` / OptiX replacement).

Reference usage: accel.trace_closest / trace_any (direct.py:22,44, prb.py:25)
with hardware BVH + RT cores. TPUs have neither, so this package supplies:

  * `bruteforce` — dense, triangle-chunked Möller–Trumbore over the whole
    scene. All-lanes-busy VPU work; for the reference's scene sizes (tens to
    a few thousand triangles) this is the fastest option on TPU because it
    has no divergence and no gather-dependent latency chains.
  * `bvh` — host-built BVH with a batched `lax.while_loop` traversal for
    larger meshes.

`build_accel` picks a method ('auto' selects brute force below a triangle
threshold) and returns an Accel pytree; `trace_closest`/`trace_any` dispatch
on it inside jit.
"""

from .types import Accel, Hit
from .build import build_accel
from .trace import trace_any, trace_closest

__all__ = ["Accel", "Hit", "build_accel", "trace_closest", "trace_any"]
