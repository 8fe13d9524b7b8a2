"""zdr_tpu — a TPU-native differentiable ray tracer.

A ground-up JAX/XLA rebuild of the capabilities of the `zdr` reference
renderer (a LuisaCompute/CUDA differentiable path tracer): differentiable
rendering of triangle scenes w.r.t. a material texture (diffuse RGB +
roughness A), with collocated / direct (NEE+MIS) / path (PRB) integrators.

Design (TPU-first, not a port):
  * Rays are batched arrays, not per-pixel GPU threads; integrators are pure
    jnp functions vmapped over ray wavefronts and `lax.scan`ned over spp.
  * Gradients come from JAX AD over pure shading code; the bilinear texture
    gather's VJP *is* the bilinear scatter-add (no atomics).
  * The backward pass is a decorrelated re-estimation at seed+1 wired in via
    `jax.custom_vjp` (matching the reference's torch.autograd.Function
    semantics, /root/reference/render.py:176-223).
  * BVH is built on host and traversed with `lax.while_loop`; small scenes
    use a dense, tiled brute-force intersector that keeps the VPU busy.
  * Multi-chip: pixels are sharded over a `jax.sharding.Mesh`; the gradient
    texture is combined with psum (see zdr_tpu.parallel).

Public API mirrors the reference (/root/reference/__init__.py:1):
    from zdr_tpu import Scene, Camera, float3
"""

from .dtypes import Camera, float3

__all__ = ["Scene", "Camera", "float3", "RenderConfig", "render_sharded", "make_mesh"]
__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: importing zdr_tpu stays side-effect free (unlike the reference,
    # whose `import zdr` runs luisa.init + GPU uploads, render.py:26).
    if name == "Scene":
        from .scene import Scene

        return Scene
    if name == "RenderConfig":
        from .integrators.wrapper import RenderConfig

        return RenderConfig
    if name == "render_sharded":
        from .parallel import render_sharded

        return render_sharded
    if name == "make_mesh":
        from .parallel import make_mesh

        return make_mesh
    raise AttributeError(f"module 'zdr_tpu' has no attribute {name!r}")
