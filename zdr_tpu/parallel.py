"""Multi-chip rendering: pixels sharded over an ICI mesh, gradient psum'd.

The reference has no distributed capability at all (SURVEY.md §2,
"Parallelism"): its parallel axes are the CUDA SIMT grid and per-thread spp
loops. The TPU-native story, built here from scratch:

  * a 1D `jax.sharding.Mesh` over axis "px" — the SIMT-grid analog: each
    device owns a contiguous slice of the flat pixel array;
  * `shard_map` runs the (estimator-agnostic) per-ray forward/backward on
    each slice — geometry, material and camera are replicated (in_specs P());
  * the material-texture gradient is combined with `jax.lax.psum` over the
    mesh — the collective that replaces the reference's atomic scatter-adds
    across the GPU (interaction.py:67-70);
  * a batched light-stage workload (many cameras / light configs) can map
    the same machinery over a leading batch axis (see render_lightstage in
    apps/lightstage.py).

Collectives ride ICI when the mesh is a physical TPU slice; on CPU this is
validated with xla_force_host_platform_device_count (tests/test_parallel.py
and __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .integrators import get_integrator
from .integrators.wrapper import (
    RenderConfig,
    _pixel_grid,
    _zero_cotangent,
    render_forward_rays,
    render_grad_rays,
)

AXIS = "px"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1D device mesh over the pixel axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (AXIS,))


@lru_cache(maxsize=None)
def build_render_sharded(cfg: RenderConfig, mesh: Mesh) -> Callable:
    """Differentiable sharded render: (material, data, camera, seed) ->
    (H, W, 4), with pixels split over the mesh and d_material psum'd.

    Requires W*H to be divisible by the mesh size."""
    estimator, backward = get_integrator(cfg.integrator)
    w, h = cfg.res
    n_dev = mesh.devices.size
    if (w * h) % n_dev != 0:
        raise ValueError(f"pixel count {w*h} not divisible by mesh size {n_dev}")

    def fwd_impl(material, data, camera, seed, it_start):
        coords = _pixel_grid(cfg.res)

        def body(coords_shard, material, data, camera, seed, it_start):
            return render_forward_rays(
                data, material, camera, seed, cfg, estimator, coords_shard,
                it_start,
            )

        rgb = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AXIS), P(), P(), P(), P(), P()),
            out_specs=P(AXIS),
            check_vma=False,
        )(coords, material, data, camera, seed, it_start)
        rgb = rgb.reshape(h, w, 3)
        return jnp.concatenate([rgb, jnp.ones((h, w, 1), jnp.float32)], axis=-1)

    def grad_impl(material, data, camera, seed, d_image, it_start):
        coords = _pixel_grid(cfg.res)
        # per-sample adjoint of this WINDOW's mean (matches wrapper.render_grad)
        count = cfg.window_count
        le_grad = d_image[..., :3].reshape(h * w, 3) / count
        le_grad = jnp.where(jnp.isnan(le_grad), 0.0, le_grad)

        def body(coords_shard, le_shard, material, data, camera, seed, it_start):
            g = render_grad_rays(
                data, material, camera, seed, le_shard, cfg, estimator,
                backward, coords_shard, it_start,
            )
            # the atomic-scatter analog: combine per-device texture grads
            return jax.lax.psum(g, AXIS)

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(coords, le_grad, material, data, camera, seed, it_start)

    @jax.custom_vjp
    def render(material, data, camera, seed, it_start):
        return fwd_impl(material, data, camera, seed, it_start)

    def fwd(material, data, camera, seed, it_start):
        return render(material, data, camera, seed, it_start), (
            material, data, camera, seed, it_start,
        )

    def bwd(saved, g):
        material, data, camera, seed, it_start = saved
        d_mat = grad_impl(material, data, camera, seed + 1, g, it_start)
        return (
            d_mat,
            _zero_cotangent(data),
            _zero_cotangent(camera),
            _zero_cotangent(seed),
            _zero_cotangent(it_start),
        )

    render.defvjp(fwd, bwd)
    jitted = jax.jit(render)

    def call(material, data, camera, seed, it_start=0):
        return jitted(
            material, data, camera, seed, jnp.asarray(it_start, jnp.int32)
        )

    return call


def render_sharded(
    scene,
    material,
    *,
    res,
    spp,
    seed=0,
    mesh: Optional[Mesh] = None,
):
    """Scene.render, but sharded over a device mesh (defaults to all
    devices). Differentiable w.r.t. material like Scene.render.

    Big-spp jobs are sliced into the same sample windows Scene.render uses
    (scene.max_spp_per_call), so per-device executions stay under the remote
    worker's time limit and results bit-match the single-device path."""
    if mesh is None:
        mesh = make_mesh()
    material = jnp.asarray(material)
    seed = jnp.asarray(seed, jnp.int32)
    spp = int(spp)
    chunk = scene.max_spp_per_call
    if spp <= chunk:
        fn = build_render_sharded(scene._config(res, spp), mesh)
        return fn(material, scene._data, scene.camera, seed)
    img = None
    start = 0
    while start < spp:
        count = min(chunk, spp - start)
        fn = build_render_sharded(scene._config(res, spp, it_count=count), mesh)
        part = fn(material, scene._data, scene.camera, seed, start) * (count / spp)
        img = part if img is None else img + part
        start += count
    return img
