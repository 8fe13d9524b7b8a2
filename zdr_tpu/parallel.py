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


@lru_cache(maxsize=None)
def build_render_batched(cfg: RenderConfig, mesh: Mesh, n_local: int) -> Callable:
    """Differentiable batched render: B (camera, emission) configurations
    sharded over the device mesh, each device rendering full frames for its
    batch slice (the light-stage/multi-view DCN story of SURVEY §5 —
    BASELINE.json config #5).

    (material, data, cameras, emissions, seed) -> (B, H, W, 4), where
    cameras is a leading-axis-stacked Camera pytree and emissions is
    (B, I, 3). Differentiable w.r.t. material: per-view gradients are
    summed locally and psum'd across the mesh (the multi-device analog of
    accumulating one gradient texture over sequential views).

    The light STRUCTURE (which instances can emit) is fixed across the
    batch — per-view emission values vary freely (update_lights value
    semantics); turning a light structurally off for one view only is not
    expressible here, match by keeping a small nonzero emission instead."""
    estimator, backward = get_integrator(cfg.integrator)
    w, h = cfg.res
    import dataclasses

    def fwd_impl(material, data, cameras, emissions, seed, it_start):
        coords = _pixel_grid(cfg.res)

        def body(cam_shard, em_shard, material, data, seed, it_start):
            base = jax.lax.axis_index(AXIS) * n_local

            def one(i):
                cam = jax.tree.map(lambda x: x[i], cam_shard)
                d = dataclasses.replace(data, emission=em_shard[i])
                rgb = render_forward_rays(
                    d, material, cam, seed + 7919 * (base + i), cfg,
                    estimator, coords, it_start,
                )
                return rgb.reshape(h, w, 3)

            return jax.lax.map(one, jnp.arange(n_local))

        rgb = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P(), P(), P()),
            out_specs=P(AXIS),
            check_vma=False,
        )(cameras, emissions, material, data, seed, it_start)
        alpha = jnp.ones(rgb.shape[:-1] + (1,), jnp.float32)
        return jnp.concatenate([rgb, alpha], axis=-1)

    def grad_impl(material, data, cameras, emissions, seed, d_images, it_start):
        coords = _pixel_grid(cfg.res)
        count = cfg.window_count
        le = d_images[..., :3].reshape(-1, h * w, 3) / count
        le = jnp.where(jnp.isnan(le), 0.0, le)

        def body(cam_shard, em_shard, le_shard, material, data, seed, it_start):
            base = jax.lax.axis_index(AXIS) * n_local

            def one(i):
                cam = jax.tree.map(lambda x: x[i], cam_shard)
                d = dataclasses.replace(data, emission=em_shard[i])
                return render_grad_rays(
                    d, material, cam, seed + 7919 * (base + i), le_shard[i],
                    cfg, estimator, backward, coords, it_start,
                )

            g = jax.lax.map(one, jnp.arange(n_local)).sum(axis=0)
            return jax.lax.psum(g, AXIS)

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(cameras, emissions, le, material, data, seed, it_start)

    @jax.custom_vjp
    def render(material, data, cameras, emissions, seed, it_start):
        return fwd_impl(material, data, cameras, emissions, seed, it_start)

    def fwd(material, data, cameras, emissions, seed, it_start):
        return render(material, data, cameras, emissions, seed, it_start), (
            material, data, cameras, emissions, seed, it_start,
        )

    def bwd(saved, g):
        material, data, cameras, emissions, seed, it_start = saved
        d_mat = grad_impl(
            material, data, cameras, emissions, seed + 1, g, it_start
        )
        return (
            d_mat,
            _zero_cotangent(data),
            _zero_cotangent(cameras),
            _zero_cotangent(emissions),
            _zero_cotangent(seed),
            _zero_cotangent(it_start),
        )

    render.defvjp(fwd, bwd)
    jitted = jax.jit(render)

    def call(material, data, cameras, emissions, seed, it_start=0):
        return jitted(
            material, data, cameras, emissions, seed,
            jnp.asarray(it_start, jnp.int32),
        )

    return call


def render_batch(
    scene,
    material,
    cameras,
    emissions,
    *,
    res,
    spp,
    seed=0,
    mesh: Optional[Mesh] = None,
):
    """Batched multi-view / multi-light render: one frame per (camera,
    emission) pair, batch sharded across the device mesh. Returns
    (B, H, W, 4); differentiable w.r.t. material (gradients summed over
    views, matching sequential renders + gradient accumulation).

    cameras: a Camera, or list of B Cameras. emissions: (B, I, 3)-like, or
    a list of B `update_lights`-style per-instance emission lists. B must
    be divisible by the mesh size."""
    import numpy as np
    from .scene import _normalize_emission

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if not isinstance(emissions, jnp.ndarray):
        em = [
            np.stack([_normalize_emission(e) for e in pattern])
            for pattern in emissions
        ]
        emissions = jnp.asarray(np.stack(em))
    b = emissions.shape[0]
    if b % n_dev != 0:
        raise ValueError(f"batch {b} not divisible by mesh size {n_dev}")
    if not isinstance(cameras, (list, tuple)):
        cameras = [cameras] * b
    if len(cameras) != b:
        raise ValueError(f"{len(cameras)} cameras for batch {b}")
    cam_stack = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x, jnp.float32) for x in xs]),
        *cameras,
    )
    material = jnp.asarray(material)
    seed = jnp.asarray(seed, jnp.int32)
    spp = int(spp)
    chunk = scene.max_spp_per_call
    n_local = b // n_dev
    if spp <= chunk:
        fn = build_render_batched(scene._config(res, spp), mesh, n_local)
        return fn(material, scene._data, cam_stack, emissions, seed)
    img = None
    start = 0
    while start < spp:
        count = min(chunk, spp - start)
        fn = build_render_batched(
            scene._config(res, spp, it_count=count), mesh, n_local
        )
        part = fn(
            material, scene._data, cam_stack, emissions, seed, start
        ) * (count / spp)
        img = part if img is None else img + part
        start += count
    return img


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
