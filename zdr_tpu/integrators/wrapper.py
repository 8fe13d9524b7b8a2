"""Render wrapper: pixel grid -> primary rays -> spp scan -> image, plus the
decorrelated backward pass, assembled into a jax.custom_vjp.

This is the TPU inversion of the reference's megakernel wrappers
(integrator.py:8-53): instead of one GPU thread per pixel looping over spp,
the whole pixel grid is one flat ray batch and spp is a `lax.scan`
(accumulating into the image), so every step is a full-width wavefront. The
backward pass follows render.py:176-199 + integrator.py:32-53: it does NOT
differentiate the stored forward pass — it re-estimates the gradient with an
independent sample stream at seed+1, reading d_image/spp as the per-sample
adjoint. That keeps memory flat (nothing is taped across spp) and matches
the reference's statistics.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import generate_ray, tent_warp
from ..dtypes import Camera
from ..samplers import make_sampler
from ..scenedata import SceneData

RADIANCE_CLAMP = 1e5  # reference integrator.py:28


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render settings (one frozen dataclass instead of the
    reference's scattered module-level flags — SURVEY.md §5)."""

    res: Tuple[int, int]  # (width, height)
    spp: int
    integrator: str = "direct"
    sampler: str = "lcg"
    use_tent_filter: bool = True
    # direct integrator: MIS (light + BSDF sampling) vs light-only
    # (reference direct.py:11-14; was a module-level flag there)
    use_mis: bool = True
    # path integrator depth / Russian-roulette start (reference prb.py:15-16)
    max_depth: int = 16
    rr_depth: int = 2
    # bilinear vs nearest material-texture filtering (ref interaction.py:33)
    bilinear: bool = True
    # path integrator: persistent-lane forward (dead paths immediately
    # restart on the lane's next spp sample — see path_persistent.py)
    persistent: bool = True
    # path PRB backward: unbiased single-corner texture-gradient splat
    # (4x fewer scatter entries; see texture.write_bsdf_grad_stochastic)
    stochastic_splat: bool = True
    # splat flush packs channel pairs as bf16 (2x fewer scatter updates at
    # ~0.3% relative splat quantization; see texture.segment_scatter_add4)
    packed_splat: bool = True
    # PRB backward: weighted-reservoir merge of this many consecutive bounce
    # iterations' gradient taps into ONE splat-buffer row (unbiased; exact
    # whenever at most one tap in the group is real — see
    # texture.reservoir_merge_taps). Divides the flush volume — the dominant
    # cost of the fused backward — by the same factor. 1 = every tap splats.
    # Default 4: measured (v5e-1, cbox 512^2 spp64) full iteration 2.59 ->
    # 1.72 s with merged-vs-unmerged gradient deviation 1e-4 rel L1, 5x
    # BELOW the seed-to-seed MC noise floor (5e-4) of the same estimator.
    splat_merge: int = 4
    # path/direct integrators: fused Pallas bounce megakernels when the
    # scene is in scope (mesh-lights-only, lcg sampler, small dense scene —
    # see integrators/pallas_bounce.py). "auto" uses them on real
    # accelerators only (pallas interpret mode on CPU is ~8x slower than
    # the unfused jnp walk); "force" uses them everywhere (tests); False
    # disables them.
    fused: object = "auto"
    # bilinear fetch table in bfloat16: faster row-gathers (the hottest op in
    # a path bounce) at <=0.4% material quantization on the fetch path only
    # (texture.pack_quads); the API texture and gradient stay float32
    texture_bf16: bool = False
    # persistent path loop: parallel lanes per pixel. Measured: K>1 loses on
    # TPU (per-element throughput dominates and per-lane tails idle more),
    # so default 1; kept as a tuning knob for other topologies.
    lanes_per_pixel: int = 1
    # fused paths: order lanes along the pixel Z-curve so each 512-lane MXU
    # sweep row is a compact screen tile — whole rows of primary misses /
    # dead paths then skip every triangle tile (pallas_bounce.
    # spatial_lane_perm). "morton" (default) or "linear" (raster order).
    lane_order: str = "morton"

    def __post_init__(self):
        # typos like "Morton"/"zorder" would otherwise silently fall back
        # to raster order in every `== "morton"` check (ADVICE r3)
        if self.lane_order not in ("morton", "linear"):
            raise ValueError(
                f"lane_order must be 'morton' or 'linear', got "
                f"{self.lane_order!r}"
            )
    # sample-window SIZE rendered by this call; 0 means the full spp range.
    # Scene.render slices big jobs into several device calls of this size
    # (identical sampling — the sampler is keyed by global spp and absolute
    # sample index) to keep single executions under the remote-TPU worker's
    # time limit. The window START is a *traced* argument to the render
    # callable, so consecutive windows share one compiled program.
    it_count: int = 0

    @property
    def window_count(self) -> int:
        return self.it_count if self.it_count > 0 else self.spp


def _pixel_grid(res: Tuple[int, int]) -> jnp.ndarray:
    w, h = res
    x = jnp.arange(w, dtype=jnp.int32)
    y = jnp.arange(h, dtype=jnp.int32)
    xx, yy = jnp.meshgrid(x, y)  # (h, w), x fastest
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)  # (h*w, 2)


def _primary_rays(coords, camera: Camera, sampler, res, use_tent_filter):
    """Pixel jitter + NDC mapping + ray gen (integrator.py:19-24)."""
    w, h = res
    u2, sampler = sampler.next2()
    if use_tent_filter:
        offset = tent_warp(u2, 1.0) + 0.5
    else:
        offset = u2
    resf = jnp.array([w, h], jnp.float32)
    pixel = 2.0 / resf * (coords.astype(jnp.float32) + offset) - 1.0
    pixel = pixel * jnp.array([1.0, h / w], jnp.float32)  # y aspect correction
    o, d = generate_ray(camera, pixel)
    return o, d, sampler


def render_forward_rays(
    data: SceneData,
    material: jnp.ndarray,
    camera: Camera,
    seed,
    cfg: RenderConfig,
    estimator: Callable,
    coords: jnp.ndarray,
    it_start=0,
) -> jnp.ndarray:
    """spp-averaged radiance for an arbitrary pixel-coord batch -> (M, 3).

    `it_start` (traced) is the absolute first sample index of this call's
    window (size cfg.window_count) — dynamic so every spp window of a big
    render shares one compiled program.

    This is the shardable unit: devices each take a slice of the pixel grid
    (see zdr_tpu.parallel)."""
    if cfg.integrator == "path" and cfg.persistent:
        from .pallas_loop import loop_eligible, render_path_loop
        from .path_fused import fused_eligible, render_path_fused
        from .path_persistent import render_path_persistent

        if cfg.bilinear and material.shape[0] >= 2 and material.shape[1] >= 2:
            if loop_eligible(data, cfg):
                return render_path_loop(
                    data, material, camera, seed, cfg, coords, it_start
                )
            if fused_eligible(data, cfg):
                return render_path_fused(data, material, camera, seed, cfg, coords, it_start)
        return render_path_persistent(data, material, camera, seed, cfg, coords, it_start)

    if cfg.integrator == "direct":
        from .direct_fused import direct_fused_eligible, render_direct_fused

        if cfg.bilinear and material.shape[0] >= 2 and material.shape[1] >= 2 and direct_fused_eligible(data, cfg):
            return render_direct_fused(
                data, material, camera, seed, cfg, coords, it_start
            )

    if cfg.integrator == "collocated":
        from .collocated_fused import (
            collocated_fused_eligible,
            render_collocated_fused,
        )

        if cfg.bilinear and material.shape[0] >= 2 and material.shape[1] >= 2 and collocated_fused_eligible(data, cfg):
            return render_collocated_fused(
                data, material, camera, seed, cfg, coords, it_start
            )

    start, count = it_start, cfg.window_count

    def one_sample(acc, it):
        sampler = make_sampler(cfg.sampler, coords, seed, cfg.spp, it)
        o, d, sampler = _primary_rays(coords, camera, sampler, cfg.res, cfg.use_tent_filter)
        radiance = estimator(data, material, o, d, sampler, cfg)
        good = ~jnp.any(jnp.isnan(radiance), axis=-1, keepdims=True)
        radiance = jnp.where(good, jnp.clip(radiance, 0.0, RADIANCE_CLAMP), 0.0)
        return acc + radiance, None

    acc, _ = jax.lax.scan(
        one_sample,
        jnp.zeros((coords.shape[0], 3), jnp.float32),
        start + jnp.arange(count),
    )
    return acc / count


def render_forward(
    data: SceneData,
    material: jnp.ndarray,
    camera: Camera,
    seed,
    cfg: RenderConfig,
    estimator: Callable,
    it_start=0,
) -> jnp.ndarray:
    """Forward render -> (H, W, 4) image (mean radiance, alpha=1)."""
    w, h = cfg.res
    coords = _pixel_grid(cfg.res)
    rgb = render_forward_rays(
        data, material, camera, seed, cfg, estimator, coords, it_start
    )
    rgb = rgb.reshape(h, w, 3)
    alpha = jnp.ones((h, w, 1), jnp.float32)
    return jnp.concatenate([rgb, alpha], axis=-1)


def render_grad_rays(
    data: SceneData,
    material: jnp.ndarray,
    camera: Camera,
    seed,
    le_grad: jnp.ndarray,
    cfg: RenderConfig,
    estimator: Callable,
    backward: Optional[Callable],
    coords: jnp.ndarray,
    it_start=0,
) -> jnp.ndarray:
    """d_material for one pixel-coord batch given per-sample adjoints (M,3)."""
    if cfg.integrator == "path" and cfg.persistent:
        from .pallas_loop import loop_eligible, render_path_backward_loop
        from .path_fused import fused_eligible, render_path_backward_fused
        from .path_persistent import render_path_backward_persistent

        if cfg.bilinear and material.shape[0] >= 2 and material.shape[1] >= 2:
            if loop_eligible(data, cfg):
                return render_path_backward_loop(
                    data, material, camera, seed, cfg, coords, le_grad,
                    it_start,
                )
            if fused_eligible(data, cfg):
                return render_path_backward_fused(
                    data, material, camera, seed, cfg, coords, le_grad, it_start
                )
        return render_path_backward_persistent(
            data, material, camera, seed, cfg, coords, le_grad, it_start
        )

    if cfg.integrator == "direct":
        from .direct_fused import (
            direct_fused_eligible,
            render_direct_backward_fused,
        )

        if cfg.bilinear and material.shape[0] >= 2 and material.shape[1] >= 2 and direct_fused_eligible(data, cfg):
            return render_direct_backward_fused(
                data, material, camera, seed, cfg, coords, le_grad, it_start
            )

    if cfg.integrator == "collocated":
        from .collocated_fused import (
            collocated_fused_eligible,
            render_collocated_backward_fused,
        )

        if cfg.bilinear and material.shape[0] >= 2 and material.shape[1] >= 2 and collocated_fused_eligible(data, cfg):
            return render_collocated_backward_fused(
                data, material, camera, seed, cfg, coords, le_grad, it_start
            )

    start, count = it_start, cfg.window_count

    def one_sample(d_mat, it):
        sampler = make_sampler(cfg.sampler, coords, seed, cfg.spp, it)
        o, d, sampler = _primary_rays(coords, camera, sampler, cfg.res, cfg.use_tent_filter)
        if backward is not None:
            contrib = backward(data, material, o, d, sampler, le_grad, cfg)
        else:
            def weighted(mat):
                radiance = estimator(data, mat, o, d, sampler, cfg)
                radiance = jnp.where(jnp.isnan(radiance), 0.0, radiance)
                return jnp.sum(radiance * le_grad)

            contrib = jax.grad(weighted)(material)
        return d_mat + contrib, None

    d_mat, _ = jax.lax.scan(
        one_sample, jnp.zeros_like(material), start + jnp.arange(count)
    )
    return d_mat


def render_grad(
    data: SceneData,
    material: jnp.ndarray,
    camera: Camera,
    seed,
    d_image: jnp.ndarray,
    cfg: RenderConfig,
    estimator: Callable,
    backward: Optional[Callable],
    it_start=0,
) -> jnp.ndarray:
    """Gradient estimator (integrator.py:32-53): replay rays at this seed,
    inject d_image/spp as the per-sample adjoint, accumulate d_material."""
    w, h = cfg.res
    coords = _pixel_grid(cfg.res)
    # per-sample adjoint: the incoming cotangent of this window's MEAN,
    # divided by the window sample count (chunk weighting in Scene.render
    # makes this equal d_image/spp overall — integrator.py:38 semantics)
    count = cfg.window_count
    le_grad = d_image[..., :3].reshape(h * w, 3) / count
    le_grad = jnp.where(jnp.isnan(le_grad), 0.0, le_grad)
    return render_grad_rays(
        data, material, camera, seed, le_grad, cfg, estimator, backward, coords,
        it_start,
    )


def _zero_cotangent(tree):
    """Zero cotangents for a pytree with integer/bool leaves (float0)."""

    def z(x):
        if hasattr(x, "dtype") and (
            jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_
        ):
            return np.zeros(x.shape, dtype=jax.dtypes.float0)
        if hasattr(x, "dtype"):
            return jnp.zeros_like(x)
        return np.zeros((), dtype=jax.dtypes.float0)

    return jax.tree.map(z, tree)


@lru_cache(maxsize=None)
def build_render(cfg: RenderConfig) -> Callable:
    """Build the differentiable render callable for a static config.

    The returned function has signature (material, data, camera, seed,
    it_start=0) -> (H, W, 4) image, differentiable w.r.t. material only,
    with the backward pass running the decorrelated gradient estimator at
    seed+1 (render.py:196). `it_start` is the traced absolute sample-window
    start, so Scene.render's spp windows all share this one program."""
    from . import get_integrator

    estimator, backward = get_integrator(cfg.integrator)

    @jax.custom_vjp
    def render(material, data, camera, seed, it_start):
        return render_forward(
            data, material, camera, seed, cfg, estimator, it_start
        )

    def fwd(material, data, camera, seed, it_start):
        return render(material, data, camera, seed, it_start), (
            material, data, camera, seed, it_start,
        )

    def bwd(saved, g):
        material, data, camera, seed, it_start = saved
        d_mat = render_grad(
            data, material, camera, seed + 1, g, cfg, estimator, backward,
            it_start,
        )
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
        return jitted(material, data, camera, seed, jnp.asarray(it_start, jnp.int32))

    return call
