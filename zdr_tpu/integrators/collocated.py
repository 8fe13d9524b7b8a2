"""Collocated-light integrator (reference: /root/reference/collocated.py).

A unit point light rides at the camera; one closest-hit, no shadow rays, no
scene lights. The hand-written backward mirrors the reference's in-kernel
autodiff region (collocated.py:34-57): recompute the hit, differentiate the
shading math w.r.t. the fetched 4-vector, splat through the fast sorted-
segment scatter (or the unbiased stochastic single-corner splat). The
generic jax.grad route through read_bsdf's custom_vjp reaches the same
sorted contention-immune pipeline (texture.py:_read_bsdf_bwd); this
hand-written backward remains the faster path because it also gets the
stochastic single-corner splat and the reference's detach points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..accel import trace_closest
from ..interaction import surface_interact
from ..microfacet import ggx_brdf
from ..onb import make_onb
from ..scenedata import SceneData
from ..texture import read_bsdf
from ..vecmath import dot

SPECULAR = 0.04  # fixed specular F0, reference collocated.py:25


def _shade_parts(data, material, ray_o, ray_d, bilinear):
    """Shared fwd/bwd recompute: hit -> (valid, uv, mat, wo_local, li)."""
    hit = trace_closest(data.accel, ray_o, ray_d)
    it = surface_interact(hit, data.geom)
    wo = -ray_d
    valid = (
        (~hit.miss)
        & (dot(wo, it.ng) >= 1e-4)
        & (dot(wo, it.ns) >= 1e-4)
    )
    mat = read_bsdf(it.uv, material, bilinear)
    onb = make_onb(it.ns)
    wo_local = onb.to_local(wo)
    li = (1.0 / jnp.maximum(hit.t, 1e-6)) ** 2  # unit intensity, 1/r^2
    return valid, it.uv, mat, wo_local, li


def collocated_estimator(data: SceneData, material, ray_o, ray_d, sampler, cfg=None):
    bilinear = True if cfg is None else cfg.bilinear
    valid, _uv, mat, wo_local, li = _shade_parts(data, material, ray_o, ray_d, bilinear)
    beta = ggx_brdf(wo_local, wo_local, mat[..., :3], SPECULAR, mat[..., 3])
    radiance = beta * li[..., None]
    return jnp.where(valid[..., None], radiance, 0.0)


def collocated_backward(data, material, ray_o, ray_d, sampler, le_grad, cfg=None):
    """Gradient walk (reference collocated.py:34-57): one recomputed hit,
    adjoint through the GGX shade only, fast texture splat."""
    from ..samplers.hashes import lcg_to_unit_float
    from ..texture import (
        cm_to_texture,
        segment_scatter_add,
        stochastic_corner_ids,
        write_bsdf_grad,
    )

    bilinear = True if cfg is None else cfg.bilinear
    material = jax.lax.stop_gradient(material)
    valid, uv, mat, wo_local, li = _shade_parts(data, material, ray_o, ray_d, bilinear)

    def shade(mat4):
        return ggx_brdf(wo_local, wo_local, mat4[..., :3], SPECULAR, mat4[..., 3])

    _, vjp = jax.vjp(shade, mat)
    ct = jnp.where(valid[..., None], li[..., None] * le_grad, 0.0)
    (mat_grad,) = vjp(ct)
    mat_grad = jnp.where(jnp.isnan(mat_grad), 0.0, mat_grad)
    masked = jnp.where(valid[..., None], mat_grad, 0.0)

    h, w = material.shape[0], material.shape[1]
    if cfg is not None and getattr(cfg, "stochastic_splat", False) and bilinear:
        u_splat = lcg_to_unit_float(sampler.salt())
        ids = stochastic_corner_ids(uv, u_splat, h, w)
        add = segment_scatter_add(
            ids, [masked[..., c] for c in range(4)], h * w, channel_major=True
        )
        return cm_to_texture(add, h, w)
    return write_bsdf_grad(uv, masked, jnp.zeros_like(material), bilinear)
