"""Collocated-light integrator (reference: /root/reference/collocated.py).

A unit point light rides at the camera; one closest-hit, no shadow rays, no
scene lights. The backward pass is jax.grad of this estimator (backward=None
in the registry): since everything differentiable flows through read_bsdf ->
ggx_brdf, JAX's VJP reproduces the reference's in-kernel autodiff + bilinear
atomic scatter (collocated.py:34-57) exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..accel import trace_closest
from ..interaction import surface_interact
from ..microfacet import ggx_brdf
from ..onb import make_onb
from ..scenedata import SceneData
from ..texture import read_bsdf
from ..vecmath import dot

SPECULAR = 0.04  # fixed specular F0, reference collocated.py:25


def collocated_estimator(data: SceneData, material, ray_o, ray_d, sampler):
    hit = trace_closest(data.accel, ray_o, ray_d)
    it = surface_interact(hit, data.geom)
    wo = -ray_d
    valid = (
        (~hit.miss)
        & (dot(wo, it.ng) >= 1e-4)
        & (dot(wo, it.ns) >= 1e-4)
    )
    mat = read_bsdf(it.uv, material)
    onb = make_onb(it.ns)
    wo_local = onb.to_local(wo)
    beta = ggx_brdf(wo_local, wo_local, mat[..., :3], SPECULAR, mat[..., 3])
    li = (1.0 / jnp.maximum(hit.t, 1e-6)) ** 2  # unit intensity, 1/r^2
    radiance = beta * li[..., None]
    return jnp.where(valid[..., None], radiance, 0.0)


collocated_backward = None  # default jax.grad path (see wrapper.render_grad)
