"""Direct-lighting integrator: NEE light sampling + optional BSDF-sampling
MIS (reference: /root/reference/direct.py).

Gradient semantics match the reference's backward kernel (direct.py:88-167):
sampling pdfs, MIS weights, light radiance and the second-bounce emission are
*detached* (computed outside the reference's autodiff regions); only the GGX
BRDF factors carry gradients back to the material texture. Here that is
expressed with jax.lax.stop_gradient at the same spots, so jax.grad of this
one estimator (backward=None) reproduces the reference's hand-placed
autodiff exactly, while forward values are untouched.

Control flow: the reference's early returns become lane masks; every lane
consumes the same sampler dimensions so streams stay replayable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..accel import trace_any, trace_closest
from ..envmap import env_radiance, env_sampled_light_pdf
from ..interaction import gather_rows, surface_interact
from ..lights import light_selection_pdf, sample_light, sample_light_pdf
from ..microfacet import ggx_brdf, ggx_sample, ggx_sample_pdf
from ..onb import make_onb
from ..scenedata import SceneData
from ..texture import read_bsdf
from ..vecmath import dot, offset_ray_origin

sg = jax.lax.stop_gradient

# MIS off: only light samples (good for small lights). MIS on: light + bsdf
# samples at ~2.6x cost (reference direct.py:11-14). Module value is the
# default; per-render override via RenderConfig.use_mis.
use_MIS = True


def _flags(cfg):
    """(use_mis, bilinear) for a config (module defaults when cfg is None)."""
    if cfg is None:
        return use_MIS, True
    return cfg.use_mis, cfg.bilinear

SPECULAR = 0.04


def balanced_heuristic(pdf_a, pdf_b):
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-4)


def direct_estimator(data: SceneData, material, ray_o, ray_d, sampler, cfg=None):
    mis_on, bilinear = _flags(cfg)
    hit = trace_closest(data.accel, ray_o, ray_d)
    it = surface_interact(hit, data.geom)
    wo = -ray_d

    if data.has_env:
        miss_radiance = env_radiance(data.env, ray_d)
    else:
        miss_radiance = jnp.zeros_like(ray_d)

    frontfacing = (dot(wo, it.ng) >= 1e-4) & (dot(wo, it.ns) >= 1e-4)
    inst = jnp.maximum(hit.inst, 0)
    emission = gather_rows(data.emission, inst)
    # Deviation from the reference's `hit.inst > 0` light hack
    # (direct.py:30-32): emissive instances are lights, everything else is
    # shaded -- identical for reference-style scenes (object #0 + emissive
    # lights), and a second diffuse instance renders instead of going black.
    hit_light = jnp.any(emission > 0.0, axis=-1)
    shade = (~hit.miss) & frontfacing & (~hit_light)

    mat = read_bsdf(it.uv, material, bilinear)
    diffuse = mat[..., :3]
    roughness = mat[..., 3]
    onb = make_onb(it.ns)
    wo_local = onb.to_local(wo)

    # ---- NEE: light sample + shadow ray (direct.py:41-56)
    light, sampler = sample_light(data, it.p, sampler)
    occluded = trace_any(
        data.accel, it.p, light.wi, t_min=1e-4, t_max=light.dist
    )
    wi_light_local = onb.to_local(light.wi)
    nee_ok = shade & (~occluded) & (wi_light_local[..., 2] > 0.0)
    bsdf_nee = ggx_brdf(wo_local, wi_light_local, diffuse, SPECULAR, roughness)
    if mis_on:
        pdf_bsdf_at_light = sg(
            ggx_sample_pdf(wo_local, wi_light_local, roughness)
        )
        mis_nee = balanced_heuristic(sg(light.pdf), pdf_bsdf_at_light)
    else:
        mis_nee = jnp.ones_like(light.pdf)
    nee_contrib = (
        bsdf_nee
        * (mis_nee / jnp.maximum(sg(light.pdf), 1e-4))[..., None]
        * sg(light.eval)
    )
    radiance = jnp.where(nee_ok[..., None], nee_contrib, 0.0)

    if mis_on:
        # ---- BSDF sample: one more bounce looking for emitters (direct.py:58-83)
        u_lobe, sampler = sampler.next1()
        u2, sampler = sampler.next2()
        wi_local = sg(ggx_sample(wo_local, roughness, u_lobe, u2))
        wi = onb.to_world(wi_local)
        bounce_ok = shade & (dot(wi, it.ng) >= 1e-4) & (wi_local[..., 2] >= 1e-4)
        o2 = offset_ray_origin(it.p, it.ng)
        hit2 = trace_closest(data.accel, o2, wi)
        it2 = surface_interact(hit2, data.geom)
        front2 = (dot(-wi, it2.ng) >= 1e-4) & (dot(-wi, it2.ns) >= 1e-4)

        if data.has_env:
            emission2_miss = env_radiance(data.env, wi)
            pdf_light2_miss = env_sampled_light_pdf(data.env, wi) * light_selection_pdf(data)
        else:
            emission2_miss = jnp.zeros_like(wi)
            pdf_light2_miss = jnp.zeros(wi.shape[:-1], jnp.float32)

        inst2 = jnp.maximum(hit2.inst, 0)
        emission2_hit = gather_rows(data.emission, inst2)
        pdf_light2_hit = sample_light_pdf(data, sg(it.p), hit2.inst, hit2.prim, it2.p)

        emission2 = jnp.where(hit2.miss[..., None], emission2_miss, emission2_hit)
        pdf_light2 = jnp.where(hit2.miss, pdf_light2_miss, pdf_light2_hit)
        usable2 = bounce_ok & (hit2.miss | front2) & jnp.any(emission2 > 0.0, axis=-1)

        pdf_bsdf2 = sg(ggx_sample_pdf(wo_local, wi_local, roughness))
        mis2 = balanced_heuristic(pdf_bsdf2, sg(pdf_light2))
        beta2 = ggx_brdf(wo_local, wi_local, diffuse, SPECULAR, roughness) / jnp.maximum(
            pdf_bsdf2, 1e-9
        )[..., None]
        radiance = radiance + jnp.where(
            usable2[..., None], beta2 * mis2[..., None] * sg(emission2), 0.0
        )

    out = jnp.where(shade[..., None], radiance, 0.0)
    out = jnp.where((hit_light & ~hit.miss & frontfacing)[..., None], sg(emission), out)
    out = jnp.where(hit.miss[..., None], sg(miss_radiance), out)
    return out




def direct_backward(data, material, ray_o, ray_d, sampler, le_grad, cfg=None):
    """Hand-written gradient walk for the direct integrator (mirrors the
    reference's backward kernel, direct.py:88-167): recompute the forward
    estimator's two branches, inject adjoints through the GGX terms only
    (everything else detached), splat per-sample texture gradients.

    Exists because (a) it is ~an order of magnitude faster than jax.grad of
    the estimator — the gather-transpose scatter in a vjp context is both
    slow under texel contention and crash-prone on the axon toolchain — and
    (b) it can use the unbiased single-corner stochastic splat
    (cfg.stochastic_splat) like the PRB backward.
    """
    from ..samplers.hashes import lcg_to_unit_float
    from ..texture import (
        cm_to_texture,
        segment_scatter_add,
        stochastic_corner_ids,
        write_bsdf_grad,
    )

    mis_on, bilinear = _flags(cfg)
    material = sg(material)
    hit = trace_closest(data.accel, ray_o, ray_d)
    it = surface_interact(hit, data.geom)
    wo = -ray_d
    frontfacing = (dot(wo, it.ng) >= 1e-4) & (dot(wo, it.ns) >= 1e-4)
    inst0 = jnp.maximum(hit.inst, 0)
    hit_light = jnp.any(gather_rows(data.emission, inst0) > 0.0, axis=-1)
    shade = (~hit.miss) & frontfacing & (~hit_light)

    mat = read_bsdf(it.uv, material, bilinear)
    onb = make_onb(it.ns)
    wo_local = onb.to_local(wo)

    # NEE branch (adjoint: beta-less, mis/light detached — direct.py:126-131)
    light, sampler = sample_light(data, it.p, sampler)
    occluded = trace_any(data.accel, it.p, light.wi, t_min=1e-4, t_max=light.dist)
    wi_light_local = onb.to_local(light.wi)
    nee_ok = shade & (~occluded) & (wi_light_local[..., 2] > 0.0)
    if mis_on:
        pdf_b = ggx_sample_pdf(wo_local, wi_light_local, mat[..., 3])
        mis_nee = balanced_heuristic(light.pdf, pdf_b)
    else:
        mis_nee = jnp.ones_like(light.pdf)
    nee_w = (mis_nee / jnp.maximum(light.pdf, 1e-4))[..., None] * light.eval

    # BSDF branch (direct.py:140-165)
    if mis_on:
        u_lobe, sampler = sampler.next1()
        u2, sampler = sampler.next2()
        wi_local = ggx_sample(wo_local, mat[..., 3], u_lobe, u2)
        wi = onb.to_world(wi_local)
        bounce_ok = shade & (dot(wi, it.ng) >= 1e-4) & (wi_local[..., 2] >= 1e-4)
        o2 = offset_ray_origin(it.p, it.ng)
        hit2 = trace_closest(data.accel, o2, wi)
        it2 = surface_interact(hit2, data.geom)
        front2 = (dot(-wi, it2.ng) >= 1e-4) & (dot(-wi, it2.ns) >= 1e-4)
        if data.has_env:
            emission2_miss = env_radiance(data.env, wi)
            pdf_l2_miss = env_sampled_light_pdf(data.env, wi) * light_selection_pdf(data)
        else:
            emission2_miss = jnp.zeros_like(wi)
            pdf_l2_miss = jnp.zeros(wi.shape[:-1], jnp.float32)
        inst2 = jnp.maximum(hit2.inst, 0)
        emission2 = jnp.where(
            hit2.miss[..., None], emission2_miss, gather_rows(data.emission, inst2)
        )
        pdf_l2 = jnp.where(
            hit2.miss,
            pdf_l2_miss,
            sample_light_pdf(data, it.p, hit2.inst, hit2.prim, it2.p),
        )
        usable2 = bounce_ok & (hit2.miss | front2) & jnp.any(emission2 > 0.0, axis=-1)
        pdf_b2 = ggx_sample_pdf(wo_local, wi_local, mat[..., 3])
        mis2 = balanced_heuristic(pdf_b2, pdf_l2)
        bounce_w = (mis2 / jnp.maximum(pdf_b2, 1e-9))[..., None] * emission2

    def shade_fn(mat4):
        b_nee = ggx_brdf(wo_local, wi_light_local, mat4[..., :3], SPECULAR, mat4[..., 3])
        if mis_on:
            b_bounce = ggx_brdf(wo_local, wi_local, mat4[..., :3], SPECULAR, mat4[..., 3])
        else:
            b_bounce = jnp.zeros_like(b_nee)
        return b_nee, b_bounce

    _, vjp = jax.vjp(shade_fn, mat)
    ct_nee = jnp.where(nee_ok[..., None], nee_w * le_grad, 0.0)
    if mis_on:
        ct_bounce = jnp.where(usable2[..., None], bounce_w * le_grad, 0.0)
    else:
        ct_bounce = jnp.zeros_like(ct_nee)
    (mat_grad,) = vjp((ct_nee, ct_bounce))
    mat_grad = jnp.where(jnp.isnan(mat_grad), 0.0, mat_grad)
    grad_on = nee_ok | (usable2 if mis_on else jnp.zeros_like(nee_ok))
    masked = jnp.where(grad_on[..., None], mat_grad, 0.0)

    h, w = material.shape[0], material.shape[1]
    if cfg is not None and getattr(cfg, "stochastic_splat", False):
        u_splat = lcg_to_unit_float(sampler.salt())
        ids = stochastic_corner_ids(it.uv, u_splat, h, w)
        add = segment_scatter_add(
            ids, [masked[..., c] for c in range(4)], h * w, channel_major=True
        )
        return cm_to_texture(add, h, w)
    return write_bsdf_grad(it.uv, masked, jnp.zeros_like(material))
