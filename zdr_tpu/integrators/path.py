"""Path tracer + Path Replay Backpropagation (PRB).

Reference: /root/reference/prb.py (NOTE: that file is stale — SURVEY.md §2.18
documents signature drift and a beta-squared envmap-MIS bug at prb.py:27-31;
this implements the PRB *algorithm* with the current direct.py-era plumbing,
envmap included, and the env contribution correctly weighted once by beta).

Forward: bounded `lax.scan` over depth (max_depth=16) with per-lane active
masks replacing the reference's per-thread break/continue; NEE + MIS at every
bounce; emitter hits MIS-weighted against the carried BSDF pdf (init 1e30 so
directly-visible lights are full weight); Russian roulette from rr_depth=2 on
throughput luminance, floor q>=0.05.

Backward is PRB (prb.py:92-187): no path storage. Replay the forward with an
identical sampler stream to get the total path radiance Le; walk the path a
second time with the same stream, and at each bounce (a) subtract the locally
added NEE/emitter terms from Le so it always holds "(absolute) radiance
arriving from the remainder of the path", and (b) inject two adjoints
through the local BRDF only:
             nee:    d_bsdf_nee    <- beta * mis * light.eval/pdf * le_grad
             bounce: d_bsdf_bounce <- Le / bsdf_bounce * le_grad
The bounce adjoint is the PRB trick: the future-path radiance stands in for
the derivative of everything downstream of this vertex. Note the Le/bsdf
form: Le is carried ABSOLUTE (beta-weighted), and every downstream beta_k is
proportional to bsdf_bounce, so d(pixel)/d(bsdf) = Le/bsdf exactly — equal
to classic PRB's beta/pdf * (relative incident radiance). The reference's
stale prb.py:157-163 injects beta/pdf * absolute-Le, which carries an extra
throughput factor; see the inline note in path_backward. Per-bounce
gradients scatter-add into the texture at each hit's uv (bilinear corners via
texture.write_bsdf_grad — the reference's atomics, without atomics).

Every lane consumes the same sampler dimensions per bounce (fixed-draw
discipline), which is what makes fwd/bwd replay exact under masking.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel import trace_any, trace_closest
from ..envmap import env_radiance, env_sampled_light_pdf
from ..interaction import gather_rows, surface_interact
from ..lights import light_selection_pdf, sample_light, sample_light_pdf
from ..microfacet import ggx_brdf, ggx_sample, ggx_sample_pdf
from ..onb import make_onb
from ..scenedata import SceneData
from ..samplers.hashes import lcg_to_unit_float
from ..texture import read_bsdf, write_bsdf_grad, write_bsdf_grad_stochastic
from ..vecmath import dot, luminance, offset_ray_origin

sg = jax.lax.stop_gradient

max_depth = 16  # default; per-render override via RenderConfig.max_depth (ref prb.py:15)
rr_depth = 2  # default; RenderConfig.rr_depth (ref prb.py:16)
SPECULAR = 0.04


def _depths(cfg):
    """(max_depth, rr_depth) for a config (module defaults when cfg is None)."""
    if cfg is None:
        return max_depth, rr_depth
    return cfg.max_depth, cfg.rr_depth


def balanced_heuristic(pdf_a, pdf_b):
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-4)


class _Vertex(NamedTuple):
    """Everything one bounce needs, computed identically in fwd and bwd."""

    active: jnp.ndarray  # lane still walking after this vertex's events
    add_emit: jnp.ndarray  # (N,3) emitter/env radiance added at this vertex
    nee_ok: jnp.ndarray
    nee_weight: jnp.ndarray  # (N,) mis/max(light.pdf,1e-4)
    nee_light_eval: jnp.ndarray  # (N,3)
    bsdf_nee: jnp.ndarray  # (N,3) brdf*cos toward the light
    bsdf_bounce: jnp.ndarray  # (N,3) brdf*cos along the continuation
    pdf_bounce: jnp.ndarray  # (N,)
    uv: jnp.ndarray  # (N,2) texture coords at the hit
    mat: jnp.ndarray  # (N,4) material fetched at the hit
    wo_local: jnp.ndarray
    wi_nee_local: jnp.ndarray
    wi_bounce_local: jnp.ndarray
    next_o: jnp.ndarray
    next_d: jnp.ndarray
    rr_scale: jnp.ndarray  # (N,) 1/q where RR survived, 1 otherwise


def _walk_one_bounce(data: SceneData, material, o, d, pdf_bsdf_prev, active, sampler, cfg=None):
    """Shared per-bounce logic. Returns (_Vertex, sampler)."""
    bilinear = True if cfg is None else cfg.bilinear
    tex_bf16 = False if cfg is None else getattr(cfg, "texture_bf16", False)
    hit = trace_closest(data.accel, o, d)
    it = surface_interact(hit, data.geom)
    wo = -d

    # -- miss: envmap contribution, MIS vs carried bsdf pdf (prb.py:27-32)
    if data.has_env:
        pdf_env = env_sampled_light_pdf(data.env, d) * light_selection_pdf(data)
        mis_env = balanced_heuristic(pdf_bsdf_prev, pdf_env)
        env_add = mis_env[..., None] * env_radiance(data.env, d)
    else:
        env_add = jnp.zeros_like(o)

    frontfacing = (dot(wo, it.ng) >= 1e-4) & (dot(wo, it.ns) >= 1e-4)
    inst = jnp.maximum(hit.inst, 0)
    emission = gather_rows(data.emission, inst)
    emissive = jnp.any(emission > 0.0, axis=-1)

    # -- emitter hit: MIS vs carried bsdf pdf (prb.py:39-44)
    pdf_light_hit = sample_light_pdf(data, o, hit.inst, hit.prim, it.p)
    mis_hit = balanced_heuristic(pdf_bsdf_prev, pdf_light_hit)
    emit_add = mis_hit[..., None] * emission

    add_emit = jnp.where(
        (active & hit.miss)[..., None],
        env_add,
        jnp.where((active & ~hit.miss & frontfacing & emissive)[..., None], emit_add, 0.0),
    )

    # lanes that keep shading: frontfacing, non-emissive. Deviation from the
    # reference's `hit.inst > 0` light hack (ref direct.py:30-32, prb.py:45-46
    # — there only instance #0 is ever shaded): gating on emission means a
    # scene with several non-emissive instances shades all of them; behavior
    # is identical for every reference-style scene (object at #0, emissive
    # lights after).
    shade = active & ~hit.miss & frontfacing & ~emissive

    mat = read_bsdf(it.uv, material, bilinear, tex_bf16)
    diffuse = mat[..., :3]
    roughness = mat[..., 3]
    onb = make_onb(it.ns)
    wo_local = onb.to_local(wo)

    # -- NEE (prb.py:57-66); fixed draws for every lane
    light, sampler = sample_light(data, it.p, sampler)
    occluded = trace_any(data.accel, it.p, light.wi, t_min=1e-4, t_max=light.dist)
    wi_light_local = onb.to_local(light.wi)
    nee_ok = shade & (~occluded) & (wi_light_local[..., 2] >= 1e-4)
    bsdf_nee = ggx_brdf(wo_local, wi_light_local, diffuse, SPECULAR, roughness)
    pdf_bsdf_at_light = ggx_sample_pdf(wo_local, wi_light_local, roughness)
    mis_nee = balanced_heuristic(light.pdf, pdf_bsdf_at_light)
    nee_weight = mis_nee / jnp.maximum(light.pdf, 1e-4)

    # -- BSDF sample (prb.py:69-76)
    u_lobe, sampler = sampler.next1()
    u2, sampler = sampler.next2()
    wi_local = ggx_sample(wo_local, roughness, u_lobe, u2)
    pdf_bounce = ggx_sample_pdf(wo_local, wi_local, roughness)
    wi = onb.to_world(wi_local)
    bounce_ok = shade & (dot(wi, it.ng) >= 1e-4) & (wi_local[..., 2] >= 1e-4)
    bsdf_bounce = ggx_brdf(wo_local, wi_local, diffuse, SPECULAR, roughness)
    next_o = offset_ray_origin(it.p, it.ng)
    next_d = wi

    # -- Russian roulette draw (prb.py:79-87): drawn by every lane; the
    # caller computes survival from its own post-bounce throughput.
    u_rr, sampler = sampler.next1()
    return (
        _Vertex(
            active=bounce_ok,
            add_emit=add_emit,
            nee_ok=nee_ok,
            nee_weight=nee_weight,
            nee_light_eval=light.eval,
            bsdf_nee=bsdf_nee,
            bsdf_bounce=bsdf_bounce,
            pdf_bounce=pdf_bounce,
            uv=it.uv,
            mat=mat,
            wo_local=wo_local,
            wi_nee_local=wi_light_local,
            wi_bounce_local=wi_local,
            next_o=next_o,
            next_d=next_d,
            rr_scale=u_rr,  # raw RR uniform; caller turns it into survival
        ),
        sampler,
    )


def _apply_rr(depth, beta, active, u_rr, rr_d=rr_depth):
    """RR survival on luminance of beta (prb.py:79-87). Returns
    (active', scale) where scale multiplies beta (1/q on survival)."""
    lum = luminance(beta)
    q = jnp.maximum(lum, 0.05)
    do_rr = depth >= rr_d
    dead = do_rr & ((lum == 0.0) | (u_rr >= q))
    scale = jnp.where(do_rr & ~dead & active, 1.0 / q, 1.0)
    return active & ~dead, scale


def path_estimator(data: SceneData, material, ray_o, ray_d, sampler, cfg=None):
    """Forward path trace -> (N, 3) radiance."""
    N = ray_o.shape[0]
    md, rr_d = _depths(cfg)

    def body(carry, depth):
        o, d, beta, pdf_prev, radiance, active, smp = carry
        v, smp = _walk_one_bounce(data, material, o, d, pdf_prev, active, smp, cfg)
        radiance = radiance + beta * v.add_emit
        nee_contrib = v.bsdf_nee * (v.nee_weight[..., None]) * v.nee_light_eval
        radiance = radiance + jnp.where(v.nee_ok[..., None], beta * nee_contrib, 0.0)
        beta_next = beta * v.bsdf_bounce / jnp.maximum(v.pdf_bounce, 1e-9)[..., None]
        active2, rr = _apply_rr(depth, beta_next, v.active, v.rr_scale, rr_d)
        beta_next = beta_next * rr[..., None]
        beta_out = jnp.where(active2[..., None], beta_next, beta)
        return (
            v.next_o,
            v.next_d,
            beta_out,
            jnp.where(active2, v.pdf_bounce, pdf_prev),
            radiance,
            active2,
            smp,
        ), None

    init = (
        ray_o,
        ray_d,
        jnp.ones((N, 3), jnp.float32),
        jnp.full((N,), 1e30, jnp.float32),  # prb.py:22
        jnp.zeros((N, 3), jnp.float32),
        jnp.ones((N,), bool),
        sampler,
    )
    (o, d, beta, pdf, radiance, active, smp), _ = jax.lax.scan(
        body, init, jnp.arange(md)
    )
    return radiance


def path_backward(data: SceneData, material, ray_o, ray_d, sampler, le_grad, cfg=None):
    """PRB gradient walk -> d_material (H, W, 4) contribution for this pass."""
    stochastic = cfg is not None and getattr(cfg, "stochastic_splat", False)
    N = ray_o.shape[0]
    md, rr_d = _depths(cfg)
    material = sg(material)

    # 1) replay forward with an identical stream to get total Le (prb.py:96-99)
    Le = path_estimator(data, material, ray_o, ray_d, sampler, cfg)
    le_ok = ~jnp.any(jnp.isnan(Le), axis=-1, keepdims=True)
    Le = jnp.where(le_ok, Le, 0.0)
    le_grad = jnp.where(le_ok, le_grad, 0.0)

    # 2) second walk, injecting adjoints per bounce
    def body(carry, depth):
        o, d, beta, pdf_prev, Le_c, active, smp, d_mat = carry
        v, smp = _walk_one_bounce(data, material, o, d, pdf_prev, active, smp, cfg)

        # subtract this vertex's emitter/env contribution (prb.py:120)
        Le_c = Le_c - beta * v.add_emit

        # local shading closure: gradients flow through the BRDF only
        def shade(mat4):
            dif = mat4[..., :3]
            rgh = mat4[..., 3]
            b_nee = ggx_brdf(v.wo_local, v.wi_nee_local, dif, SPECULAR, rgh)
            b_bounce = ggx_brdf(v.wo_local, v.wi_bounce_local, dif, SPECULAR, rgh)
            return b_nee, b_bounce

        (b_nee, b_bounce), vjp = jax.vjp(shade, v.mat)

        nee_full = beta * b_nee * v.nee_weight[..., None] * v.nee_light_eval
        ct_nee = jnp.where(
            v.nee_ok[..., None],
            beta * v.nee_weight[..., None] * v.nee_light_eval * le_grad,
            0.0,
        )
        # subtract NEE contribution from the remaining-path radiance (prb.py:147)
        Le_c = Le_c - jnp.where(v.nee_ok[..., None], nee_full, 0.0)

        # PRB continuation adjoint. Le_c here is the ABSOLUTE remaining-path
        # radiance sum_{k>j} beta_k * (emit_k + nee_k); every beta_k (k > j)
        # is proportional to this vertex's BSDF value, so
        # d(pixel)/d(bsdf_j) = Le_c / bsdf_j — per channel, 0/0 := 0.
        # DEVIATION from the reference's prb.py:157-163, which injects
        # beta/pdf * Le: with absolute Le bookkeeping that carries a
        # spurious extra throughput factor beta_{j+1} = beta*bsdf/pdf
        # (published PRB multiplies beta/pdf by the RELATIVE incident
        # radiance Le/beta_{j+1}). The reference's prb.py is stale and was
        # never runnable in its snapshot (SURVEY.md §2.18); verified here
        # against pure jax.grad of the forward estimator and same-seed
        # finite differences, which agree to float precision.
        inv_pdf = 1.0 / jnp.maximum(v.pdf_bounce, 1e-9)
        ct_bounce = jnp.where(
            v.active[..., None] & (b_bounce > 1e-8),
            Le_c / jnp.maximum(b_bounce, 1e-8) * le_grad,
            0.0,
        )

        (mat_grad,) = vjp((ct_nee, ct_bounce))
        mat_grad = jnp.where(jnp.isnan(mat_grad), 0.0, mat_grad)  # prb.py:179
        grad_lane_ok = (v.nee_ok | v.active)[..., None]
        masked_grad = jnp.where(grad_lane_ok, mat_grad, 0.0)
        if stochastic:
            u_splat = lcg_to_unit_float(smp.salt())
            d_mat = write_bsdf_grad_stochastic(v.uv, masked_grad, d_mat, u_splat)
        else:
            d_mat = write_bsdf_grad(v.uv, masked_grad, d_mat)

        beta_next = beta * b_bounce * inv_pdf[..., None]
        active2, rr = _apply_rr(depth, beta_next, v.active, v.rr_scale, rr_d)
        beta_next = beta_next * rr[..., None]
        beta_out = jnp.where(active2[..., None], beta_next, beta)
        return (
            v.next_o,
            v.next_d,
            beta_out,
            jnp.where(active2, v.pdf_bounce, pdf_prev),
            Le_c,
            active2,
            smp,
            d_mat,
        ), None

    init = (
        ray_o,
        ray_d,
        jnp.ones((N, 3), jnp.float32),
        jnp.full((N,), 1e30, jnp.float32),
        Le,
        jnp.ones((N,), bool),
        sampler,
        jnp.zeros_like(material),
    )
    out, _ = jax.lax.scan(body, init, jnp.arange(md))
    return out[-1]


def path_stats(data: SceneData, material, ray_o, ray_d, sampler, cfg=None):
    """Observability probe: average closest-hit and shadow traces per camera
    sample (the reference has no tracing/profiling at all — SURVEY.md §5).
    Used by bench.py to convert wall-clock into Mrays/s honestly."""
    N = ray_o.shape[0]
    md, rr_d = _depths(cfg)

    def body(carry, depth):
        o, d, beta, pdf_prev, active, smp, n_closest, n_shadow = carry
        # every live lane costs one closest trace; shading lanes cost one
        # shadow trace (NEE fires for every shading lane)
        n_closest = n_closest + jnp.sum(active)
        v, smp = _walk_one_bounce(data, material, o, d, pdf_prev, active, smp, cfg)
        shading = v.nee_ok | v.active  # lanes that ran the NEE shadow ray
        n_shadow = n_shadow + jnp.sum(shading)
        beta_next = beta * v.bsdf_bounce / jnp.maximum(v.pdf_bounce, 1e-9)[..., None]
        active2, rr = _apply_rr(depth, beta_next, v.active, v.rr_scale, rr_d)
        beta_out = jnp.where(active2[..., None], beta_next * rr[..., None], beta)
        return (
            v.next_o, v.next_d, beta_out,
            jnp.where(active2, v.pdf_bounce, pdf_prev),
            active2, smp, n_closest, n_shadow,
        ), None

    init = (
        ray_o, ray_d,
        jnp.ones((N, 3), jnp.float32),
        jnp.full((N,), 1e30, jnp.float32),
        jnp.ones((N,), bool),
        sampler,
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    out, _ = jax.lax.scan(body, init, jnp.arange(md))
    n_closest, n_shadow = out[-2], out[-1]
    return n_closest / N, n_shadow / N
