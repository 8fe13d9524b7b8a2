"""Direct integrator on the fused Pallas bounce kernels.

The reference-protocol benchmark (direct + MIS, tools/bench_reference.py)
is glue-bound, not trace-bound: the unfused direct pipeline pays the
(N, 3)-relayout tax at every XLA op. Direct lighting is exactly ONE fused
path bounce plus one extra trace, so it reuses pallas_bounce verbatim:

    kernel1(primary trace+interact) -> glue (material gather, draws, NEE
      selection incl. envmap/point lights) -> kernel2
      (NEE + shadow + GGX + bounce sample) = emitter display + NEE term
    kernel1(bounce ray, pdf_prev = bounce pdf) = the MIS-weighted emitter
      lookup of the BSDF branch (k1's emitter-hit MIS is the same balanced
      heuristic the direct estimator applies); envmap misses of the bounce
      ray get the same MIS-weighted env radiance in the glue
    radiance = k2.radiance + k2.beta_next * k1b.add_emit

The backward feeds kernel2's PRB gradient taps with le_rem = the sample's
FULL radiance: after the kernel subtracts its own local terms, the
remaining-path radiance is exactly the bounce contribution, and the
Le/bsdf continuation adjoint reduces to direct's mis2/pdf2 * emission2
cotangent (integrators/direct.py:246-249).

Known (documented) epsilon-level deviations from the unfused direct:
kernel2 gates NEE on wi_local.z >= 1e-4 (path semantics; unfused direct
uses > 0), and the bounce-hit light pdf measures distance from the offset
ray origin (path semantics). Both are tolerance-level; tests compare at
2e-3.

Scope gates mirror path_fused plus use_mis=True (the bounce branch always
runs in kernel2). Draw parity with the unfused direct estimator: 7 draws
per sample (NEE 4 + BSDF 3), no Russian-roulette draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scenedata import SceneData
from ..samplers.hashes import lcg_to_unit_float
from ..texture import (
    cm_to_texture,
    flush_splat_buffer,
    make_splat_buffer,
    pack_quads,
    splat_buffer_row,
)
from .fused_glue import (
    bounce_draws,
    build_glue_tables,
    env_miss_add_planes,
    light_hit_planes,
    sample_light_planes,
    start_sample_planes,
)
from .pallas_bounce import (
    LANES,
    MXU_MIN_TRIS,
    build_fused_const,
    build_woop_pack,
    fused_shade,
    fused_trace_interact,
    pad_to_planes,
    planes_rows,
    read_quads_planes,
)
from .path_fused import _interpret, fused_eligible
from .path_persistent import SCATTER_BATCH
from .wrapper import RADIANCE_CLAMP

# merged-kernel (bounce_emit) eligibility cap: the in-kernel emissive-first
# lookup unrolls a Möller–Trumbore pass per LIGHT TRIANGLE (block-wide VPU
# work); past this count the unroll outgrows the closest-sweep it replaces
# and the split k2f + k1b + k2g pipeline takes over.
MERGED_MAX_LIGHT_TRIS = 32


def direct_fused_eligible(data: SceneData, cfg) -> bool:
    import dataclasses

    if cfg.integrator != "direct" or not cfg.use_mis:
        return False
    # reuse the path gates (lights/sampler/scene size) via a path-shaped cfg
    probe = dataclasses.replace(cfg, integrator="path", persistent=True)
    return fused_eligible(data, probe)


def _setup(data, material, cfg, coords):
    from .pallas_bounce import FUSED_MAX_TRIS, spatial_lane_perm
    from .pallas_stream import build_stream_pack

    if getattr(cfg, "lane_order", "morton") == "morton":
        perm, inv = spatial_lane_perm(coords)
        coords = coords[perm]
    else:
        perm = inv = None
    meta = data.fused_meta
    scene_pack, light_pack = build_fused_const(data, meta)
    if meta.num_tris > FUSED_MAX_TRIS:
        # big mesh: HBM-streamed trace (pallas_stream); kernel 2 gets
        # precomputed occlusion + a dummy scene slab
        stream = build_stream_pack(scene_pack)
        woop = None
        scene_pack = scene_pack[:8]
    else:
        stream = None
        woop = (
            build_woop_pack(scene_pack)
            if meta.num_tris >= MXU_MIN_TRIS
            else None
        )
    tables = build_glue_tables(data, meta, light_pack)
    env_hw = (data.env.texture.shape[0], data.env.texture.shape[1])
    packed = pack_quads(material, getattr(cfg, "texture_bf16", False))
    n_pix = coords.shape[0]
    rows = planes_rows(n_pix)
    pxp = pad_to_planes(coords[:, 0], rows)
    pyp = pad_to_planes(coords[:, 1], rows)
    real = pad_to_planes(jnp.ones((n_pix,), jnp.int32), rows)
    return (meta, scene_pack, tables, env_hw, packed, rows, pxp, pyp, real,
            woop, stream, (perm, inv))


def _one_sample(data, material, camera, seed, cfg, setup, it, want_grad,
                grad_extra=None):
    """Shared per-sample pipeline. Returns (radiance3, k2grad_outputs)."""
    from .pallas_stream import stream_any, stream_trace_interact

    (meta, scene_pack, tables, env_hw, packed, rows, pxp, pyp, real,
     woop, stream, _order) = setup
    h, w = material.shape[0], material.shape[1]
    interp = _interpret()
    sidx = jnp.zeros((rows, LANES), jnp.int32) + it
    smp, o, d = start_sample_planes(
        cfg.sampler, pxp, pyp, camera, seed, sidx, cfg.spp, cfg.res,
        cfg.use_tent_filter,
    )
    big = jnp.full((rows, LANES), 1e30, jnp.float32)
    if stream is not None:
        k1 = stream_trace_interact(
            stream, (*o, *d, big, real), interpret=interp
        )
    else:
        k1 = fused_trace_interact(
            scene_pack, meta.num_tris, (*o, *d, big, real), interpret=interp,
            woop=woop,
        )
    (px, py, pz, ux, uy, nsx, nsy, nsz, ngx, ngy, ngz,
     shade, aer, aeg, aeb, miss_i) = k1
    mat_p = read_quads_planes(ux, uy, packed, h, w)
    if meta.n_env > 0:
        er, eg, eb = env_miss_add_planes(
            meta, tables, env_hw, d, big, miss_i != 0
        )
        aer = aer + er
        aeg = aeg + eg
        aeb = aeb + eb
    (nee, smp) = sample_light_planes(meta, tables, env_hw, (px, py, pz), smp)
    (wi_l, l_dist, l_pdf, l_ev) = nee
    draws, smp = bounce_draws(smp, want_rr=False)
    onesf = jnp.ones((rows, LANES), jnp.float32)
    zeros_i = jnp.zeros((rows, LANES), jnp.int32)
    ray_planes = (
        px, py, pz, nsx, nsy, nsz, ngx, ngy, ngz, *d, shade,
        *mat_p, onesf, onesf, onesf, zeros_i, aer, aeg, aeb,
    )
    nee_planes = (*wi_l, l_dist, l_pdf, *l_ev)

    # merged mode (MXU scenes, no envmap, statically small light set —
    # the in-kernel emissive-first lookup unrolls over the light
    # triangles): ONE shade kernel computes the complete sample radiance
    # (light-MT + t-capped occlusion sweep in-kernel) and, in the
    # backward, the gradient taps — replacing the k2f + k1b (+ k2g) chain
    n_ltris = len(meta.light_tri_ids)
    if (woop is not None and meta.n_env == 0 and stream is None
            and 0 < n_ltris <= MERGED_MAX_LIGHT_TRIS):
        lp = tables.light_pack
        if not want_grad:
            k2 = fused_shade(
                scene_pack, meta.num_tris, ray_planes, nee_planes, draws,
                2, 16, h, w, interpret=interp, woop=woop, bounce_emit=True,
                light_pack=lp, n_light_tris=n_ltris,
            )
            return (k2[0], k2[1], k2[2]), None
        lgr, lgg, lgb = grad_extra
        u_splat = lcg_to_unit_float(smp.salt())
        zf = jnp.zeros((rows, LANES), jnp.float32)
        k2g = fused_shade(
            scene_pack, meta.num_tris, ray_planes, nee_planes, draws,
            2, 16, h, w,
            grad_planes=(real, zf, zf, zf, lgr, lgg, lgb, ux, uy, u_splat),
            interpret=interp, woop=woop, bounce_emit=True,
            light_pack=lp, n_light_tris=n_ltris,
        )
        return (k2g[0], k2g[1], k2g[2]), k2g[14:22]
    occ_s = None
    if stream is not None:
        occ_s = stream_any(
            stream, (px, py, pz, *wi_l, l_dist, shade), interpret=interp
        )
    # rr_depth=2 with depth plane 0 => no Russian roulette fires
    k2 = fused_shade(
        scene_pack, meta.num_tris, ray_planes, nee_planes, draws,
        2, 16, h, w, interpret=interp, woop=woop, occ_in=occ_s,
        want_occ=want_grad and stream is None,
    )
    (radr, radg, radb, bnr, bng, bnb, pdfb,
     nox, noy, noz, ndx, ndy, ndz, alive_i) = k2[:14]
    occ = occ_s if stream is not None else (k2[14] if want_grad else None)
    if stream is not None:
        # emissive-first bounce lookup: direct lighting only consumes the
        # bounce ray's EMITTER radiance, so the full-scene incoherent
        # closest sweep is replaced by a tiny light-triangle closest hit
        # (fused_glue.light_hit_planes) plus ONE t-capped occlusion sweep.
        # Lanes that reach no light leave the occlusion sweep's active set
        # unless an env map needs their escape test (t_hi = +inf then).
        bo = (nox, noy, noz)
        bd = (ndx, ndy, ndz)
        t_e, (b_aer, b_aeg, b_aeb), has = light_hit_planes(
            meta, tables, bd, bo, pdfb, alive_i
        )
        thi = 0.9999 * t_e  # NEE shadow epsilon (lights.py parity)
        b_act = alive_i * has if meta.n_env == 0 else alive_i
        if meta.n_env > 0:
            thi = jnp.where(has != 0, thi, jnp.float32(1e30))
        occ_b = stream_any(
            stream, (*bo, *bd, thi, b_act), interpret=interp, t_lo=0.0
        )
        clear = occ_b == 0
        b_aer = jnp.where(clear, b_aer, 0.0)
        b_aeg = jnp.where(clear, b_aeg, 0.0)
        b_aeb = jnp.where(clear, b_aeb, 0.0)
        if meta.n_env > 0:
            escaped = (alive_i != 0) & (has == 0) & clear
            er, eg, eb = env_miss_add_planes(
                meta, tables, env_hw, bd, pdfb, escaped
            )
            b_aer = b_aer + er
            b_aeg = b_aeg + eg
            b_aeb = b_aeb + eb
    else:
        # the bounce emitter lookup only consumes add_emit + miss: the
        # lite kernel skips the interaction epilogue and 12 plane writes
        (b_aer, b_aeg, b_aeb, b_miss) = fused_trace_interact(
            scene_pack, meta.num_tris,
            (nox, noy, noz, ndx, ndy, ndz, pdfb, alive_i),
            interpret=interp, woop=woop, lite=True,
        )
        if meta.n_env > 0:
            er, eg, eb = env_miss_add_planes(
                meta, tables, env_hw, (ndx, ndy, ndz), pdfb, b_miss != 0
            )
            b_aer = b_aer + er
            b_aeg = b_aeg + eg
            b_aeb = b_aeb + eb
    rad = (radr + bnr * b_aer, radg + bng * b_aeg, radb + bnb * b_aeb)
    if not want_grad:
        return rad, None
    lgr, lgg, lgb = grad_extra
    u_splat = lcg_to_unit_float(smp.salt())
    k2g = fused_shade(
        scene_pack, meta.num_tris, ray_planes, nee_planes, draws,
        2, 16, h, w,
        grad_planes=(real, rad[0], rad[1], rad[2], lgr, lgg, lgb, ux, uy,
                     u_splat),
        interpret=interp, woop=woop, occ_in=occ,
    )
    return rad, k2g[14:22]  # (le_rem3 (unused), g0..g3, ids)


def render_direct_fused(
    data: SceneData, material, camera, seed, cfg, coords, it_start=0
):
    """Fused direct forward: spp-averaged radiance -> (n_pix, 3)."""
    setup = _setup(data, material, cfg, coords)
    rows = setup[5]
    n_pix = coords.shape[0]
    count = cfg.window_count
    start = jnp.asarray(it_start, jnp.int32)

    def one(acc, it):
        rad, _ = _one_sample(data, material, camera, seed, cfg, setup, it, False)
        good = ~(jnp.isnan(rad[0]) | jnp.isnan(rad[1]) | jnp.isnan(rad[2]))
        acc = tuple(
            acc[c] + jnp.where(good, jnp.clip(rad[c], 0.0, RADIANCE_CLAMP), 0.0)
            for c in range(3)
        )
        return acc, None

    zeros = jnp.zeros((rows, LANES), jnp.float32)
    acc, _ = jax.lax.scan(one, (zeros, zeros, zeros), start + jnp.arange(count))
    out = jnp.stack([acc[c].reshape(-1)[:n_pix] for c in range(3)], axis=-1)
    inv = setup[11][1]
    if inv is not None:
        out = out[inv]  # restore the caller's pixel order
    return out / count


def render_direct_backward_fused(
    data: SceneData, material, camera, seed, cfg, coords, le_grad, it_start=0
):
    """Fused direct gradient walk -> d_material (H, W, 4)."""
    setup = _setup(data, material, cfg, coords)
    rows = setup[5]
    h, w = material.shape[0], material.shape[1]
    n_bins = h * w
    n_lanes = rows * LANES
    material = jax.lax.stop_gradient(material)
    count = cfg.window_count
    start = jnp.asarray(it_start, jnp.int32)

    perm = setup[11][0]
    if perm is not None:
        le_grad = le_grad[perm]  # match the sweep lane order
    lgr = pad_to_planes(le_grad[:, 0], rows)
    lgg = pad_to_planes(le_grad[:, 1], rows)
    lgb = pad_to_planes(le_grad[:, 2], rows)

    buf0 = make_splat_buffer(SCATTER_BATCH, n_lanes, n_bins, cfg.packed_splat)
    # NOTE: cfg.splat_merge is deliberately NOT applied here. The path
    # backward merges taps across BOUNCES, where phase interleaving makes
    # half the pairings exact; direct has exactly one (almost always real)
    # tap per sample, so a cross-sample merge measurably amplifies
    # gradient noise (it pushed the 10%% AD-vs-FD gate to ~14%% at spp96)
    # while the flush it would shrink is only ~6%% of the iteration.

    def flush(d_mat, buf):
        return flush_splat_buffer(d_mat, buf, n_bins, cfg.packed_splat)

    def one(carry, idx_it):
        d_mat, buf = carry
        slot_i, it = idx_it
        rad, g = _one_sample(
            data, material, camera, seed, cfg, setup, it, True,
            grad_extra=(lgr, lgg, lgb),
        )
        _, _, _, g0, g1, g2, g3, ids = g
        slot = jnp.mod(slot_i, SCATTER_BATCH)
        row = splat_buffer_row(ids, g0, g1, g2, g3, cfg.packed_splat)
        buf = jax.lax.dynamic_update_index_in_dim(buf, row, slot, 0)
        do_flush = slot == SCATTER_BATCH - 1
        d_mat = jax.lax.cond(
            do_flush, lambda a: flush(*a), lambda a: a[0], (d_mat, buf)
        )
        buf = jnp.where(do_flush, buf0, buf)
        return (d_mat, buf), None

    init = (jnp.zeros((4, n_bins), material.dtype), buf0)
    (d_mat, buf), _ = jax.lax.scan(
        one, init, (jnp.arange(count), start + jnp.arange(count))
    )
    d_mat = flush(d_mat, buf)
    return cm_to_texture(d_mat, h, w)
