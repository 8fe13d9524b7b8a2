"""Persistent-lane path tracing on the fused Pallas bounce kernels.

Same scheduling as path_persistent.py (every lane always has live work;
terminated paths immediately restart on the pixel's next spp sample; the
backward interleaves an Le-replay phase and a PRB gradient phase per
sample), but every loop carry is a (rows, 128) plane and one bounce is

    kernel1 (trace+interact+emitter MIS)        [pallas_bounce.py]
    glue: material gather, env miss MIS, sampler draws,
          NEE light selection                   [fused_glue.py]
    kernel2 (shadow trace + shade + RR + taps)  [pallas_bounce.py]

Consumes the identical sampler stream as the unfused walk (any registered
sampler: the draws run in the glue through the same sampler objects), so
results agree to float tolerance (not bitwise: Mosaic vs XLA transcendental
scheduling, and re-associated bilinear lerps in the env fetch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scenedata import SceneData
from ..samplers import select_on_restart
from ..samplers.hashes import lcg_step, lcg_to_unit_float
from ..texture import (
    cm_to_texture,
    flush_splat_buffer,
    make_splat_buffer,
    pack_quads,
    reservoir_merge_taps,
    splat_buffer_row,
)
from .fused_glue import (
    bounce_draws,
    build_glue_tables,
    env_miss_add_planes,
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
from .path import _depths
from .path_persistent import SCATTER_BATCH
from .wrapper import RADIANCE_CLAMP

FUSED_SAMPLERS = ("lcg", "pmj02bn", "corrmj")


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def fused_eligible(data: SceneData, cfg) -> bool:
    from .pallas_stream import STREAM_MAX_TRIS

    mode = getattr(cfg, "fused", "auto")
    if mode == "auto" or mode is True:
        on = jax.default_backend() != "cpu"
    else:
        on = mode == "force"
    meta = data.fused_meta
    # scenes past FUSED_MAX_TRIS stream the trace from HBM (pallas_stream)
    return (
        on
        and cfg.integrator == "path"
        and cfg.persistent
        and cfg.stochastic_splat
        and cfg.sampler in FUSED_SAMPLERS
        and cfg.lanes_per_pixel <= 1
        and meta is not None
        and meta.num_tris <= STREAM_MAX_TRIS
        and (meta.n_lights + meta.n_env + meta.n_point) >= 1
    )


def _setup(data, material, cfg, coords, it_start):
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
        # big mesh: HBM-streamed trace; kernel 2 receives precomputed
        # occlusion and only a dummy scene slab (its sweep never runs)
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
    win_start = jnp.asarray(it_start, jnp.int32)
    win_count = cfg.window_count
    real = pad_to_planes(jnp.ones((n_pix,), jnp.int32), rows) != 0
    start_idx = jnp.zeros((rows, LANES), jnp.int32) + win_start
    stop_idx = jnp.where(real, win_start + win_count, win_start)
    return (meta, scene_pack, tables, env_hw, packed, rows, pxp, pyp,
            start_idx, stop_idx, woop, stream, (perm, inv))


def _bounce(data, meta, scene_pack, tables, env_hw, packed, cfg, s, lane_live,
            smp, h, w, interp, want_rr=True, woop=None, stream=None):
    """One fused bounce: k1 -> glue -> draws. Returns everything kernel 2
    needs plus the advanced sampler."""
    rays8 = (*s["o"], *s["d"], s["pdf_prev"], lane_live.astype(jnp.int32))
    if stream is not None:
        from .pallas_stream import stream_trace_interact

        k1 = stream_trace_interact(stream, rays8, interpret=interp)
    else:
        k1 = fused_trace_interact(
            scene_pack, meta.num_tris, rays8, interpret=interp, woop=woop,
        )
    (px, py, pz, ux, uy, nsx, nsy, nsz, ngx, ngy, ngz,
     shade, aer, aeg, aeb, miss_i) = k1
    mat_p = read_quads_planes(ux, uy, packed, h, w)
    if meta.n_env > 0:
        er, eg, eb = env_miss_add_planes(
            meta, tables, env_hw, s["d"], s["pdf_prev"], miss_i != 0
        )
        aer = aer + er
        aeg = aeg + eg
        aeb = aeb + eb
    (nee, smp) = sample_light_planes(meta, tables, env_hw, (px, py, pz), smp)
    (wi_l, l_dist, l_pdf, l_ev) = nee
    draws, smp = bounce_draws(smp, want_rr)
    ray_planes = (
        px, py, pz, nsx, nsy, nsz, ngx, ngy, ngz, *s["d"], shade,
        *mat_p, *s["beta"], s["depth"], aer, aeg, aeb,
    )
    nee_planes = (*wi_l, l_dist, l_pdf, *l_ev)
    return ray_planes, nee_planes, draws, (ux, uy), smp


def _stream_occ(stream, ray_planes, nee_planes, interp):
    """Precomputed NEE occlusion for the streamed big-mesh path (kernel 2
    then skips its own shadow sweep via occ_in). None when not streaming."""
    if stream is None:
        return None
    from .pallas_stream import stream_any

    p = ray_planes[0:3]
    shade = ray_planes[12]
    wi_l = nee_planes[0:3]
    l_dist = nee_planes[3]
    return stream_any(stream, (*p, *wi_l, l_dist, shade), interpret=interp)


def render_path_fused(
    data: SceneData, material, camera, seed, cfg, coords, it_start=0
):
    """Fused forward: spp-averaged radiance -> (n_pix, 3)."""
    (meta, scene_pack, tables, env_hw, packed, rows, pxp, pyp,
     start_idx, stop_idx, woop, stream, (_perm, inv)) = _setup(
        data, material, cfg, coords, it_start)
    n_pix = coords.shape[0]
    h, w = material.shape[0], material.shape[1]
    md, rr_d = _depths(cfg)
    win_count = cfg.window_count
    interp = _interpret()

    smp0, o0, d0 = start_sample_planes(
        cfg.sampler, pxp, pyp, camera, seed, start_idx, cfg.spp, cfg.res,
        cfg.use_tent_filter,
    )
    zeros = jnp.zeros((rows, LANES), jnp.float32)
    init = dict(
        sample_idx=start_idx,
        acc=(zeros, zeros, zeros),
        cur=(zeros, zeros, zeros),
        beta=(zeros + 1.0, zeros + 1.0, zeros + 1.0),
        pdf_prev=zeros + 1e30,
        o=o0,
        d=d0,
        smp=smp0,
        depth=jnp.zeros((rows, LANES), jnp.int32),
        it=jnp.zeros((), jnp.int32),
    )
    max_iters = (win_count + 1) * md + md

    def cond(s):
        return jnp.any(s["sample_idx"] < stop_idx) & (s["it"] < max_iters)

    def body(s):
        lane_live = s["sample_idx"] < stop_idx
        ray_planes, nee_planes, draws, _uv, smp = _bounce(
            data, meta, scene_pack, tables, env_hw, packed, cfg, s,
            lane_live, s["smp"], h, w, interp, woop=woop, stream=stream,
        )
        occ = _stream_occ(stream, ray_planes, nee_planes, interp)
        k2 = fused_shade(
            scene_pack, meta.num_tris, ray_planes, nee_planes, draws,
            rr_d, md, h, w, interpret=interp, woop=woop, occ_in=occ,
        )
        (radr, radg, radb, bnr, bng, bnb, pdfb,
         nox, noy, noz, ndx, ndy, ndz, alive_i) = k2
        alive = alive_i != 0
        cur = (s["cur"][0] + radr, s["cur"][1] + radg, s["cur"][2] + radb)

        terminated = lane_live & ~alive
        good = ~(jnp.isnan(cur[0]) | jnp.isnan(cur[1]) | jnp.isnan(cur[2]))
        acc = tuple(
            s["acc"][c]
            + jnp.where(
                terminated & good, jnp.clip(cur[c], 0.0, RADIANCE_CLAMP), 0.0
            )
            for c in range(3)
        )
        sample_idx = s["sample_idx"] + terminated.astype(jnp.int32)
        new_smp, new_o, new_d = start_sample_planes(
            cfg.sampler, pxp, pyp, camera, seed, sample_idx, cfg.spp, cfg.res,
            cfg.use_tent_filter,
        )
        restart = terminated & (sample_idx < stop_idx)

        def sel(a, b, c):  # where(restart, a, where(alive, b, c))
            return jnp.where(restart, a, jnp.where(alive, b, c))

        o = tuple(sel(new_o[c], (nox, noy, noz)[c], s["o"][c]) for c in range(3))
        d = tuple(sel(new_d[c], (ndx, ndy, ndz)[c], s["d"][c]) for c in range(3))
        smp = select_on_restart(restart, new_smp, smp)
        cur = tuple(jnp.where(terminated, 0.0, cur[c]) for c in range(3))
        beta = tuple(
            jnp.where(terminated, 1.0, jnp.where(alive, (bnr, bng, bnb)[c], s["beta"][c]))
            for c in range(3)
        )
        pdf_prev = jnp.where(
            terminated, 1e30, jnp.where(alive, pdfb, s["pdf_prev"])
        )
        depth = jnp.where(terminated, 0, s["depth"] + 1)
        return dict(
            sample_idx=sample_idx, acc=acc, cur=cur, beta=beta,
            pdf_prev=pdf_prev, o=o, d=d, smp=smp, depth=depth,
            it=s["it"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    acc = jnp.stack([out["acc"][c].reshape(-1)[:n_pix] for c in range(3)], axis=-1)
    if inv is not None:
        acc = acc[inv]  # restore the caller's pixel order
    return acc / win_count


def render_path_backward_fused(
    data: SceneData, material, camera, seed, cfg, coords, le_grad, it_start=0
):
    """Fused persistent PRB gradient walk -> d_material (H, W, 4).

    Phase structure identical to path_persistent.render_path_backward_
    persistent: phase 0 replays the sample to get Le, phase 1 re-walks with
    the same stream while kernel 2 emits the gradient taps and splat ids;
    the compacted/packed flush (texture.segment_scatter_add4) drains the
    (SB, 5, N) buffer."""
    (meta, scene_pack, tables, env_hw, packed, rows, pxp, pyp,
     start_idx, stop_idx, woop, stream, (perm, _inv)) = _setup(
        data, material, cfg, coords, it_start)
    n_pix = coords.shape[0]
    h, w = material.shape[0], material.shape[1]
    n_bins = h * w
    md, rr_d = _depths(cfg)
    win_count = cfg.window_count
    interp = _interpret()
    material = jax.lax.stop_gradient(material)

    if perm is not None:
        le_grad = le_grad[perm]  # match the sweep lane order
    lgr = pad_to_planes(le_grad[:, 0], rows)
    lgg = pad_to_planes(le_grad[:, 1], rows)
    lgb = pad_to_planes(le_grad[:, 2], rows)

    smp0, o0, d0 = start_sample_planes(
        cfg.sampler, pxp, pyp, camera, seed, start_idx, cfg.spp, cfg.res,
        cfg.use_tent_filter,
    )
    zeros = jnp.zeros((rows, LANES), jnp.float32)
    n_lanes = rows * LANES
    buf0 = make_splat_buffer(SCATTER_BATCH, n_lanes, n_bins, cfg.packed_splat)
    merge = max(1, int(cfg.splat_merge))
    pend0 = (jnp.full((rows, LANES), n_bins, jnp.int32),
             zeros, zeros, zeros, zeros)

    init = dict(
        sample_idx=start_idx,
        phase=jnp.zeros((rows, LANES), jnp.int32),
        depth=jnp.zeros((rows, LANES), jnp.int32),
        o=o0,
        d=d0,
        beta=(zeros + 1.0, zeros + 1.0, zeros + 1.0),
        pdf_prev=zeros + 1e30,
        smp=smp0,
        cur=(zeros, zeros, zeros),
        le_rem=(zeros, zeros, zeros),
        gok=jnp.ones((rows, LANES), bool),
        d_mat=jnp.zeros((4, n_bins), material.dtype),
        buf=buf0,
        it=jnp.zeros((), jnp.int32),
    )
    if merge > 1:
        init["pend"] = pend0

    def flush(d_mat, buf):
        return flush_splat_buffer(d_mat, buf, n_bins, cfg.packed_splat)

    max_iters = 2 * (win_count + 1) * md + 2 * md

    def cond(s):
        return jnp.any(s["sample_idx"] < stop_idx) & (s["it"] < max_iters)

    def body(s):
        lane_live = s["sample_idx"] < stop_idx
        in_grad = lane_live & (s["phase"] == 1)
        (ray_planes, nee_planes, draws, (ux, uy), smp) = _bounce(
            data, meta, scene_pack, tables, env_hw, packed, cfg, s,
            lane_live, s["smp"], h, w, interp, woop=woop, stream=stream,
        )
        occ = _stream_occ(stream, ray_planes, nee_planes, interp)
        # gok gates only the cotangents: zeroed le_grad kills them while the
        # le_rem bookkeeping still runs (path_persistent.py parity)
        glr = jnp.where(s["gok"], lgr, 0.0)
        glg = jnp.where(s["gok"], lgg, 0.0)
        glb = jnp.where(s["gok"], lgb, 0.0)
        u_splat = lcg_to_unit_float(smp.salt())
        k2 = fused_shade(
            scene_pack, meta.num_tris, ray_planes, nee_planes, draws,
            rr_d, md, h, w,
            grad_planes=(
                in_grad.astype(jnp.int32), *s["le_rem"], glr, glg, glb,
                ux, uy, u_splat,
            ),
            interpret=interp, woop=woop, occ_in=occ,
        )
        (radr, radg, radb, bnr, bng, bnb, pdfb,
         nox, noy, noz, ndx, ndy, ndz, alive_i,
         lerx, lery, lerz, g0, g1, g2, g3, ids) = k2
        alive = alive_i != 0

        # phase 0 accumulates Le
        ph0 = s["phase"] == 0
        cur = tuple(
            s["cur"][c] + jnp.where(ph0, (radr, radg, radb)[c], 0.0)
            for c in range(3)
        )
        le_rem = (lerx, lery, lerz)

        # splat buffer write (ids already sentinel-masked in-kernel). With
        # splat_merge > 1, a pending tap rides the carry and each group of
        # `merge` iterations reservoir-collapses to ONE buffer row: the
        # partial merge is (re)written to the SAME slot every iteration, so
        # the buffer is always flush-consistent (loop exit mid-group included)
        new_tap = (ids, g0, g1, g2, g3)
        if merge > 1:
            u_m = lcg_to_unit_float(lcg_step(smp.salt()))
            merged = reservoir_merge_taps(s["pend"], new_tap, u_m, n_bins)
            group_end = jnp.mod(s["it"], merge) == merge - 1
            pend = tuple(
                jnp.where(group_end, z, v) for z, v in zip(pend0, merged)
            )
            write_tap = merged
            slot = jnp.mod(s["it"] // merge, SCATTER_BATCH)
            do_flush = (
                jnp.mod(s["it"], merge * SCATTER_BATCH)
                == merge * SCATTER_BATCH - 1
            )
        else:
            write_tap = new_tap
            slot = jnp.mod(s["it"], SCATTER_BATCH)
            do_flush = slot == SCATTER_BATCH - 1
        row = splat_buffer_row(*write_tap, cfg.packed_splat)
        buf = jax.lax.dynamic_update_index_in_dim(s["buf"], row, slot, 0)
        d_mat = jax.lax.cond(
            do_flush, lambda a: flush(*a), lambda a: a[0], (s["d_mat"], buf)
        )
        buf = jnp.where(do_flush, buf0, buf)

        terminated = lane_live & ~alive
        end_le = terminated & ph0
        end_grad = terminated & (s["phase"] == 1)
        le_ok = ~(jnp.isnan(cur[0]) | jnp.isnan(cur[1]) | jnp.isnan(cur[2]))
        sample_idx = s["sample_idx"] + end_grad.astype(jnp.int32)
        phase = jnp.where(end_le, 1, jnp.where(end_grad, 0, s["phase"]))

        new_smp, new_o, new_d = start_sample_planes(
            cfg.sampler, pxp, pyp, camera, seed, sample_idx, cfg.spp, cfg.res,
            cfg.use_tent_filter,
        )
        restart = terminated & (sample_idx < stop_idx)

        def sel(a, b, c):
            return jnp.where(restart, a, jnp.where(alive, b, c))

        o = tuple(sel(new_o[c], (nox, noy, noz)[c], s["o"][c]) for c in range(3))
        d = tuple(sel(new_d[c], (ndx, ndy, ndz)[c], s["d"][c]) for c in range(3))
        smp = select_on_restart(restart, new_smp, smp)
        le_rem = tuple(
            jnp.where(end_le, jnp.where(le_ok, cur[c], 0.0), le_rem[c])
            for c in range(3)
        )
        cur = tuple(jnp.where(terminated, 0.0, cur[c]) for c in range(3))
        gok = jnp.where(end_le, le_ok, s["gok"])
        beta = tuple(
            jnp.where(
                terminated, 1.0, jnp.where(alive, (bnr, bng, bnb)[c], s["beta"][c])
            )
            for c in range(3)
        )
        pdf_prev = jnp.where(terminated, 1e30, jnp.where(alive, pdfb, s["pdf_prev"]))
        depth = jnp.where(terminated, 0, s["depth"] + 1)
        out = dict(
            sample_idx=sample_idx, phase=phase, depth=depth, o=o, d=d,
            beta=beta, pdf_prev=pdf_prev, smp=smp, cur=cur, le_rem=le_rem,
            gok=gok, d_mat=d_mat, buf=buf, it=s["it"] + 1,
        )
        if merge > 1:
            out["pend"] = pend
        return out

    out = jax.lax.while_loop(cond, body, init)
    d_mat = flush(out["d_mat"], out["buf"])
    return cm_to_texture(d_mat, h, w)
