"""Persistent-lane path tracing forward pass.

The scan-based forward (path.py) pays max_depth iterations per spp sample
even though Russian roulette kills most paths after 2-4 bounces: with a
262k-lane batch some lane always survives to depth 16, so masked lanes burn
>2/3 of the VPU. This module is the TPU analog of a GPU persistent-threads
megakernel: one `lax.while_loop` where every lane always has live work —
when a lane's path terminates, its radiance is committed and the SAME
iteration restarts the lane on its pixel's next spp sample (fresh primary
ray + fresh per-(pixel,seed,spp,sample) sampler stream, so results are
IDENTICAL to the per-sample version — verified in tests). Total iterations
~ spp * E[path length] instead of spp * max_depth (~5x fewer for the
Cornell box).

Used by the render wrapper for the 'path' integrator's forward; the PRB
backward keeps the two-walk structure (see path.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..camera import generate_ray, tent_warp
from ..samplers import make_sampler, select_on_restart
from ..scenedata import SceneData
from .path import _apply_rr, _depths, _walk_one_bounce
from .wrapper import RADIANCE_CLAMP

SCATTER_BATCH = 4  # bounces of splat entries buffered per scatter flush



def _sel_sampler(restart, new_smp, smp):
    """Per-lane select over sampler pytrees, restart-varying leaves only
    (invariant leaves like pmj02bn's bn_cache stay identity carries)."""
    return select_on_restart(restart, new_smp, smp)


def _start_sample(coords, camera, seed, spp, sample_idx, res, use_tent, kind):
    """Fresh sampler + primary ray for (pixel, seed, spp, sample_idx)."""
    w, h = res
    sampler = make_sampler(kind, coords, seed, spp, sample_idx)
    u2, sampler = sampler.next2()
    offset = tent_warp(u2, 1.0) + 0.5 if use_tent else u2
    resf = jnp.array([w, h], jnp.float32)
    pixel = (2.0 / resf * (coords.astype(jnp.float32) + offset) - 1.0) * jnp.array(
        [1.0, h / w], jnp.float32
    )
    o, d = generate_ray(camera, pixel)
    return sampler, o, d


def render_path_persistent(
    data: SceneData, material, camera, seed, cfg, coords, it_start=0
) -> jnp.ndarray:
    """spp-averaged path-traced radiance for a pixel batch -> (M, 3).

    Each pixel gets `cfg.lanes_per_pixel` persistent lanes, each owning a
    contiguous slice of the pixel's spp budget. The loop body is dominated
    by per-op overhead rather than per-element throughput on TPU, so wider
    arrays with proportionally fewer iterations are nearly free — measured
    ~2-3x wall-clock at K=4. Results differ from K=1 only by summation
    order (same per-sample streams)."""
    win_count = cfg.window_count
    win_start = jnp.asarray(it_start, jnp.int32)
    K = max(1, min(cfg.lanes_per_pixel, win_count))
    n_pix = coords.shape[0]
    spp = cfg.spp
    base = win_count // K
    extra = win_count % K
    # lane k handles sample indices [start_k, stop_k) within the window;
    # offsets are static, the window start is traced (shared program across
    # Scene.render's spp windows)
    cnts = [base + (1 if k_i < extra else 0) for k_i in range(K)]
    offs = [sum(cnts[:k_i]) for k_i in range(K)]
    coords = jnp.tile(coords, (K, 1))
    N = coords.shape[0]
    start_idx = win_start + jnp.repeat(jnp.array(offs, jnp.int32), n_pix)
    stop_idx = win_start + jnp.repeat(
        jnp.array([offs[k] + cnts[k] for k in range(K)], jnp.int32), n_pix
    )

    md, rr_d = _depths(cfg)
    sampler0, o0, d0 = _start_sample(
        coords, camera, seed, spp, start_idx, cfg.res,
        cfg.use_tent_filter, cfg.sampler,
    )

    # state: (sample_idx, acc, cur, beta, pdf_prev, o, d, sampler, depth, iter)
    init = (
        start_idx,  # sample_idx
        jnp.zeros((N, 3), jnp.float32),  # acc (committed samples)
        jnp.zeros((N, 3), jnp.float32),  # cur (in-flight path)
        jnp.ones((N, 3), jnp.float32),  # beta
        jnp.full((N,), 1e30, jnp.float32),  # pdf_prev
        o0,
        d0,
        sampler0,
        jnp.zeros((N,), jnp.int32),  # per-lane depth
        jnp.zeros((), jnp.int32),  # global iteration counter (safety bound)
    )

    max_iters = (base + 1) * md + md

    def cond(s):
        sample_idx = s[0]
        return jnp.any(sample_idx < stop_idx) & (s[9] < max_iters)

    def body(s):
        sample_idx, acc, cur, beta, pdf_prev, o, d, smp, depth, it = s
        lane_live = sample_idx < stop_idx

        v, smp = _walk_one_bounce(data, material, o, d, pdf_prev, lane_live, smp, cfg)
        cur = cur + beta * v.add_emit
        nee = v.bsdf_nee * v.nee_weight[..., None] * v.nee_light_eval
        cur = cur + jnp.where(v.nee_ok[..., None], beta * nee, 0.0)

        beta_next = beta * v.bsdf_bounce / jnp.maximum(v.pdf_bounce, 1e-9)[..., None]
        path_alive, rr = _apply_rr(depth, beta_next, v.active, v.rr_scale, rr_d)
        path_alive = path_alive & (depth + 1 < md)
        beta_next = beta_next * rr[..., None]

        # terminated paths: commit the sample (NaN guard + clamp,
        # integrator.py:27-28) and restart the lane on its next sample
        terminated = lane_live & ~path_alive
        good = ~jnp.any(jnp.isnan(cur), axis=-1, keepdims=True)
        committed = jnp.where(good, jnp.clip(cur, 0.0, RADIANCE_CLAMP), 0.0)
        acc = acc + jnp.where(terminated[..., None], committed, 0.0)
        sample_idx = sample_idx + terminated.astype(jnp.int32)

        new_smp, new_o, new_d = _start_sample(
            coords, camera, seed, spp, sample_idx, cfg.res, cfg.use_tent_filter,
            cfg.sampler,
        )
        restart = terminated & (sample_idx < stop_idx)

        def sel(a, b):  # where(restart, a, b) with broadcasting
            r = restart.reshape(restart.shape + (1,) * (a.ndim - 1))
            return jnp.where(r, a, b)

        cont = path_alive
        o = sel(new_o, jnp.where(cont[..., None], v.next_o, o))
        d = sel(new_d, jnp.where(cont[..., None], v.next_d, d))
        smp = _sel_sampler(restart, new_smp, smp)
        cur = jnp.where(terminated[..., None], 0.0, cur)
        beta = jnp.where(
            terminated[..., None], 1.0, jnp.where(cont[..., None], beta_next, beta)
        )
        pdf_prev = jnp.where(terminated, 1e30, jnp.where(cont, v.pdf_bounce, pdf_prev))
        depth = jnp.where(terminated, 0, depth + 1)

        return (sample_idx, acc, cur, beta, pdf_prev, o, d, smp, depth, it + 1)

    out = jax.lax.while_loop(cond, body, init)
    acc = out[1].reshape(K, n_pix, 3).sum(axis=0)
    return acc / win_count


def render_path_backward_persistent(
    data: SceneData, material, camera, seed, cfg, coords, le_grad, it_start=0
) -> jnp.ndarray:
    """Persistent-lane PRB gradient walk -> d_material (H, W, 4).

    Each lane cycles through: phase 0 (Le replay walk) -> phase 1 (gradient
    walk with the identical sampler stream, subtracting local terms from the
    remaining-path radiance and injecting BRDF adjoints) -> next sample.
    Per-sample math matches path.path_backward exactly; only the order of
    scatter-adds differs (both deterministic)."""
    from .path import SPECULAR
    from ..microfacet import ggx_brdf
    from ..samplers.hashes import lcg_step, lcg_to_unit_float
    from ..texture import (
        cm_to_texture,
        flush_splat_buffer,
        make_splat_buffer,
        reservoir_merge_taps,
        splat_buffer_row,
        stochastic_corner_ids,
        write_bsdf_grad,
    )

    win_count = cfg.window_count
    win_start = jnp.asarray(it_start, jnp.int32)
    K = max(1, min(cfg.lanes_per_pixel, win_count))
    n_pix = coords.shape[0]
    spp = cfg.spp
    base = win_count // K
    extra = win_count % K
    cnts = [base + (1 if k_i < extra else 0) for k_i in range(K)]
    offs = [sum(cnts[:k_i]) for k_i in range(K)]
    coords = jnp.tile(coords, (K, 1))
    le_grad = jnp.tile(le_grad, (K, 1))
    N = coords.shape[0]
    start_idx = win_start + jnp.repeat(jnp.array(offs, jnp.int32), n_pix)
    stop_idx = win_start + jnp.repeat(
        jnp.array([offs[k] + cnts[k] for k in range(K)], jnp.int32), n_pix
    )
    sg = jax.lax.stop_gradient
    md, rr_d = _depths(cfg)
    material = sg(material)

    sampler0, o0, d0 = _start_sample(
        coords, camera, seed, spp, start_idx, cfg.res,
        cfg.use_tent_filter, cfg.sampler,
    )

    n_bins = material.shape[0] * material.shape[1]
    # masked/unused entries carry the sentinel id n_bins so the flush's
    # compaction collapses them into one dead segment (texture.py)
    buf0 = make_splat_buffer(SCATTER_BATCH, N, n_bins, cfg.packed_splat)
    merge = max(1, int(cfg.splat_merge)) if cfg.stochastic_splat else 1
    zf = jnp.zeros((N,), jnp.float32)
    pend0 = (jnp.full((N,), n_bins, jnp.int32), zf, zf, zf, zf)

    init = dict(
        sample_idx=start_idx,
        phase=jnp.zeros((N,), jnp.int32),  # 0 = Le walk, 1 = grad walk
        depth=jnp.zeros((N,), jnp.int32),
        o=o0,
        d=d0,
        beta=jnp.ones((N, 3), jnp.float32),
        pdf_prev=jnp.full((N,), 1e30, jnp.float32),
        smp=sampler0,
        cur=jnp.zeros((N, 3), jnp.float32),  # phase-0 Le accumulator
        le_rem=jnp.zeros((N, 3), jnp.float32),  # phase-1 remaining radiance
        gok=jnp.ones((N,), bool),  # gradient enabled (False if Le was NaN)
        # gradient accumulator carried channel-major (4, H*W): an (H, W, 4)
        # loop carry tiles its trailing 4 up to 128 lanes (32x memory)
        d_mat=(
            jnp.zeros((4, material.shape[0] * material.shape[1]), material.dtype)
            if cfg.stochastic_splat
            else jnp.zeros_like(material)
        ),
        buf=buf0,
        it=jnp.zeros((), jnp.int32),
    )
    if merge > 1:
        init["pend"] = pend0

    def flush(d_mat, buf):
        return flush_splat_buffer(d_mat, buf, n_bins, cfg.packed_splat)

    max_iters = 2 * (base + 1) * md + 2 * md

    def cond(s):
        return jnp.any(s["sample_idx"] < stop_idx) & (s["it"] < max_iters)

    def body(s):
        lane_live = s["sample_idx"] < stop_idx
        in_grad = lane_live & (s["phase"] == 1)
        beta = s["beta"]

        v, smp = _walk_one_bounce(
            data, material, s["o"], s["d"], s["pdf_prev"], lane_live, s["smp"], cfg
        )

        # ---- phase 0: accumulate Le
        cur = s["cur"] + jnp.where(
            (s["phase"] == 0)[..., None], beta * v.add_emit, 0.0
        )
        nee_full_w = v.nee_weight[..., None] * v.nee_light_eval
        nee_contrib = beta * v.bsdf_nee * nee_full_w
        cur = cur + jnp.where(
            ((s["phase"] == 0) & v.nee_ok)[..., None], nee_contrib, 0.0
        )

        # ---- phase 1: subtract local terms, inject adjoints
        le_rem = s["le_rem"] - jnp.where(
            in_grad[..., None], beta * v.add_emit, 0.0
        )
        le_rem = le_rem - jnp.where(
            (in_grad & v.nee_ok)[..., None], nee_contrib, 0.0
        )

        # shading closure over the four SEPARATE channels: the vjp then
        # emits four flat (N,) cotangents — an (N, 4) output would pad its
        # trailing axis to 128 lanes on TPU (32x relayout per bounce)
        def shade(d0, d1, d2, rgh):
            dif = jnp.stack([d0, d1, d2], axis=-1)
            b_nee = ggx_brdf(v.wo_local, v.wi_nee_local, dif, SPECULAR, rgh)
            b_bounce = ggx_brdf(v.wo_local, v.wi_bounce_local, dif, SPECULAR, rgh)
            return b_nee, b_bounce

        (_, b_bounce_p), vjp = jax.vjp(
            shade, v.mat[..., 0], v.mat[..., 1], v.mat[..., 2], v.mat[..., 3]
        )
        gok = s["gok"]
        ct_nee = jnp.where(
            (in_grad & v.nee_ok & gok)[..., None], beta * nee_full_w * le_grad, 0.0
        )
        # continuation adjoint = le_rem / bsdf_bounce (see path.path_backward:
        # le_rem is absolute, every downstream beta is proportional to this
        # bsdf; the reference's beta/pdf*Le form carries a spurious beta)
        inv_pdf = 1.0 / jnp.maximum(v.pdf_bounce, 1e-9)
        ct_bounce = jnp.where(
            (in_grad & v.active & gok)[..., None] & (b_bounce_p > 1e-8),
            le_rem / jnp.maximum(b_bounce_p, 1e-8) * le_grad,
            0.0,
        )
        grads = vjp((ct_nee, ct_bounce))
        grad_on = in_grad & (v.nee_ok | v.active)
        grads = [
            jnp.where(grad_on & ~jnp.isnan(g), g, 0.0) for g in grads
        ]
        pend = None
        if cfg.stochastic_splat:
            u_splat = lcg_to_unit_float(smp.salt())
            ids = stochastic_corner_ids(
                v.uv, u_splat, material.shape[0], material.shape[1]
            )
            ids = jnp.where(grad_on, ids, n_bins)  # sentinel: compacts away
            new_tap = (ids, grads[0], grads[1], grads[2], grads[3])
            if merge > 1:
                # reservoir-collapse `merge` iterations' taps to one row;
                # the partial merge rewrites the SAME slot each iteration,
                # keeping the buffer flush-consistent at loop exit (see
                # path_fused.render_path_backward_fused)
                u_m = lcg_to_unit_float(lcg_step(smp.salt()))
                merged = reservoir_merge_taps(s["pend"], new_tap, u_m, n_bins)
                group_end = jnp.mod(s["it"], merge) == merge - 1
                pend = tuple(
                    jnp.where(group_end, z, vv) for z, vv in zip(pend0, merged)
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
                do_flush,
                lambda args: flush(*args),
                lambda args: args[0],
                (s["d_mat"], buf),
            )
            # reset to sentinel rows after a flush so the final partial
            # flush only adds fresh entries
            buf = jnp.where(do_flush, buf0, buf)
        else:
            buf = s["buf"]
            mat_grad = jnp.stack(grads, axis=-1)
            d_mat = write_bsdf_grad(v.uv, mat_grad, s["d_mat"])

        # ---- continuation / termination
        beta_next = beta * v.bsdf_bounce * inv_pdf[..., None]
        path_alive, rr = _apply_rr(s["depth"], beta_next, v.active, v.rr_scale, rr_d)
        path_alive = path_alive & (s["depth"] + 1 < md)
        beta_next = beta_next * rr[..., None]
        terminated = lane_live & ~path_alive

        # phase transitions
        end_le = terminated & (s["phase"] == 0)
        end_grad = terminated & (s["phase"] == 1)
        le_ok = ~jnp.any(jnp.isnan(cur), axis=-1, keepdims=True)
        new_le = jnp.where(le_ok, cur, 0.0)

        sample_idx = s["sample_idx"] + end_grad.astype(jnp.int32)
        phase = jnp.where(end_le, 1, jnp.where(end_grad, 0, s["phase"]))

        # restart stream: phase-1 start replays the SAME sample's stream;
        # phase-0 start uses the next sample's stream
        new_smp, new_o, new_d = _start_sample(
            coords, camera, seed, spp, sample_idx, cfg.res, cfg.use_tent_filter,
            cfg.sampler,
        )
        restart = terminated & (sample_idx < stop_idx)

        def sel(a, b):
            r = restart.reshape(restart.shape + (1,) * (a.ndim - 1))
            return jnp.where(r, a, b)

        cont = path_alive
        o = sel(new_o, jnp.where(cont[..., None], v.next_o, s["o"]))
        d = sel(new_d, jnp.where(cont[..., None], v.next_d, s["d"]))
        smp = _sel_sampler(restart, new_smp, smp)
        cur = jnp.where(terminated[..., None], 0.0, cur)
        le_rem = jnp.where(end_le[..., None], new_le, le_rem)
        gok = jnp.where(end_le, le_ok[..., 0], gok)
        beta = jnp.where(
            terminated[..., None], 1.0, jnp.where(cont[..., None], beta_next, beta)
        )
        pdf_prev = jnp.where(
            terminated, 1e30, jnp.where(cont, v.pdf_bounce, s["pdf_prev"])
        )
        depth = jnp.where(terminated, 0, s["depth"] + 1)

        out = dict(
            sample_idx=sample_idx, phase=phase, depth=depth, o=o, d=d,
            beta=beta, pdf_prev=pdf_prev, smp=smp, cur=cur, le_rem=le_rem,
            gok=gok, d_mat=d_mat, buf=buf,
            it=s["it"] + 1,
        )
        if merge > 1:
            out["pend"] = pend
        return out

    out = jax.lax.while_loop(cond, body, init)
    if cfg.stochastic_splat:
        # final partial flush (buffers reset to sentinel rows after full
        # flushes, so only fresh entries land)
        d_mat = flush(out["d_mat"], out["buf"])
        return cm_to_texture(d_mat, material.shape[0], material.shape[1])
    return out["d_mat"]
