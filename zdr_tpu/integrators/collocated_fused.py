"""Collocated integrator on the fused Pallas trace kernel.

The collocated estimator (reference: /root/reference/collocated.py) is ONE
closest-hit plus elementwise shading — no NEE, no bounce, no scene lights.
The unfused walk pays the (N, 3)-relayout tax on the trace (accel.trace);
here the trace runs as fused kernel 1 (the MXU Woop sweep for dense scenes,
the HBM-streamed sweep past FUSED_MAX_TRIS) and the shading stays in XLA as
(rows, 128) plane math — no kernel 2 is needed because everything after the
hit is divergence-free elementwise work that XLA fuses by itself.

The backward mirrors collocated.collocated_backward: recompute the hit,
vjp through the componentized GGX shade w.r.t. the fetched material planes,
stochastic single-corner splat through the bounce-batched flush machinery
(texture.make_splat_buffer / flush_splat_buffer) shared with the fused
path/direct backwards.

Scope: any mesh-light configuration (round 4 closed the light-free-only
restriction). Kernel 1's `shade` mask excludes emissive hits (path
semantics — emitters display, they don't shade) but its emit mask covers
exactly the front-facing emissive complement, so the collocated validity
"every front-facing hit" is reconstructed as shade | (add_emit > 0).
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
from .collocated import SPECULAR  # noqa: F401  (parity: same fixed F0)
from .fused_glue import start_sample_planes
from .pallas_bounce import (
    LANES,
    MXU_MIN_TRIS,
    _ggx_brdf,
    _make_onb,
    _to_local,
    build_fused_const,
    build_woop_pack,
    fused_trace_interact,
    pad_to_planes,
    planes_rows,
    read_quads_planes,
)
from .path_fused import FUSED_SAMPLERS, _interpret
from .path_persistent import SCATTER_BATCH
from .wrapper import RADIANCE_CLAMP


def collocated_fused_eligible(data: SceneData, cfg) -> bool:
    from .pallas_stream import STREAM_MAX_TRIS

    mode = getattr(cfg, "fused", "auto")
    if mode == "auto" or mode is True:
        on = jax.default_backend() != "cpu"
    else:
        on = mode == "force"
    meta = data.fused_meta
    return (
        on
        and cfg.integrator == "collocated"
        and cfg.stochastic_splat
        and cfg.sampler in FUSED_SAMPLERS
        and meta is not None
        and meta.num_tris <= STREAM_MAX_TRIS
        # mesh lights are fine: kernel 1's emit mask is exactly the
        # frontfacing-emissive complement of its shade mask, so the
        # collocated "shade every front-facing hit" validity is
        # shade | (add_emit > 0) — see _one_sample (closes VERDICT r3
        # item 4; the reference shades emissive surfaces like any other,
        # collocated.py:10-31)
    )


def _setup(data, material, cfg, coords):
    from .pallas_bounce import FUSED_MAX_TRIS, spatial_lane_perm
    from .pallas_stream import build_stream_pack

    if getattr(cfg, "lane_order", "morton") == "morton":
        perm, inv = spatial_lane_perm(coords)
        coords = coords[perm]
    else:
        perm = inv = None
    meta = data.fused_meta
    scene_pack, _light_pack = build_fused_const(data, meta)
    if meta.num_tris > FUSED_MAX_TRIS:
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
    packed = pack_quads(material, getattr(cfg, "texture_bf16", False))
    n_pix = coords.shape[0]
    rows = planes_rows(n_pix)
    pxp = pad_to_planes(coords[:, 0], rows)
    pyp = pad_to_planes(coords[:, 1], rows)
    real = pad_to_planes(jnp.ones((n_pix,), jnp.int32), rows)
    return (meta, scene_pack, packed, rows, pxp, pyp, real, woop, stream,
            (perm, inv))


def _corner_ids_planes(ux, uy, u_splat, tex_h, tex_w):
    """Stochastic single-corner splat ids on plane arrays — the same
    bilinear-corner lottery as texture.stochastic_corner_ids and the fused
    kernels' gradient taps (pallas_bounce._shade_kernel)."""
    x = ux * (tex_w - 1)
    y = (1.0 - uy) * (tex_h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xa = jnp.clip(x0i, 0, tex_w - 1)
    ya = jnp.clip(y0i, 0, tex_h - 1)
    xb = jnp.clip(x0i + 1, 0, tex_w - 1)
    yb = jnp.clip(y0i + 1, 0, tex_h - 1)
    w00 = (1 - fx) * (1 - fy)
    w01 = (1 - fx) * fy
    w10 = fx * (1 - fy)
    c0 = w00
    c1 = c0 + w01
    c2 = c1 + w10
    return jnp.where(
        u_splat < c0,
        ya * tex_w + xa,
        jnp.where(
            u_splat < c1,
            yb * tex_w + xa,
            jnp.where(u_splat < c2, ya * tex_w + xb, yb * tex_w + xb),
        ),
    )


def _one_sample(data, material, camera, seed, cfg, setup, it, want_grad,
                grad_extra=None):
    """One collocated sample. Returns (radiance3, (g0..g3, ids) | None)."""
    from .pallas_stream import stream_trace_interact

    (meta, scene_pack, packed, rows, pxp, pyp, real, woop, stream,
     _order) = setup
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
    (px, py, pz, ux, uy, nsx, nsy, nsz, _ngx, _ngy, _ngz,
     shade, aer, aeg, aeb, _miss) = k1
    # the collocated estimator shades EVERY front-facing hit (reference
    # collocated.py:20 — emission plays no role); kernel 1 splits that set
    # into shade (non-emissive) and emit_on (emissive, add_emit > 0 with
    # pdf_prev = 1e30 forcing mis ~ 1), whose union reconstructs it exactly
    valid = (shade != 0) | (aer > 0) | (aeg > 0) | (aeb > 0)
    ns = (nsx, nsy, nsz)
    wo = (-d[0], -d[1], -d[2])
    tangent, binormal = _make_onb(ns)
    wo_local = _to_local(tangent, binormal, ns, wo)
    # hit distance from the returned position (|d| = 1): li = 1/t^2
    t_hit = (px - o[0]) * d[0] + (py - o[1]) * d[1] + (pz - o[2]) * d[2]
    li = (1.0 / jnp.maximum(t_hit, 1e-6)) ** 2
    d0, d1, d2, rough = read_quads_planes(ux, uy, packed, h, w)

    def shade_fn(c0, c1, c2, rg):
        return _ggx_brdf(wo_local, wo_local, (c0, c1, c2), rg)

    if not want_grad:
        beta = shade_fn(d0, d1, d2, rough)
        rad = tuple(jnp.where(valid, beta[c] * li, 0.0) for c in range(3))
        return rad, None

    (beta, vjp) = jax.vjp(shade_fn, d0, d1, d2, rough)
    rad = tuple(jnp.where(valid, beta[c] * li, 0.0) for c in range(3))
    lgr, lgg, lgb = grad_extra
    ct = tuple(
        jnp.where(valid, li * g, 0.0) for g in (lgr, lgg, lgb)
    )
    g0, g1, g2, g3 = vjp(ct)
    g0 = jnp.where(valid & ~jnp.isnan(g0), g0, 0.0)
    g1 = jnp.where(valid & ~jnp.isnan(g1), g1, 0.0)
    g2 = jnp.where(valid & ~jnp.isnan(g2), g2, 0.0)
    g3 = jnp.where(valid & ~jnp.isnan(g3), g3, 0.0)
    u_splat = lcg_to_unit_float(smp.salt())
    ids = _corner_ids_planes(ux, uy, u_splat, h, w)
    ids = jnp.where(valid, ids, h * w)  # sentinel: compacted away
    return rad, (g0, g1, g2, g3, ids)


def render_collocated_fused(
    data: SceneData, material, camera, seed, cfg, coords, it_start=0
):
    """Fused collocated forward: spp-averaged radiance -> (n_pix, 3)."""
    setup = _setup(data, material, cfg, coords)
    rows = setup[3]
    n_pix = coords.shape[0]
    count = cfg.window_count
    start = jnp.asarray(it_start, jnp.int32)

    def one(acc, it):
        rad, _ = _one_sample(
            data, material, camera, seed, cfg, setup, it, False
        )
        good = ~(jnp.isnan(rad[0]) | jnp.isnan(rad[1]) | jnp.isnan(rad[2]))
        acc = tuple(
            acc[c] + jnp.where(good, jnp.clip(rad[c], 0.0, RADIANCE_CLAMP), 0.0)
            for c in range(3)
        )
        return acc, None

    zeros = jnp.zeros((rows, LANES), jnp.float32)
    acc, _ = jax.lax.scan(one, (zeros, zeros, zeros), start + jnp.arange(count))
    out = jnp.stack([acc[c].reshape(-1)[:n_pix] for c in range(3)], axis=-1)
    inv = setup[9][1]
    if inv is not None:
        out = out[inv]  # restore the caller's pixel order
    return out / count


def render_collocated_backward_fused(
    data: SceneData, material, camera, seed, cfg, coords, le_grad, it_start=0
):
    """Fused collocated gradient walk -> d_material (H, W, 4)."""
    setup = _setup(data, material, cfg, coords)
    rows = setup[3]
    h, w = material.shape[0], material.shape[1]
    n_bins = h * w
    n_lanes = rows * LANES
    material = jax.lax.stop_gradient(material)
    count = cfg.window_count
    start = jnp.asarray(it_start, jnp.int32)

    perm = setup[9][0]
    if perm is not None:
        le_grad = le_grad[perm]  # match the sweep lane order
    lgr = pad_to_planes(le_grad[:, 0], rows)
    lgg = pad_to_planes(le_grad[:, 1], rows)
    lgb = pad_to_planes(le_grad[:, 2], rows)

    buf0 = make_splat_buffer(SCATTER_BATCH, n_lanes, n_bins, cfg.packed_splat)

    def flush(d_mat, buf):
        return flush_splat_buffer(d_mat, buf, n_bins, cfg.packed_splat)

    def one(carry, idx_it):
        d_mat, buf = carry
        slot_i, it = idx_it
        _, g = _one_sample(
            data, material, camera, seed, cfg, setup, it, True,
            grad_extra=(lgr, lgg, lgb),
        )
        g0, g1, g2, g3, ids = g
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
