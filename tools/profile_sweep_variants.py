"""MXU sweep-kernel variant shootout at the reference-protocol scene size
(962-tri sphere, 262k rays), for both coherent (primary) and incoherent
(bounce-like) ray sets.

Variants of the closest-hit Woop sweep (pallas_bounce._mxu_sweep_row):
  v0   shipped kernel (fused_trace_interact with woop)
  od   [o|d] N-stacked into ONE (tile,4)x(4,256) comp dot set (3 passes
       instead of 6 per tile)
  key  od + packed-key argmin: (sortable-int t & ~0x1FF) | idx9 -> one
       i32 min replaces tm-where/min/eq/where-iota/min
  t128 od+key with tile=128 (finer AABB culling, 8 tiles)
  t256 od+key with tile=256
  g4   od+key, 4 ray rows per group (N=1024 matmuls, 4x fewer calls)
  gth  one-hot gather: HIGHEST (shipped) vs bf16x2 (2 DEFAULT passes,
       exact for one-hot selection of hi/lo split values)
  lite k1b-lite: sweep + emitter-only epilogue (gather 20 rows: 12 woop
       + ng3, em3, inv_pdfc + pad; outputs add_emit3 + miss only)

Usage: python -u tools/profile_sweep_variants.py
"""

import functools
import os
import sys
import time

import jax

SMOKE = os.environ.get("ZDR_SWEEP_SMOKE", "") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from zdr_tpu.integrators import pallas_bounce as pb
from zdr_tpu.integrators.pallas_bounce import (
    BLOCK_ROWS, LANES, _const_spec2, _gat_rows, _interact_epilogue,
    _mxu_rowdot, _ray_spec, _sweep_dot, build_fused_const, build_woop_pack,
)

f32 = jnp.float32


def inloop(fn, *args, reps=8):
    @jax.jit
    def run(*a):
        def body(i, acc):
            a0 = a[0] + (acc * 0.0).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.reshape(-1)[:8].astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))

    float(run(*args))
    t0 = time.time()
    float(run(*args))
    return (time.time() - t0) / reps


# ---------------------------------------------------------------- variants


def sweep_row_v(gat_r, box_r, tile, n_tiles, o_aug, d_aug, active,
                key_min=True):
    """Closest sweep over one (or G) ray rows. o_aug/d_aug: (4, N).
    [o|d] N-stacked: 3 comp dot sets per tile instead of 6."""
    N = o_aug.shape[1]
    o = (o_aug[0:1], o_aug[1:2], o_aug[2:3])
    inv = tuple(
        1.0 / jnp.where(d_aug[k:k + 1] == 0.0, 1e-20, d_aug[k:k + 1])
        for k in range(3)
    )
    od = jnp.concatenate([o_aug, d_aug], axis=1)  # (4, 2N)

    def tile_need(ti):
        t0 = tuple((box_r[ti, k] - o[k]) * inv[k] for k in range(3))
        t1 = tuple((box_r[ti, 3 + k] - o[k]) * inv[k] for k in range(3))
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0[0], t1[0]), jnp.minimum(t0[1], t1[1])),
            jnp.maximum(jnp.minimum(t0[2], t1[2]), 0.0),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0[0], t1[0]), jnp.maximum(t0[1], t1[1])),
            jnp.maximum(t0[2], t1[2]),
        )
        return jnp.any((tmin <= tmax) & active)

    big_i = jnp.int32(0x7F800000)  # +inf bit pattern: > any packed key

    def sweep_tile(ti, carry):
        ts = pl.ds(ti * tile, tile)
        ouv = _sweep_dot(gat_r[0:4, ts], od)  # (tile, 2N)
        ovv = _sweep_dot(gat_r[4:8, ts], od)
        oww = _sweep_dot(gat_r[8:12, ts], od)
        ou, du = ouv[:, :N], ouv[:, N:]
        ov, dv = ovv[:, :N], ovv[:, N:]
        ow, dw = oww[:, :N], oww[:, N:]
        tq = -ow / dw
        u = ou + tq * du
        v = ov + tq * dv
        ok = (
            (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (tq > 0.0) & (tq < 1e30)
        )
        if key_min:
            # positive-f32 bit pattern is order-preserving as int32; pack
            # the within-tile index into the low 9 mantissa bits (tile<=512)
            ti_bits = jax.lax.bitcast_convert_type(tq, jnp.int32)
            idx = jax.lax.broadcasted_iota(jnp.int32, ok.shape, 0)
            key = (ti_bits & jnp.int32(~0x1FF)) | idx
            key = jnp.where(ok, key, big_i)
            kmin = jnp.min(key, axis=0, keepdims=True)  # (1, N)
            best_key, best_tile = carry
            better = kmin < best_key
            return (
                jnp.where(better, kmin, best_key),
                jnp.where(better, jnp.int32(ti), best_tile),
            )
        best_t, best_i = carry
        tm = jnp.where(ok, tq, 1e30)
        t_tile = jnp.min(tm, axis=0, keepdims=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, ok.shape, 0) + ti * tile
        cand = jnp.where(ok & (tm == t_tile), idx, jnp.int32(1 << 30))
        i_tile = jnp.min(cand, axis=0, keepdims=True)
        better = t_tile < best_t
        return (
            jnp.where(better, t_tile, best_t),
            jnp.where(better, i_tile, best_i),
        )

    if key_min:
        init = (jnp.full((1, N), big_i, jnp.int32), jnp.zeros((1, N), jnp.int32))
    else:
        init = (jnp.full((1, N), 1e30, f32), jnp.full((1, N), 1 << 30, jnp.int32))

    def body(ti, carry):
        return jax.lax.cond(tile_need(ti), lambda c: sweep_tile(ti, c),
                            lambda c: c, carry)

    out = jax.lax.fori_loop(0, n_tiles, body, init)
    if key_min:
        kmin, best_tile = out
        miss = kmin == big_i
        prim = jnp.where(miss, 0, best_tile * tile + (kmin & 0x1FF))
        return miss, prim
    best_t, best_i = out
    miss = best_t >= 1e30
    return miss, jnp.where(miss, 0, best_i)


def trace_kernel_v(t_pad, tile, G, gather_mode, lite, *refs):
    """Variant kernel-1: od-stacked sweep + key min + optional G-row
    batching + gather variants. Outputs like _mxu_trace_kernel (or lite)."""
    gat_r, box_r = refs[0], refs[1]
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, pdfp_r, act_r) = refs[2:10]
    outs = refs[10:]
    n_tiles = t_pad // tile
    rows = ox_r.shape[0]
    ones = jnp.ones((G, LANES), f32)
    zeros = jnp.zeros((G, LANES), f32)

    def flat(p):  # (G, L) -> (1, G*L)
        return jnp.concatenate([p[g:g + 1] for g in range(G)], axis=1)

    def group(gi, _):
        sl = pl.ds(gi * G, G)
        o = (flat(ox_r[sl, :]), flat(oy_r[sl, :]), flat(oz_r[sl, :]))
        d = (flat(dx_r[sl, :]), flat(dy_r[sl, :]), flat(dz_r[sl, :]))
        act = flat(act_r[sl, :]) != 0
        o_aug = jnp.concatenate([*o, jnp.ones_like(o[0])], axis=0)
        d_aug = jnp.concatenate([*d, jnp.zeros_like(o[0])], axis=0)
        miss, prim = sweep_row_v(
            gat_r, box_r, tile, n_tiles, o_aug, d_aug, act
        )
        # winner gather
        n_rows_g = 20 if lite else _gat_rows()
        acc0 = jnp.zeros((n_rows_g, o_aug.shape[1]), f32)

        def g_tile(ti, acc):
            rel = prim - ti * tile
            ohi = jax.lax.broadcasted_iota(jnp.int32, (tile, o_aug.shape[1]), 0)
            oh = (ohi == rel).astype(f32)
            gt = gat_r[0:n_rows_g, pl.ds(ti * tile, tile)]
            if gather_mode == "highest":
                return acc + jax.lax.dot_general(
                    gt, oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=f32,
                )
            # bf16x2: one-hot is exact in bf16; split values hi/lo
            gh = gt.astype(jnp.bfloat16).astype(f32)
            gl = gt - gh

            def dd(x):
                return jax.lax.dot_general(
                    x, oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=f32,
                )

            return acc + dd(gh) + dd(gl)

        def g_need(ti):
            in_tile = (prim >= ti * tile) & (prim < (ti + 1) * tile) & ~miss
            return jnp.any(in_tile)

        def g_body(ti, acc):
            return jax.lax.cond(g_need(ti), lambda a: g_tile(ti, a),
                                lambda a: a, acc)

        gat = jax.lax.fori_loop(0, n_tiles, g_body, acc0)
        gat = jnp.where(miss, 0.0, gat)
        bw_u, bw_v, bw_w = gat[0:4], gat[4:8], gat[8:12]
        ow = _mxu_rowdot(bw_w, o_aug)
        dw = _mxu_rowdot(bw_w, d_aug)
        t_win = jnp.where(miss, 1.0, -ow / jnp.where(dw == 0.0, 1.0, dw))
        if lite:
            # emitter-only epilogue: gat rows 12:19 = ng3, em3, inv_pdfc
            ngx, ngy, ngz = gat[12:13], gat[13:14], gat[14:15]
            emr, emg, emb = gat[15:16], gat[16:17], gat[17:18]
            inv_pdfc = gat[18:19]
            pdf_prev = flat(pdfp_r[sl, :])
            cos_light = -(ngx * d[0] + ngy * d[1] + ngz * d[2])
            frontfacing = cos_light >= 1e-4
            emissive = (emr > 0.0) | (emg > 0.0) | (emb > 0.0)
            sqr = t_win * t_win
            pdf_hit = sqr / jnp.maximum(inv_pdfc * cos_light, 1e-12)
            mis_hit = pdf_prev / jnp.maximum(pdf_prev + pdf_hit, 1e-4)
            on = act & ~miss & frontfacing & emissive
            vals = (
                jnp.where(on, mis_hit * emr, 0.0),
                jnp.where(on, mis_hit * emg, 0.0),
                jnp.where(on, mis_hit * emb, 0.0),
                (act & miss).astype(jnp.int32),
            )
        else:
            bu = _mxu_rowdot(bw_u, o_aug) + t_win * _mxu_rowdot(bw_u, d_aug)
            bv = _mxu_rowdot(bw_v, o_aug) + t_win * _mxu_rowdot(bw_v, d_aug)
            av = tuple(gat[12 + k: 13 + k] for k in range(22))
            vals = _interact_epilogue(
                o, d, flat(pdfp_r[sl, :]), act,
                jnp.where(miss, 1e30, t_win), bu, bv, miss, av,
            )
        for ref, val in zip(outs, vals):
            # (1, G*L) -> G rows
            for g in range(G):
                ref[pl.ds(gi * G + g, 1), :] = val[:, g * LANES:(g + 1) * LANES]
        return 0

    jax.lax.fori_loop(0, rows // G, group, 0)


def run_variant(gat_t, box_t, t_pad, tile, rays, G=1, gather="highest",
                lite=False):
    r = rays[0].shape[0]
    grid = (r // BLOCK_ROWS,)
    n_out = 4 if lite else 16
    out_shape = (
        [jax.ShapeDtypeStruct((r, LANES), f32)] * (3 if lite else 11)
        + ([jax.ShapeDtypeStruct((r, LANES), jnp.int32)] if lite else
           [jax.ShapeDtypeStruct((r, LANES), jnp.int32)]
           + [jax.ShapeDtypeStruct((r, LANES), f32)] * 3
           + [jax.ShapeDtypeStruct((r, LANES), jnp.int32)])
    )
    return pl.pallas_call(
        functools.partial(trace_kernel_v, t_pad, tile, G, gather, lite),
        grid=grid,
        in_specs=[_const_spec2(gat_t.shape), _const_spec2(box_t.shape)]
        + [_ray_spec()] * 8,
        out_specs=[_ray_spec()] * n_out,
        out_shape=out_shape,
        interpret=SMOKE,
    )(gat_t, box_t, *rays)


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere
    from zdr_tpu.integrators.wrapper import _pixel_grid
    from zdr_tpu.integrators.fused_glue import start_sample_planes
    from zdr_tpu.integrators.pallas_bounce import pad_to_planes, planes_rows

    scene = Scene(
        [
            (make_uv_sphere(0.5, 16, 32), None, None),
            (make_quad(size=1.0, y=-2.0), None, 40.0),
        ],
        integrator="direct",
    )
    scene.camera = Camera(
        fov=0.8, origin=float3(1.5, 0.3, 0.0), target=float3(0.0, 0.0, 0.0)
    )
    data = scene._data
    meta = data.fused_meta
    scene_pack, _ = build_fused_const(data, meta)
    res = (128, 128) if SMOKE else (512, 512)
    coords = _pixel_grid(res)
    n_pix = coords.shape[0]
    rows = planes_rows(n_pix)
    pxp = pad_to_planes(coords[:, 0], rows)
    pyp = pad_to_planes(coords[:, 1], rows)
    real = pad_to_planes(jnp.ones((n_pix,), jnp.int32), rows)
    cfgres = res
    seed = jnp.asarray(1, jnp.int32)
    sidx = jnp.zeros((rows, LANES), jnp.int32)
    _, o, d = start_sample_planes(
        "lcg", pxp, pyp, scene.camera, seed, sidx, 16, cfgres, True
    )
    big = jnp.full((rows, LANES), 1e30, f32)
    prim_rays = (*o, *d, big, real)

    # incoherent bounce-like rays: origins near sphere surface, random dirs
    rs = np.random.RandomState(7)
    n = rows * LANES
    dirs = rs.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    orig = rs.randn(n, 3).astype(np.float32)
    orig = 0.52 * orig / np.linalg.norm(orig, axis=1, keepdims=True)
    bo = tuple(jnp.asarray(orig[:, k].reshape(rows, LANES)) for k in range(3))
    bd = tuple(jnp.asarray(dirs[:, k].reshape(rows, LANES)) for k in range(3))
    bounce_rays = (*bo, *bd, big, real)

    def v0(rays, woop):
        return pb.fused_trace_interact(scene_pack, meta.num_tris, rays,
                                       woop=woop, interpret=SMOKE)

    woop512 = build_woop_pack(scene_pack)
    print(f"t_pad={woop512[2]} tile={woop512[3]}", flush=True)

    ref_out = jax.jit(lambda *r: v0(r, woop512))(*prim_rays)
    ref_out = jax.block_until_ready(ref_out)

    ray_sets = (("prim", prim_rays),) if SMOKE else (
        ("prim", prim_rays), ("bounce", bounce_rays))
    for name, rays in ray_sets:
        t = 0.0 if SMOKE else inloop(lambda *r: v0(r, woop512), *rays)
        print(f"[{name}] v0 shipped:            {t*1e3:7.2f} ms", flush=True)

        for tag, tile_n, G, gth, lite in (
            ("od+key t512", 512, 1, "highest", False),
            ("od+key t512 bf16x2gth", 512, 1, "bf16x2", False),
            ("od+key t256 bf16x2gth", 256, 1, "bf16x2", False),
            ("od+key t128 bf16x2gth", 128, 1, "bf16x2", False),
            ("od+key t512 g4 bf16x2", 512, 4, "bf16x2", False),
            ("od+key t256 g4 bf16x2", 256, 4, "bf16x2", False),
            ("lite  t256 bf16x2", 256, 1, "bf16x2", True),
            ("lite  t256 g4 bf16x2", 256, 4, "bf16x2", True),
        ):
            # rebuild woop at this tile size
            if tile_n == 512:
                wp = woop512
            else:
                wp = build_woop_pack(scene_pack, tile=tile_n)
            gat_t, box_t, t_pad, tile = wp
            try:
                fn = lambda *r: run_variant(gat_t, box_t, t_pad, tile, r,
                                            G=G, gather=gth, lite=lite)
                out = jax.block_until_ready(jax.jit(fn)(*rays))
                t = 0.0 if SMOKE else inloop(fn, *rays)
                # correctness vs shipped (prim rays only, non-lite)
                err = ""
                if not lite and name == "prim":
                    ref = jax.block_until_ready(
                        jax.jit(lambda *r: v0(r, woop512))(*rays))
                    sh_ref = np.asarray(ref[11])
                    sh_v = np.asarray(out[11])
                    mism = (sh_ref != sh_v).mean()
                    dt = np.abs(np.asarray(ref[0]) - np.asarray(out[0]))
                    err = f"  shade-mismatch={mism:.2e} p.x maxdiff={dt.max():.2e}"
                print(f"[{name}] {tag:24s}{t*1e3:7.2f} ms{err}", flush=True)
            except Exception as e:
                print(f"[{name}] {tag:24s}FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
