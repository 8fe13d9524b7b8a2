"""Decompose kernel-1 cost: where do the milliseconds go, fori vs MXU.

Variants (962-tri sphere, 262k rays):
  fori-full   MT sweep + attr select sweep        (production fori path)
  fori-mt     MT sweep only, attrs zeroed          -> attr-sweep share
  mxu-full    Woop matmul sweep + one-hot gather   (production MXU path)
  mxu-sweep   Woop sweep only                      -> gather share
  mxu-default sweep matmuls at DEFAULT precision   -> HIGHEST share
  mxu-od      combined [o|d] matmul (N=256)        -> matmul-count share
  hybrid      fori MT sweep + MXU one-hot gather
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.asarray(x).sum())


def inloop(fn, reps=8):
    @jax.jit
    def run():
        def body(i, acc):
            return acc + fn()[0][:1, :8].sum()
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))

    sync(run())
    t0 = time.time()
    sync(run())
    return (time.time() - t0) / reps


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere
    import zdr_tpu.integrators.pallas_bounce as pb
    from zdr_tpu.integrators.fused_glue import start_sample_planes
    from zdr_tpu.integrators.wrapper import _pixel_grid

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
    n_tris = meta.num_tris
    scene_pack, _ = pb.build_fused_const(data, meta)
    scene_pack = jax.block_until_ready(jnp.asarray(scene_pack))
    gat_t, t_pad, tile = pb.build_woop_pack(scene_pack)
    gat_t = jnp.asarray(gat_t)
    n_tiles = t_pad // tile
    # legacy (3T, 4) table for the pre-tcomp variants
    woop_t = jnp.asarray(
        jnp.stack([gat_t[0:4].T, gat_t[4:8].T, gat_t[8:12].T], axis=0)
        .reshape(3, n_tiles, tile, 4).transpose(1, 0, 2, 3)
        .reshape(n_tiles * 3 * tile, 4)
    )

    res = (512, 512)
    coords = _pixel_grid(res)
    rows = pb.planes_rows(coords.shape[0])
    pxp = pb.pad_to_planes(coords[:, 0], rows)
    pyp = pb.pad_to_planes(coords[:, 1], rows)
    sidx = jnp.zeros((rows, pb.LANES), jnp.int32)
    smp, o, d = start_sample_planes(
        "lcg", pxp, pyp, scene.camera, jnp.asarray(1, jnp.int32), sidx, 16,
        res, True,
    )
    rays = tuple(jax.block_until_ready(r) for r in (*o, *d))
    LANES, BR = pb.LANES, pb.BLOCK_ROWS
    f32 = jnp.float32
    HP = jax.lax.Precision.HIGHEST

    def ray_spec():
        return pl.BlockSpec((BR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    grid = (rows // BR,)
    out3 = [jax.ShapeDtypeStruct((rows, LANES), f32)] * 3

    # ---------------- fori variants
    def fori_kernel(with_attr, refs):
        scene_r = refs[0]
        o = (refs[1][:], refs[2][:], refs[3][:])
        d = (refs[4][:], refs[5][:], refs[6][:])
        t_o, u_o, a_o = refs[7:]

        def mt_body(ti, carry):
            best_t, best_u, best_prim = carry
            p0 = (scene_r[ti, 0], scene_r[ti, 1], scene_r[ti, 2])
            e1 = (scene_r[ti, 3], scene_r[ti, 4], scene_r[ti, 5])
            e2 = (scene_r[ti, 6], scene_r[ti, 7], scene_r[ti, 8])
            h = pb._vcross(d, e2)
            a = pb._vdot(e1, h)
            f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
            s = pb._vsub(o, p0)
            u = f * pb._vdot(s, h)
            q = pb._vcross(s, e1)
            v = f * pb._vdot(d, q)
            t = f * pb._vdot(e2, q)
            ok = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (t < best_t))
            return (jnp.where(ok, t, best_t), jnp.where(ok, u, best_u),
                    jnp.where(ok, ti, best_prim))

        init = (jnp.full_like(o[0], 1e30), jnp.zeros_like(o[0]),
                jnp.full(o[0].shape, -1, jnp.int32))
        best_t, bu, prim = jax.lax.fori_loop(0, n_tris, mt_body, init)
        if with_attr == "fori":
            def attr_body(ti, carry):
                m = prim == ti
                return tuple(
                    jnp.where(m, scene_r[ti, 9 + k], carry[k]) for k in range(22)
                )
            av = jax.lax.fori_loop(
                0, n_tris, attr_body,
                tuple(jnp.zeros_like(o[0]) for _ in range(22)),
            )
            acc = functools.reduce(lambda a, b: a + b, av)
        elif with_attr == "mxu":
            gat_r = refs[0]  # NOTE: hybrid passes gat table as refs[0] extra
            acc = jnp.zeros_like(o[0])
        else:
            acc = jnp.zeros_like(o[0])
        t_o[:] = best_t
        u_o[:] = bu
        a_o[:] = acc

    def run_fori(mode):
        return pl.pallas_call(
            lambda *refs, m=mode: fori_kernel(m, refs),
            grid=grid,
            in_specs=[const_spec(scene_pack.shape)] + [ray_spec()] * 6,
            out_specs=[ray_spec()] * 3,
            out_shape=out3,
        )(scene_pack, *rays)

    # ---------------- hybrid: fori MT + per-group one-hot MXU gather
    def hybrid_kernel(refs):
        scene_r, gat_r = refs[0], refs[1]
        o = (refs[2][:], refs[3][:], refs[4][:])
        d = (refs[5][:], refs[6][:], refs[7][:])
        t_o, u_o, a_o = refs[8:11]
        scr = refs[11]  # (BR, LANES) f32 scratch for attr checksum

        def mt_body(ti, carry):
            best_t, best_u, best_prim = carry
            p0 = (scene_r[ti, 0], scene_r[ti, 1], scene_r[ti, 2])
            e1 = (scene_r[ti, 3], scene_r[ti, 4], scene_r[ti, 5])
            e2 = (scene_r[ti, 6], scene_r[ti, 7], scene_r[ti, 8])
            h = pb._vcross(d, e2)
            a = pb._vdot(e1, h)
            f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
            s = pb._vsub(o, p0)
            u = f * pb._vdot(s, h)
            q = pb._vcross(s, e1)
            v = f * pb._vdot(d, q)
            t = f * pb._vdot(e2, q)
            ok = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (t < best_t))
            return (jnp.where(ok, t, best_t), jnp.where(ok, u, best_u),
                    jnp.where(ok, ti, best_prim))

        init = (jnp.full_like(o[0], 1e30), jnp.zeros_like(o[0]),
                jnp.full(o[0].shape, -1, jnp.int32))
        best_t, bu, prim = jax.lax.fori_loop(0, n_tris, mt_body, init)

        def group(g, _):
            sl = pl.ds(g, 1)
            pr = prim[g:g+1] if False else jax.lax.dynamic_slice(prim, (g, 0), (1, LANES))
            safe = jnp.where(pr < 0, 0, pr)
            gat = pb._mxu_gather_row(gat_r, tile, n_tiles, safe, pr < 0)
            scr[sl, :] = jnp.sum(gat[12:34], axis=0, keepdims=True)
            return 0

        jax.lax.fori_loop(0, BR, group, 0)
        t_o[:] = best_t
        u_o[:] = bu
        a_o[:] = scr[:]

    def run_hybrid():
        return pl.pallas_call(
            lambda *refs: hybrid_kernel(refs),
            grid=grid,
            in_specs=[const_spec(scene_pack.shape), const_spec(gat_t.shape)]
            + [ray_spec()] * 6,
            out_specs=[ray_spec()] * 3,
            out_shape=out3,
            scratch_shapes=[pltpu.VMEM((BR, LANES), f32)],
        )(scene_pack, gat_t, *rays)

    # ---------------- MXU variants
    def mxu_kernel(variant, refs):
        woop_r, gat_r = refs[0], refs[1]
        oxr, oyr, ozr, dxr, dyr, dzr = refs[2:8]
        t_o, u_o, a_o = refs[8:11]
        scr_t, scr_u, scr_a = refs[11:14]
        ones = jnp.ones((1, LANES), f32)
        zeros = jnp.zeros((1, LANES), f32)
        prec = {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
        }.get(variant, HP)

        def group(g, _):
            sl = pl.ds(g, 1)
            o_aug = jnp.concatenate(
                [oxr[sl, :], oyr[sl, :], ozr[sl, :], ones], axis=0
            )
            d_aug = jnp.concatenate(
                [dxr[sl, :], dyr[sl, :], dzr[sl, :], zeros], axis=0
            )
            big_i = jnp.int32(1 << 30)

            def tile_body(ti, carry):
                best_t, best_i = carry
                base = ti * (3 * tile)
                b = woop_r[pl.ds(base, 3 * tile), :]
                if variant == "tcomp":
                    # gat-backed transposed rows: no (3T, 4) minor-axis-4
                    # table (32x VMEM pad); 6 transposed dots per tile
                    def td(x, y):
                        return jax.lax.dot_general(
                            x, y, (((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=f32)

                    def tcomp(x, y):
                        xh = x.astype(jnp.bfloat16).astype(f32)
                        yh = y.astype(jnp.bfloat16).astype(f32)
                        return td(xh, yh) + td(xh, y - yh) + td(x - xh, yh)

                    ts = pl.ds(ti * tile, tile)
                    bu3 = gat_r[0:4, ts]
                    bv3 = gat_r[4:8, ts]
                    bw3 = gat_r[8:12, ts]
                    ou, du = tcomp(bu3, o_aug), tcomp(bu3, d_aug)
                    ov, dv = tcomp(bv3, o_aug), tcomp(bv3, d_aug)
                    ow, dw = tcomp(bw3, o_aug), tcomp(bw3, d_aug)
                    op = dp = None
                elif variant == "comp":
                    def dd(x, y):
                        return jax.lax.dot_general(
                            x, y, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=f32)

                    def comp(x, y):
                        xh = x.astype(jnp.bfloat16).astype(f32)
                        yh = y.astype(jnp.bfloat16).astype(f32)
                        return dd(xh, yh) + dd(xh, y - yh) + dd(x - xh, yh)

                    op = comp(b, o_aug)
                    dp = comp(b, d_aug)
                elif variant == "od":
                    both = jnp.concatenate([o_aug, d_aug], axis=1)  # (4, 256)
                    outp = jax.lax.dot_general(
                        b, both, (((1,), (0,)), ((), ())), precision=prec,
                        preferred_element_type=f32)
                    op, dp = outp[:, :LANES], outp[:, LANES:]
                else:
                    op = jax.lax.dot_general(
                        b, o_aug, (((1,), (0,)), ((), ())), precision=prec,
                        preferred_element_type=f32)
                    dp = jax.lax.dot_general(
                        b, d_aug, (((1,), (0,)), ((), ())), precision=prec,
                        preferred_element_type=f32)
                if variant != "tcomp":
                    ou, ov, ow = op[0:tile], op[tile:2*tile], op[2*tile:3*tile]
                    du, dv, dw = dp[0:tile], dp[tile:2*tile], dp[2*tile:3*tile]
                if variant == "recip":
                    tq = -ow * pl.reciprocal(dw, approx=True)
                else:
                    tq = -ow / dw
                u = ou + tq * du
                v = ov + tq * dv
                ok = ((u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                      & (tq > 0.0))
                tm = jnp.where(ok, tq, 1e30)
                t_tile = jnp.min(tm, axis=0, keepdims=True)
                idx = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 0) + ti * tile
                cand = jnp.where(ok & (tm == t_tile), idx, big_i)
                i_tile = jnp.min(cand, axis=0, keepdims=True)
                better = t_tile < best_t
                return (jnp.where(better, t_tile, best_t),
                        jnp.where(better, i_tile, best_i))

            best_t, best_i = jax.lax.fori_loop(
                0, n_tiles, tile_body,
                (jnp.full((1, LANES), 1e30, f32),
                 jnp.full((1, LANES), big_i, jnp.int32)),
            )
            miss = best_t >= 1e30
            scr_t[sl, :] = best_t
            if variant == "sweep":
                scr_u[sl, :] = best_i.astype(f32)
                scr_a[sl, :] = zeros
            else:
                prim = jnp.where(miss, 0, best_i)
                gat = pb._mxu_gather_row(gat_r, tile, n_tiles, prim, miss)
                scr_u[sl, :] = jnp.sum(gat[0:4], axis=0, keepdims=True)
                scr_a[sl, :] = jnp.sum(gat[12:34], axis=0, keepdims=True)
            return 0

        jax.lax.fori_loop(0, BR, group, 0)
        t_o[:] = scr_t[:]
        u_o[:] = scr_u[:]
        a_o[:] = scr_a[:]

    def run_mxu(variant):
        return pl.pallas_call(
            lambda *refs, v=variant: mxu_kernel(v, refs),
            grid=grid,
            in_specs=[const_spec(woop_t.shape), const_spec(gat_t.shape)]
            + [ray_spec()] * 6,
            out_specs=[ray_spec()] * 3,
            out_shape=out3,
            scratch_shapes=[pltpu.VMEM((BR, LANES), f32)] * 3,
        )(woop_t, gat_t, *rays)

    # ---------------- AABB-culled tiled sweep: skip tiles no lane can hit
    def make_boxes(tile_sz):
        sp = np.asarray(scene_pack)[:n_tris]
        p0 = sp[:, 0:3]
        corners = np.stack([p0, p0 + sp[:, 3:6], p0 + sp[:, 6:9]], 1)
        t_pad2 = -(-n_tris // tile_sz) * tile_sz
        lo = np.full((t_pad2, 3), 1e30, np.float32)
        hi = np.full((t_pad2, 3), -1e30, np.float32)
        lo[:n_tris] = corners.min(1)
        hi[:n_tris] = corners.max(1)
        nt = t_pad2 // tile_sz
        boxes = np.zeros((max(nt, 8), 8), np.float32)
        boxes[:nt, 0:3] = lo.reshape(nt, tile_sz, 3).min(1)
        boxes[:nt, 3:6] = hi.reshape(nt, tile_sz, 3).max(1)
        boxes[nt:, 0:3] = 1e30  # empty pad tiles: slab test always misses
        boxes[nt:, 3:6] = -1e30
        return jnp.asarray(boxes), t_pad2, nt

    def aabb_kernel(tile_sz, t_pad2, nt, refs):
        gat_r, box_r = refs[0], refs[1]
        oxr, oyr, ozr, dxr, dyr, dzr = refs[2:8]
        t_o, u_o, a_o = refs[8:11]
        scr_t, scr_u, scr_a = refs[11:14]
        ones = jnp.ones((1, LANES), f32)
        zeros = jnp.zeros((1, LANES), f32)
        big_i = jnp.int32(1 << 30)

        def td(x, y):
            return jax.lax.dot_general(
                x, y, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=f32)

        def tcomp(x, y):
            xh = x.astype(jnp.bfloat16).astype(f32)
            yh = y.astype(jnp.bfloat16).astype(f32)
            return td(xh, yh) + td(xh, y - yh) + td(x - xh, yh)

        def group(g, _):
            sl = pl.ds(g, 1)
            o = (oxr[sl, :], oyr[sl, :], ozr[sl, :])
            d = (dxr[sl, :], dyr[sl, :], dzr[sl, :])
            o_aug = jnp.concatenate([*o, ones], axis=0)
            d_aug = jnp.concatenate([*d, zeros], axis=0)
            inv = tuple(1.0 / jnp.where(c == 0, 1e-20, c) for c in d)

            def tile_body(ti, carry):
                t0 = tuple((box_r[ti, k] - o[k]) * inv[k] for k in range(3))
                t1 = tuple((box_r[ti, 3 + k] - o[k]) * inv[k] for k in range(3))
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0[0], t1[0]),
                                jnp.minimum(t0[1], t1[1])),
                    jnp.maximum(jnp.minimum(t0[2], t1[2]), 0.0),
                )
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0[0], t1[0]),
                                jnp.maximum(t0[1], t1[1])),
                    jnp.maximum(t0[2], t1[2]),
                )
                need = jnp.any(tmin <= tmax)

                def sweep(c):
                    best_t, best_i = c
                    ts = pl.ds(ti * tile_sz, tile_sz)
                    bu3, bv3, bw3 = gat_r[0:4, ts], gat_r[4:8, ts], gat_r[8:12, ts]
                    ou, du = tcomp(bu3, o_aug), tcomp(bu3, d_aug)
                    ov, dv = tcomp(bv3, o_aug), tcomp(bv3, d_aug)
                    ow, dw = tcomp(bw3, o_aug), tcomp(bw3, d_aug)
                    tq = -ow / dw
                    u = ou + tq * du
                    v = ov + tq * dv
                    ok = ((u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                          & (u + v <= 1.0) & (tq > 0.0))
                    tm = jnp.where(ok, tq, 1e30)
                    t_tile = jnp.min(tm, axis=0, keepdims=True)
                    idx = jax.lax.broadcasted_iota(
                        jnp.int32, (tile_sz, LANES), 0) + ti * tile_sz
                    cand = jnp.where(ok & (tm == t_tile), idx, big_i)
                    i_tile = jnp.min(cand, axis=0, keepdims=True)
                    better = t_tile < best_t
                    return (jnp.where(better, t_tile, best_t),
                            jnp.where(better, i_tile, best_i))

                return jax.lax.cond(need, sweep, lambda c: c, carry)

            best_t, best_i = jax.lax.fori_loop(
                0, nt, tile_body,
                (jnp.full((1, LANES), 1e30, f32),
                 jnp.full((1, LANES), big_i, jnp.int32)),
            )
            scr_t[sl, :] = best_t
            scr_u[sl, :] = best_i.astype(f32)
            scr_a[sl, :] = zeros
            return 0

        jax.lax.fori_loop(0, BR, group, 0)
        t_o[:] = scr_t[:]
        u_o[:] = scr_u[:]
        a_o[:] = scr_a[:]

    def run_aabb(tile_sz):
        boxes, t_pad2, nt = make_boxes(tile_sz)
        # rebuild gat at this tile padding
        sp = jnp.asarray(scene_pack)
        import zdr_tpu.integrators.pallas_bounce as pb2
        old = pb2.MXU_TILE
        pb2.MXU_TILE = tile_sz
        try:
            gat2 = pb2.build_woop_pack(sp)[0]
        finally:
            pb2.MXU_TILE = old
        return pl.pallas_call(
            lambda *refs, t=tile_sz, tp=t_pad2, n=nt: aabb_kernel(t, tp, n, refs),
            grid=grid,
            in_specs=[const_spec(gat2.shape), const_spec(boxes.shape)]
            + [ray_spec()] * 6,
            out_specs=[ray_spec()] * 3,
            out_shape=out3,
            scratch_shapes=[pltpu.VMEM((BR, LANES), f32)] * 3,
        )(gat2, boxes, *rays)

    # ---------------- sweep in-kernel, attribute gather in XLA glue
    attr_tbl = scene_pack[:, 9:31]  # (T_pad, 22)

    def run_sweep_glue():
        t, i_f, a = run_mxu("sweep")
        prim = jnp.clip(i_f.astype(jnp.int32), 0, n_tris - 1)
        at = attr_tbl[prim]  # (rows, LANES, 22) XLA gather
        return (t + at.sum(-1), i_f, a)

    print(f"tris={n_tris} tile={tile} n_tiles={n_tiles}", flush=True)
    for name, fn in [
        ("fori-full ", lambda: run_fori("fori")),
        ("fori-mt   ", lambda: run_fori("none")),
        ("hybrid    ", run_hybrid),
        ("mxu-full  ", lambda: run_mxu("full")),
        ("mxu-sweep ", lambda: run_mxu("sweep")),
        ("mxu-defaul", lambda: run_mxu("default")),
        ("mxu-comp  ", lambda: run_mxu("comp")),
        ("mxu-tcomp ", lambda: run_mxu("tcomp")),
        ("mxu-od    ", lambda: run_mxu("od")),
        ("mxu-recip ", lambda: run_mxu("recip")),
        ("sweep+glue", run_sweep_glue),
        ("aabb-128  ", lambda: run_aabb(128)),
        ("aabb-256  ", lambda: run_aabb(256)),
        ("aabb-512  ", lambda: run_aabb(512)),
    ]:
        try:
            t = inloop(fn)
            print(f"{name}: {t*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
