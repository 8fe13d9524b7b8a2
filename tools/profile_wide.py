"""Wide-lane MXU sweep: amortize per-call matmul/loop overhead.

The production kernel-1 sweeps ONE 128-lane ray row at a time, so each
tile costs three (tile, 4) x (4, 256) comp dots — K=4 underuses the MXU
and the per-dot issue overhead dominates (measured ~4% MXU utilization).
Merging G consecutive rows into one sweep widens the rhs to (4, G*256):
same flops, 1/G the matmul calls and loop iterations. AABB culling
coarsens to G*128-ray granularity (still ~2 scanlines at G=8, 512 wide).

Variants: closest-hit sweep + one-hot gather + MT re-derive (the full
kernel-1 MXU pipeline) at G in {1, 2, 4, 8}; 'any' occlusion sweep at
the same widths.

Usage: python -u tools/profile_wide.py [G ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

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
    scene_pack, _ = pb.build_fused_const(data, meta)
    scene_pack = jax.block_until_ready(jnp.asarray(scene_pack))

    def pack_at(tile_sz):
        gat_t, box_t, t_pad, tile = pb.build_woop_pack(scene_pack, tile=tile_sz)
        return jnp.asarray(gat_t), jnp.asarray(box_t), t_pad, tile

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
    LANES = 128  # G is counted in 128-lane base rows (pb.LANES may differ)
    BLOCK_RAYS = 16384
    f32 = jnp.float32
    print(f"tris={meta.num_tris} rows={rows}", flush=True)

    def kernel(tile, n_tiles, mode, refs):
        gat_r, box_r = refs[0], refs[1]
        oxr, oyr, ozr, dxr, dyr, dzr = refs[2:8]
        outs = refs[8:]
        lanes = oxr.shape[1]
        ones = jnp.ones((1, lanes), f32)
        zeros = jnp.zeros((1, lanes), f32)

        def group(g, _):
            sl = pl.ds(g, 1)
            o3 = (oxr[sl, :], oyr[sl, :], ozr[sl, :])
            d3 = (dxr[sl, :], dyr[sl, :], dzr[sl, :])
            o_aug = jnp.concatenate([*o3, ones], axis=0)
            d_aug = jnp.concatenate([*d3, zeros], axis=0)
            if mode == "any":
                occ = pb._mxu_sweep_row(
                    gat_r, box_r, tile, n_tiles, o_aug, d_aug, 1e-3,
                    jnp.full((1, lanes), 0.7, f32), "any", prec="comp",
                )
                outs[0][sl, :] = occ.astype(f32)
                outs[1][sl, :] = zeros
                outs[2][sl, :] = zeros
                return 0
            miss, prim = pb._mxu_sweep_row(
                gat_r, box_r, tile, n_tiles, o_aug, d_aug, 0.0, None,
                "closest", prec="comp",
            )
            if mode == "sweep":
                outs[0][sl, :] = jnp.where(miss, 0.0, 1.0)
                outs[1][sl, :] = prim.astype(f32)
                outs[2][sl, :] = zeros
                return 0
            gat = pb._mxu_gather_rows(
                gat_r, pb.GAT_GATHER_LO, pb._gat_rows(), tile, n_tiles,
                prim, miss,
            )
            t_win, bu, bv = pb._mt_rederive(gat, o3, d3, miss)
            outs[0][sl, :] = jnp.where(miss, 1e30, t_win)
            outs[1][sl, :] = bu
            outs[2][sl, :] = bv
            return 0

        jax.lax.fori_loop(0, oxr.shape[0], group, 0)

    def run(g_rows, tile_sz, mode):
        gat_t, box_t, t_pad, tile = pack_at(tile_sz)
        n_tiles = t_pad // tile
        lanes = g_rows * LANES
        br = BLOCK_RAYS // lanes
        r6 = [x.reshape(-1, lanes) for x in rays]
        rws = r6[0].shape[0]
        spec = pl.BlockSpec((br, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        cspec = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        out3 = [jax.ShapeDtypeStruct((rws, lanes), f32)] * 3
        return pl.pallas_call(
            lambda *refs, t=tile, n=n_tiles, m=mode: kernel(t, n, m, refs),
            grid=(rws // br,),
            in_specs=[cspec(gat_t.shape), cspec(box_t.shape)] + [spec] * 6,
            out_specs=[spec] * 3,
            out_shape=out3,
        )(gat_t, box_t, *r6)

    if "incoherent" in sys.argv[1:]:
        # bounce-like rays: origins near the sphere surface, random unit
        # dirs — the k1b / merged-k2g sweep workload (AABB culls rarely
        # help; coarser tiles may win back their amortization)
        import numpy as np

        rs = np.random.RandomState(0)
        n = rows * LANES
        op = rs.randn(n, 3).astype(np.float32)
        op *= 0.55 / np.linalg.norm(op, axis=1, keepdims=True)
        dp = rs.randn(n, 3).astype(np.float32)
        dp /= np.linalg.norm(dp, axis=1, keepdims=True)
        rays = tuple(
            jax.block_until_ready(jnp.asarray(a[:, k].reshape(rows, LANES)))
            for a in (op, dp) for k in range(3)
        )
        print("rays: incoherent (random origins on sphere, random dirs)",
              flush=True)

    cases = []
    for tile_sz in (128, 256, 512):
        for g in (1, 4):
            cases.append((g, tile_sz))
    ref = None
    for mode in ("closest", "sweep", "any"):
        for g, tile_sz in cases:
            try:
                t = inloop(lambda g=g, ts=tile_sz, m=mode: run(g, ts, m))
                line = f"{mode:7s} G={g} tile={tile_sz}: {t*1e3:7.2f} ms"
                if mode == "closest":
                    out = jax.block_until_ready(run(g, tile_sz, mode))
                    chk = float(jnp.sum(jnp.where(out[0] < 1e29, out[0], 0.0)))
                    if ref is None:
                        ref = chk
                    line += f"  (t-sum {chk:.1f} vs first {ref:.1f})"
                print(line, flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{mode:7s} G={g} tile={tile_sz}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
