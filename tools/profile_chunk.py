"""Row-chunked MXU sweep experiment (refproto k1 lever).

The production _mxu_trace_kernel processes ONE (1, 128) ray row per fori
step: every per-tile dot is (4, tile) x (4, 256) — small enough that MXU
issue latency, not MACs, dominates (~4.9 us/row measured vs ~0.4 us MAC
floor). This tool measures the identical sweep+gather+MT pipeline with C
rows concatenated along lanes per step ((4, 2*C*128) rhs): same math, same
production helpers (_mxu_sweep_row / _mxu_gather_rows / _mt_rederive),
C x fewer MXU issues. AABB tile culling coarsens to per-C-rows (primaries
are coherent, so little is lost).

Usage: python -u tools/profile_chunk.py
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

    LANES = pb.LANES
    BR = pb.BLOCK_ROWS
    f32 = jnp.float32

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
    gat_t, box_t, t_pad, tile = pb.build_woop_pack(scene_pack)
    gat_t = jnp.asarray(gat_t)
    box_t = jnp.asarray(box_t)
    n_tiles = t_pad // tile

    res = (512, 512)
    coords = _pixel_grid(res)
    rows = pb.planes_rows(coords.shape[0])
    pxp = pb.pad_to_planes(coords[:, 0], rows)
    pyp = pb.pad_to_planes(coords[:, 1], rows)
    smp, o, d = start_sample_planes(
        "lcg", pxp, pyp, scene.camera, jnp.asarray(1, jnp.int32),
        jnp.zeros((rows, LANES), jnp.int32), 16, res, True,
    )
    rays = [jax.block_until_ready(x) for x in (*o, *d)]
    grid = (rows // BR,)

    def ray_spec():
        return pl.BlockSpec((BR, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out3 = [jax.ShapeDtypeStruct((rows, LANES), f32)] * 3

    def chunk_kernel(C, refs):
        gat_r, box_r = refs[0], refs[1]
        oxr, oyr, ozr, dxr, dyr, dzr = refs[2:8]
        t_o, u_o, a_o = refs[8:11]
        scr_t, scr_u, scr_a = refs[11:14]
        onesC = jnp.ones((1, C * LANES), f32)
        zerosC = jnp.zeros((1, C * LANES), f32)

        def cat_rows(r, g):
            if C == 1:
                return r[pl.ds(g, 1), :]
            return jnp.concatenate(
                [r[pl.ds(g * C + j, 1), :] for j in range(C)], axis=1
            )

        def group(g, _):
            o_aug = jnp.concatenate(
                [cat_rows(oxr, g), cat_rows(oyr, g), cat_rows(ozr, g), onesC],
                axis=0,
            )
            d_aug = jnp.concatenate(
                [cat_rows(dxr, g), cat_rows(dyr, g), cat_rows(dzr, g), zerosC],
                axis=0,
            )
            miss, prim = pb._mxu_sweep_row(
                gat_r, box_r, tile, n_tiles, o_aug, d_aug, 0.0, None,
                "closest", prec="comp",
            )
            gat = pb._mxu_gather_rows(
                gat_r, pb.GAT_GATHER_LO, pb._gat_rows(), tile, n_tiles,
                prim, miss,
            )
            o3 = (o_aug[0:1], o_aug[1:2], o_aug[2:3])
            d3 = (d_aug[0:1], d_aug[1:2], d_aug[2:3])
            tw, bu, bv = pb._mt_rederive(gat, o3, d3, miss)
            tw = jnp.where(miss, 1e30, tw)
            em = jnp.sum(gat[9:16], axis=0, keepdims=True)
            for j in range(C):
                s2 = pl.ds(g * C + j, 1)
                lsl = slice(j * LANES, (j + 1) * LANES)
                scr_t[s2, :] = tw[:, lsl]
                scr_u[s2, :] = bu[:, lsl]
                scr_a[s2, :] = em[:, lsl]
            return 0

        jax.lax.fori_loop(0, BR // C, group, 0)
        t_o[:] = scr_t[:]
        u_o[:] = scr_u[:]
        a_o[:] = scr_a[:]

    def run_chunk(C):
        return pl.pallas_call(
            lambda *refs, c=C: chunk_kernel(c, refs),
            grid=grid,
            in_specs=[const_spec(gat_t.shape), const_spec(box_t.shape)]
            + [ray_spec()] * 6,
            out_specs=[ray_spec()] * 3,
            out_shape=out3,
            scratch_shapes=[pltpu.VMEM((BR, LANES), f32)] * 3,
        )(gat_t, box_t, *rays)

    import numpy as np

    # measurement-floor probe: a trivial kernel-shaped body through the
    # same inloop harness — everything below this is harness, not work
    def run_nop():
        return pl.pallas_call(
            lambda a, b, o: o.__setitem__(slice(None), a[:] + b[:]),
            grid=grid,
            in_specs=[ray_spec()] * 2,
            out_specs=ray_spec(),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), f32),
        )(rays[0], rays[1])

    t = inloop(lambda: (run_nop(),))
    print(f"floor (trivial pallas add): {t*1e3:.2f} ms", flush=True)

    def run_xla_nop():
        return rays[0] + rays[1]

    t = inloop(lambda: (run_xla_nop(),))
    print(f"floor (one XLA add): {t*1e3:.2f} ms", flush=True)

    ref = None
    for C in (1, 2, 4, 8, 16):
        try:
            t = inloop(lambda C=C: run_chunk(C))
            out = jax.block_until_ready(run_chunk(C))
            if ref is None:
                ref = [np.asarray(x) for x in out]
                ok = ""
            else:
                d0 = max(
                    float(np.abs(np.asarray(a) - b).max())
                    for a, b in zip(out, ref)
                )
                ok = f" (maxdiff vs C=1: {d0:.2e})"
            print(f"chunk C={C}: {t*1e3:.2f} ms{ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"chunk C={C}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
