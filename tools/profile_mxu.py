"""MXU (Woop) dense sweep vs the per-triangle fori sweep on TPU.

Times kernel 1 (trace+interact) and kernel 2 (shadow+shade) on the
reference-protocol scene (960-tri sphere + quad light, 512^2 rays), both
sweep implementations, in-loop per the measured cost model. Then times a
full fused direct iteration (the tools/bench_reference.py workload) with
each sweep.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


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
    import zdr_tpu.integrators.wrapper as wrapper
    import zdr_tpu.integrators.path_fused as pf
    import zdr_tpu.integrators.direct_fused as df

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
    print("tris:", meta.num_tris, flush=True)
    scene_pack, light_pack = pb.build_fused_const(data, meta)
    scene_pack = jax.block_until_ready(jnp.asarray(scene_pack))
    woop = pb.build_woop_pack(scene_pack)
    woop = tuple(jax.block_until_ready(jnp.asarray(w)) if hasattr(w, "shape") else w for w in woop)
    print("woop tiles:", woop[2] // woop[3], "tile:", woop[3], flush=True)

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
    big = jnp.full((rows, pb.LANES), 1e30, jnp.float32)
    act = jnp.ones((rows, pb.LANES), jnp.int32)
    rays = (*o, *d, big, act)
    rays = tuple(jax.block_until_ready(r) for r in rays)

    t_old = inloop(lambda: pb.fused_trace_interact(scene_pack, meta.num_tris, rays))
    print(f"k1 fori sweep:  {t_old*1e3:.2f} ms / 262k rays", flush=True)
    t_new = inloop(lambda: pb.fused_trace_interact(scene_pack, meta.num_tris, rays, woop=woop))
    print(f"k1 MXU sweep:   {t_new*1e3:.2f} ms  ({t_old/t_new:.2f}x)", flush=True)

    # correctness spot check
    a = pb.fused_trace_interact(scene_pack, meta.num_tris, rays)
    b = pb.fused_trace_interact(scene_pack, meta.num_tris, rays, woop=woop)
    for i, (x, y) in enumerate(zip(a, b)):
        dd = float(jnp.abs(jnp.asarray(x, jnp.float32) - jnp.asarray(y, jnp.float32)).max())
        if dd > 1e-3:
            print(f"  out[{i}] maxdiff {dd:.2e}", flush=True)
    print("k1 outputs compared", flush=True)

    # full direct iteration through the public API
    mat = jnp.full((1024, 1024, 4), 0.5, jnp.float32)
    scene.max_spp_per_call = 16

    def loss(m, seed):
        return jnp.sum(scene.render(m, res=res, spp=16, seed=seed)[..., :3])

    for label, mxu_min in (("MXU", 256), ("fori", 10**9)):
        pf.MXU_MIN_TRIS = mxu_min
        df.MXU_MIN_TRIS = mxu_min
        wrapper.build_render.cache_clear()
        jax.clear_caches()
        img = scene.render(mat, res=res, spp=16, seed=0)
        sync(img)
        t0 = time.time()
        sync(scene.render(mat, res=res, spp=16, seed=1))
        t_fwd = time.time() - t0
        step = jax.value_and_grad(loss)
        l, g = step(mat, jnp.asarray(0, jnp.int32))
        sync(g)
        t0 = time.time()
        l, g = step(mat, jnp.asarray(1, jnp.int32))
        sync(g)
        t_it = time.time() - t0
        print(
            f"direct window 512^2x16spp [{label}]: fwd {t_fwd:.3f}s  "
            f"fwd+bwd {t_it:.3f}s  (256spp iter ~ {t_it*16:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
