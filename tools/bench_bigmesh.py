"""Big-mesh BVH traversal benchmark (VERDICT round-1 item 3 protocol).

66k-triangle UV sphere, 262,144 primary rays: times the plain stackless
traversal (default in render graphs), the stream-compacted 2-tier variant
(Accel.traversal "auto"), and the HBM-streamed MXU sweep (the round-3+
big-mesh path). The 4-width "tiered4" switch was retired in round 4
(compile-prohibitive inside render graphs; superseded by the streamed
sweep).

Usage: python -u tools/bench_bigmesh.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.accel import trace_any, trace_closest
    from zdr_tpu.geometry.procedural import make_uv_sphere
    from zdr_tpu.integrators.wrapper import _pixel_grid, _primary_rays
    from zdr_tpu.samplers import make_sampler

    mesh = make_uv_sphere(0.5, n_lat=160, n_lon=160)
    scene = Scene([(mesh, None, None)], integrator="collocated", accel="bvh")
    scene.camera = Camera(fov=0.8, origin=float3(1.5, 0.2, 0.0), target=float3(0, 0, 0))
    data = scene._data
    print(f"tris: {data.accel.num_triangles} nodes: {data.accel.node_packed.shape[0]}", flush=True)
    coords = _pixel_grid((512, 512))
    smp = make_sampler("lcg", coords, 0, 1, 0)
    o, d, smp = _primary_rays(coords, scene.camera, smp, (512, 512), True)
    o = jax.block_until_ready(o)
    n = o.shape[0]

    def timeit(name, fn, *a, iters=3):
        out = fn(*a)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:>22s}: {dt*1e3:8.1f} ms  ({n/dt/1e6:5.2f} Mrays/s)", flush=True)

    import dataclasses
    for kind in ("stackless", "auto"):
        acc = dataclasses.replace(data.accel, traversal=kind)
        timeit(f"closest ({kind})", jax.jit(lambda o, d, a=acc: trace_closest(a, o, d).t), o, d)
        timeit(f"any ({kind})", jax.jit(lambda o, d, a=acc: trace_any(a, o, d, t_min=1e-4, t_max=3.0)), o, d)

    # HBM-streamed MXU sweep (pallas_stream): the round-3 big-mesh path
    from zdr_tpu.geometry.procedural import make_quad
    from zdr_tpu.integrators import pallas_stream as ps
    from zdr_tpu.integrators.pallas_bounce import (
        LANES, build_fused_const, pad_to_planes, planes_rows,
    )

    lscene = Scene(
        [(mesh, None, None), (make_quad(size=1.0, y=-2.0), None, 40.0)],
        integrator="path",
        accel="bvh",
    )
    lscene.camera = scene.camera
    meta = lscene._data.fused_meta
    scene_pack, _ = build_fused_const(lscene._data, meta)
    pack = ps.build_stream_pack(scene_pack)
    print(f"stream pack: t_pad={pack[2]} tile={pack[3]} chunk={pack[4]}",
          flush=True)
    rows = planes_rows(n)
    op = tuple(pad_to_planes(o[:, k], rows) for k in range(3))
    dp = tuple(pad_to_planes(d[:, k], rows) for k in range(3))
    act = pad_to_planes(jnp.ones((n,), jnp.int32), rows)
    thi = jnp.full((rows, LANES), 3.0, jnp.float32)
    timeit("closest (streamed)",
           jax.jit(lambda *r: ps.stream_closest(pack, r)[1]), *op, *dp, act)
    timeit("any (streamed)",
           jax.jit(lambda *r: ps.stream_any(pack, r)), *op, *dp, thi, act)

    # render-level: unfused BVH vs unfused stream-accel vs streamed-fused
    mat = jnp.full((256, 256, 4), 0.5, jnp.float32)

    sscene = Scene(
        [(mesh, None, None), (make_quad(size=1.0, y=-2.0), None, 40.0)],
        integrator="path",
        accel="stream",
    )
    sscene.camera = scene.camera

    def render(scn):
        return scn.render(mat, res=(256, 256), spp=4, seed=1)

    def grad(scn):
        return jax.grad(
            lambda m: jnp.sum(
                scn.render(m, res=(256, 256), spp=4, seed=1)[..., :3]
            )
        )(mat)

    for scn, fmode, tag in (
        (lscene, "off", "unfused/bvh"),
        (sscene, "off", "unfused/stream-accel"),
        (sscene, "force", "streamed-fused"),
    ):
        scn.fused = fmode
        try:
            timeit(f"render 256^2x4 ({tag})", lambda: render(scn), iters=2)
            timeit(f"grad   256^2x4 ({tag})", lambda: grad(scn), iters=2)
        except Exception as e:
            print(f"{tag} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
