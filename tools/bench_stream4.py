"""Round-4 big-mesh measurement batch (VERDICT r3 item 1 done-criteria).

Measures, sync-correctly (reps inside one jitted fori_loop; a device->host
readback switches the axon tunnel into ~25 ms-per-dispatch sync mode, so
naive per-call timing overstates costs by that constant):

  1. streamed closest / any sweeps at 50,880 tris (the round-3 protocol)
  2. render-level collocated / direct fwd (+ direct fwd+bwd iteration)
     on the 50,880-tri sphere
  3. a 262,144-tri sphere render (worklist path, multi-chunk)

Usage: python -u tools/bench_stream4.py [--skip-262k]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).sum())


def inloop(fn, reps=4):
    @jax.jit
    def run():
        def body(i, acc):
            out = fn()
            return acc + jnp.asarray(out, jnp.float32).reshape(-1)[0]

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))

    sync(run())
    t0 = time.time()
    sync(run())
    return (time.time() - t0) / reps


def timed(label, fn, n_rays, reps=4):
    t = inloop(fn, reps=reps)
    print(f"{label:>42s}: {t*1e3:9.2f} ms ({n_rays/t/1e6:7.2f} Mrays/s)",
          flush=True)
    return t


def wall(label, fn, n_rays):
    out = fn()
    sync(jax.tree.leaves(out)[0])
    t0 = time.time()
    out = fn()
    sync(jax.tree.leaves(out)[0])
    t = time.time() - t0
    print(f"{label:>42s}: {t*1e3:9.2f} ms ({n_rays/t/1e6:7.2f} Mrays/s)"
          " [wall, incl dispatch]", flush=True)
    return t


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere
    from zdr_tpu.integrators import pallas_stream as ps
    from zdr_tpu.integrators.pallas_bounce import (
        LANES, build_fused_const, pad_to_planes, planes_rows,
        spatial_lane_perm,
    )
    from zdr_tpu.integrators.wrapper import _pixel_grid, _primary_rays
    from zdr_tpu.samplers import make_sampler

    cam = Camera(fov=0.8, origin=float3(1.5, 0.2, 0.0), target=float3(0, 0, 0))

    # ---- component sweeps at 50,880 tris
    mesh = make_uv_sphere(0.5, n_lat=160, n_lon=160)
    scene = Scene(
        [(mesh, None, None), (make_quad(size=1.0, y=-2.0), None, 40.0)],
        integrator="path", accel="bvh",
    )
    scene.camera = cam
    data = scene._data
    scene_pack, _ = build_fused_const(data, data.fused_meta)
    pack = ps.build_stream_pack(scene_pack)
    print(f"pack: tris={data.fused_meta.num_tris} t_pad={pack[2]} "
          f"tile={pack[3]} chunk={pack[4]}", flush=True)
    coords = _pixel_grid((512, 512))
    perm, _inv = spatial_lane_perm(coords)
    coords = coords[perm]
    smp = make_sampler("lcg", coords, 0, 1, 0)
    o, d, smp = _primary_rays(coords, cam, smp, (512, 512), True)
    n = o.shape[0]
    rows = planes_rows(n)
    op = tuple(pad_to_planes(o[:, k], rows) for k in range(3))
    dp = tuple(pad_to_planes(d[:, k], rows) for k in range(3))
    act = pad_to_planes(jnp.ones((n,), jnp.int32), rows)
    thi = jnp.full((rows, LANES), 3.0, jnp.float32)
    timed("closest sweep 50,880 tris 262k rays",
          lambda: ps.stream_closest(pack, (*op, *dp, act))[1], n)
    timed("any sweep 50,880 tris 262k rays",
          lambda: ps.stream_any(pack, (*op, *dp, thi, act)), n)
    timed("plan only",
          lambda: ps._plan_sweep(pack[1], pack[3], pack[4], op, dp, act)[3],
          n)

    # ---- render-level, 50,880 tris (round-3 protocol: 512^2 spp4)
    mat = jnp.full((256, 256, 4), 0.5, jnp.float32)
    for integ in ("collocated", "direct"):
        # collocated-fused currently requires a light-free scene
        quad_em = None if integ == "collocated" else 40.0
        s = Scene(
            [(mesh, None, None), (make_quad(size=1.0, y=-2.0), None, quad_em)],
            integrator=integ, accel="bvh",
        )
        s.camera = cam
        s.fused = "force"
        rays = n * 4  # primary rays per render (spp4)
        wall(f"{integ} 512^2 spp4 fwd (50,880 tris)",
             lambda s=s: s.render(mat, res=(512, 512), spp=4, seed=1), rays)
        if integ == "direct":
            def fwdbwd(s=s):
                return jax.grad(
                    lambda m: jnp.sum(
                        s.render(m, res=(512, 512), spp=4, seed=1)[..., :3]
                    )
                )(mat)
            wall("direct 512^2 spp4 fwd+bwd (50,880 tris)", fwdbwd, rays)

    if "--skip-262k" in sys.argv:
        return

    # ---- 262k-tri scene (multi-chunk worklist path)
    big = make_uv_sphere(0.5, n_lat=363, n_lon=363)
    s = Scene(
        [(big, None, None), (make_quad(size=1.0, y=-2.0), None, 40.0)],
        integrator="direct", accel="bvh",
    )
    s.camera = cam
    s.fused = "force"
    print(f"big mesh tris: {s._data.fused_meta.num_tris}", flush=True)
    wall("direct 512^2 spp1 fwd (262k tris)",
         lambda: s.render(mat, res=(512, 512), spp=1, seed=1), n)
    wall("collocated-equiv closest sweep (262k tris)",
         lambda: _sweep262(s, op, dp, act), n)


def _sweep262(s, op, dp, act):
    from zdr_tpu.integrators import pallas_stream as ps
    from zdr_tpu.integrators.pallas_bounce import build_fused_const

    scene_pack, _ = build_fused_const(s._data, s._data.fused_meta)
    pack = ps.build_stream_pack(scene_pack)
    return ps.stream_closest(pack, (*op, *dp, act))[1]


if __name__ == "__main__":
    main()
