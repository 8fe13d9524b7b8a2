"""Roofline / utilization accounting for the hot kernels (VERDICT r4 item 2).

For each hot stage of the two flagship workloads (path+PRB cbox 512^2 and
the reference direct protocol's 962-tri sphere), measure wall time with
reps-inside-one-jit (the only honest method through the axon tunnel) and
set it against first-principles work:

  * FLOPs executed (counted from the algorithm, not XLA cost analysis —
    the sweeps' masked lanes still execute on the VPU)
  * bytes moved between HBM and VMEM (planes in + planes out + tables)

against v5e-1 peaks. Peak numbers used (public v5e specs):
  MXU bf16:   197 TFLOP/s
  VPU f32:    ~3.9 TFLOP/s  (8x128 lanes x 4 VPUs x 2 ops(FMA) x 940 MHz
              x 2... conservatively taken as 4 ALU-op TOP/s; the table
              reports util against 4e12 ops/s)
  HBM:        819 GB/s

Prints a markdown table for BASELINE.md. Run: python tools/roofline.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

REPS = 20
VPU_OPS = 4.0e12  # f32 vector ops/s (incl. fused mul-add as 2)
MXU_FLOPS = 197e12  # bf16 FLOP/s
HBM_BPS = 819e9

ROWS = []


def timeit_l(body, *args, reps=REPS):
    def outer(*a):
        def step(i, acc):
            out = body(acc * 1e-30, *a)
            return acc + jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, step, jnp.float32(0.0))

    f = jax.jit(outer)
    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0 - 0.03) / reps


def report(stage, dt, vpu_ops=0.0, mxu_flops=0.0, hbm_bytes=0.0):
    vu = vpu_ops / dt / VPU_OPS * 100 if vpu_ops else 0.0
    mu = mxu_flops / dt / MXU_FLOPS * 100 if mxu_flops else 0.0
    hu = hbm_bytes / dt / HBM_BPS * 100 if hbm_bytes else 0.0
    ROWS.append((stage, dt * 1e3, vpu_ops / 1e6, mxu_flops / 1e6,
                 hbm_bytes / 1e6, vu, mu, hu))
    print(f"{stage:>28s}: {dt*1e3:8.3f} ms | VPU {vu:5.1f}% "
          f"MXU {mu:5.1f}% HBM {hu:5.1f}%", flush=True)


def main():
    import numpy as np

    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import (
        make_cornell_box,
        make_cornell_light,
        make_quad,
        make_uv_sphere,
    )
    from zdr_tpu.integrators import pallas_loop as plp
    from zdr_tpu.integrators.pallas_bounce import (
        LANES,
        build_fused_const,
        build_woop_pack,
        fused_trace_interact,
        read_quads_planes,
    )
    from zdr_tpu.integrators.wrapper import _pixel_grid
    from zdr_tpu.texture import pack_quads

    N = 512 * 512

    # ---------------- cbox path loop (the bench.py headline) -------------
    scene = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator="path", accel="pallas",
    )
    scene.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(-0.2, 2.6, -0.5),
        target=float3(-0.2, 2.6, -5.0),
    )
    material = jnp.full((1024, 1024, 4), 0.5, jnp.float32)
    cfg = scene._config((512, 512), 64)
    coords = _pixel_grid(cfg.res)
    data = scene._data

    (meta, scene_pack, light_pack, li, pp, packed, rows, pxp, pyp, real,
     start_idx, stop_idx, woop, _o) = plp._loop_setup(
        data, material, cfg, coords, 0)
    from zdr_tpu.integrators.path import _depths
    from zdr_tpu.samplers.pmj02bn import _build_bn_cache

    md, rr_d = _depths(cfg)
    cam_c = plp.camera_const(scene.camera)
    seed_pl = jnp.zeros((rows, LANES), jnp.int32)
    bn = _build_bn_cache(pxp, pyp, jnp.uint32(0))
    allow = jnp.ones((rows, LANES), jnp.int32)
    carry0 = plp._init_carry(cfg.sampler, rows, start_idx, stop_idx, real)
    h = w = 1024

    # texture gather: one (N, 8 or 16) f32 row gather
    uvx = jnp.asarray(np.random.RandomState(0).rand(rows, LANES), jnp.float32)
    uvy = jnp.asarray(np.random.RandomState(1).rand(rows, LANES), jnp.float32)
    dt = timeit_l(lambda p, x, y: read_quads_planes(x + p, y, packed, h, w)[0],
                  uvx, uvy)
    report("tex_gather f32 (N,16)", dt, hbm_bytes=N * (64 + 4))
    packed8 = pack_quads(material, True)
    dt = timeit_l(lambda p, x, y: read_quads_planes(x + p, y, packed8, h, w)[0],
                  uvx, uvy)
    report("tex_gather bf16 (N,8)", dt, hbm_bytes=N * (32 + 4))

    # the loop megakernel (one bounce, everything but the gather).
    # VPU op count from the kernel's algorithm at T=14 tris, L=2 light
    # tris: MT closest sweep ~75 ops/tri + attr select 22/tri + occ sweep
    # ~45/tri + GGX shade/sample ~420 + sampler draws ~1600 (7 draws of
    # pmj02bn P2: hash 20 + permute 25 + owen/sobol ~130 for 2D) + NEE
    # select ~160 + camera/restart ~160 + bookkeeping ~150
    mats = tuple(jnp.zeros((rows, LANES), jnp.float32) + 0.5 for _ in range(4))

    def loop_once(p, carry):
        carry = list(carry)
        carry[0] = carry[0] + p
        out, _ = plp._call_loop_kernel(
            cfg.sampler, cfg.spp, cfg.res, True, meta.num_tris, rr_d, md,
            h, w, meta, woop, scene_pack, light_pack, li, pp, cam_c, bn,
            pxp, pyp, seed_pl, stop_idx, allow, mats, tuple(carry), False,
        )
        return out[0]

    dt = timeit_l(loop_once, carry0)
    ops = N * (14 * (75 + 22 + 45) + 420 + 1600 + 160 + 160 + 150)
    planes = 45 + 16 + 9 + 45  # in carries+bn+misc, out carries
    report("loop kernel (cbox bounce)", dt, vpu_ops=ops,
           hbm_bytes=N * 4 * planes)

    # ---------------- MXU sweeps (direct protocol, 962-tri sphere) -------
    sph = Scene(
        [(make_uv_sphere(0.5, 16, 32), None, None),
         (make_quad(size=1.0, y=-2.0), None, 10.0)],
        integrator="direct", accel="pallas",
    )
    sp, lp2 = build_fused_const(sph._data, sph._data.fused_meta)
    woop2 = build_woop_pack(sp)
    t_pad, tile = woop2[2], woop2[3]
    o = jnp.zeros((rows, LANES), jnp.float32)
    rng = np.random.RandomState(2)
    d3 = jnp.asarray(rng.rand(3, rows, LANES), jnp.float32) * 2 - 1
    big = jnp.full((rows, LANES), 1e30, jnp.float32)
    act = jnp.ones((rows, LANES), jnp.int32)

    def k1(p, dx):
        return fused_trace_interact(
            sp, sph._data.fused_meta.num_tris,
            (o, o + 3.0, o, dx + p, d3[1], d3[2], big, act),
            woop=woop2,
        )[0]

    dt = timeit_l(k1, d3[0])
    # comp sweep MXU work: per (row, tile) visit, 3 dot-sets x 3 comp
    # passes, each (4, tile) x (4, 2*LANES) = 2*4*tile*2*LANES flops.
    # Culling fraction measured separately; assume worst case (all tiles).
    n_tiles = t_pad // tile
    n_rows = N // LANES
    mxu = n_rows * n_tiles * 3 * 3 * (2 * 4 * tile * 2 * LANES)
    # VPU epilogue: ~15 ops per (tile, LANES) pair per visit + argmin keying
    vpu = n_rows * n_tiles * tile * LANES * 25
    report(f"k1 MXU closest ({t_pad} tris, all tiles)", dt, vpu_ops=vpu,
           mxu_flops=mxu, hbm_bytes=N * 4 * (8 + 16))

    print("\n| stage | ms | VPU % | MXU % | HBM % |")
    print("|---|---|---|---|---|")
    for (s, ms, _v, _m, _h, vu, mu, hu) in ROWS:
        print(f"| {s} | {ms:.3f} | {vu:.1f} | {mu:.1f} | {hu:.1f} |")


if __name__ == "__main__":
    main()
