"""Per-stage breakdown of one fused-direct sample pass at the reference
protocol size (512^2, 962-tri sphere + quad light).

Times each piece in-loop (tunnel overhead swamps standalone timings):
  k1        primary trace+interact (closest sweep + gather)
  glue      NEE light sample + bounce draws (XLA between kernels)
  k2f       forward shade (shadow sweep + GGX + bounce sample) + occ out
  k1b       bounce emitter-lookup trace (incoherent directions)
  k2g       gradient shade (occ passthrough, no sweep)
  sample    the full _one_sample fwd+grad composite
  flush     one splat flush (segment_scatter_add4 at this lane count)

Usage: python -u tools/profile_direct_window.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def inloop(fn, *args, reps=8):
    # Thread the accumulator into the first argument so XLA's loop-invariant
    # code motion can't hoist fn out of the timing loop.
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


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere
    import zdr_tpu.integrators.direct_fused as df
    import zdr_tpu.integrators.pallas_bounce as pb
    from zdr_tpu.integrators.fused_glue import (
        bounce_draws, sample_light_planes, start_sample_planes,
    )
    from zdr_tpu.integrators.pallas_bounce import read_quads_planes
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
    cfg = scene._config((512, 512), 16)
    material = jnp.full((1024, 1024, 4), 0.5, jnp.float32)
    coords = _pixel_grid((512, 512))
    setup = df._setup(data, material, cfg, coords)
    (meta, scene_pack, tables, env_hw, packed, rows, pxp, pyp, real,
     woop, _stream, _order) = setup
    h = w = 1024
    seed = jnp.asarray(1, jnp.int32)
    L = pb.LANES

    sidx = jnp.zeros((rows, L), jnp.int32)
    smp, o, d = start_sample_planes(
        cfg.sampler, pxp, pyp, scene.camera, seed, sidx, cfg.spp, cfg.res,
        cfg.use_tent_filter,
    )
    big = jnp.full((rows, L), 1e30, jnp.float32)

    def k1(*rays):
        return df.fused_trace_interact(
            scene_pack, meta.num_tris, rays, woop=woop
        )

    t_k1 = inloop(k1, *o, *d, big, real)
    print(f"k1: {t_k1*1e3:.2f} ms", flush=True)
    k1o = jax.block_until_ready(jax.jit(k1)(*o, *d, big, real))
    (px, py, pz, ux, uy, nsx, nsy, nsz, ngx, ngy, ngz,
     shade, aer, aeg, aeb, miss_i) = k1o

    def glue(px, py, pz, shade):
        nee, smp2 = sample_light_planes(meta, tables, env_hw, (px, py, pz), smp)
        draws, _ = bounce_draws(smp2, want_rr=False)
        mat_p = read_quads_planes(ux, uy, packed, h, w)
        return (*nee[0], nee[1], nee[2], *nee[3], *draws, *mat_p)

    t_glue = inloop(glue, px, py, pz, shade)
    print(f"glue: {t_glue*1e3:.2f} ms", flush=True)

    # glue sub-stages (what to attack): material gather vs NEE vs draws.
    # Three extra compiles — opt-in via GLUE_SPLIT=1 to keep the default
    # run inside the tunnel's time budget.
    import os
    _glue_split = os.environ.get("GLUE_SPLIT", "0") == "1"

    def glue_tex(ux, uy):
        return read_quads_planes(ux, uy, packed, h, w)

    def glue_nee(px, py, pz):
        nee, _ = sample_light_planes(meta, tables, env_hw, (px, py, pz), smp)
        return (*nee[0], nee[1], nee[2], *nee[3])

    def glue_draws(px):
        smp2 = smp
        d1, smp2 = smp2.next1()
        d2, smp2 = smp2.next1()
        (a, b), smp2 = smp2._next2_xy()
        dr, _ = bounce_draws(smp2, want_rr=False)
        return (d1 + px * 0, d2, a, b, *dr)

    if _glue_split:
        t_gt = inloop(glue_tex, ux, uy)
        t_gn = inloop(glue_nee, px, py, pz)
        t_gd = inloop(glue_draws, px)
        print(f"  glue.tex_gather: {t_gt*1e3:.2f} ms", flush=True)
        print(f"  glue.nee_select: {t_gn*1e3:.2f} ms", flush=True)
        print(f"  glue.draws(7):   {t_gd*1e3:.2f} ms", flush=True)

    nee, smp2 = sample_light_planes(meta, tables, env_hw, (px, py, pz), smp)
    (wi_l, l_dist, l_pdf, l_ev) = nee
    draws, _ = bounce_draws(smp2, want_rr=False)
    mat_p = read_quads_planes(ux, uy, packed, h, w)
    onesf = jnp.ones((rows, L), jnp.float32)
    zeros_i = jnp.zeros((rows, L), jnp.int32)
    ray_planes = (
        px, py, pz, nsx, nsy, nsz, ngx, ngy, ngz, *d, shade,
        *mat_p, onesf, onesf, onesf, zeros_i, aer, aeg, aeb,
    )
    nee_planes = (*wi_l, l_dist, l_pdf, *l_ev)

    def k2f(*planes):
        rp, np_, dp = planes[:24], planes[24:32], planes[32:36]
        return df.fused_shade(
            scene_pack, meta.num_tris, rp, np_, dp, 2, 16, h, w,
            woop=woop, want_occ=True,
        )

    t_k2f = inloop(k2f, *ray_planes, *nee_planes, *draws)
    print(f"k2f: {t_k2f*1e3:.2f} ms", flush=True)
    k2o = jax.block_until_ready(jax.jit(k2f)(*ray_planes, *nee_planes, *draws))
    (radr, radg, radb, bnr, bng, bnb, pdfb,
     nox, noy, noz, ndx, ndy, ndz, alive_i) = k2o[:14]
    occ = k2o[14]

    t_k1b = inloop(k1, nox, noy, noz, ndx, ndy, ndz, pdfb, alive_i)
    print(f"k1b: {t_k1b*1e3:.2f} ms", flush=True)

    u_splat = jnp.zeros((rows, L), jnp.float32) + 0.5

    def k2g(*planes):
        rp, np_, dp = planes[:24], planes[24:32], planes[32:36]
        occ_p = planes[36]
        return df.fused_shade(
            scene_pack, meta.num_tris, rp, np_, dp, 2, 16, h, w,
            grad_planes=(real, radr, radg, radb, onesf, onesf, onesf,
                         ux, uy, u_splat),
            woop=woop, occ_in=occ_p,
        )

    t_k2g = inloop(k2g, *ray_planes, *nee_planes, *draws, occ)
    print(f"k2g: {t_k2g*1e3:.2f} ms", flush=True)

    # merged production kernels (bounce_emit=True: shadow + bounce sweeps
    # + shading in one kernel). Two extra compiles — opt-in via
    # MERGED_SPLIT=1 (the `sample:` row below already times the merged
    # production sample end to end).
    if os.environ.get("MERGED_SPLIT", "0") == "1":
        def k2m(*planes):
            rp, np_, dp = planes[:24], planes[24:32], planes[32:36]
            return df.fused_shade(
                scene_pack, meta.num_tris, rp, np_, dp, 2, 16, h, w,
                woop=woop, bounce_emit=True,
            )

        t_k2m = inloop(k2m, *ray_planes, *nee_planes, *draws)
        print(f"k2m (merged fwd): {t_k2m*1e3:.2f} ms", flush=True)

        zf = jnp.zeros((rows, L), jnp.float32)

        def k2mg(*planes):
            rp, np_, dp = planes[:24], planes[24:32], planes[32:36]
            return df.fused_shade(
                scene_pack, meta.num_tris, rp, np_, dp, 2, 16, h, w,
                grad_planes=(real, zf, zf, zf, onesf, onesf, onesf,
                             ux, uy, u_splat),
                woop=woop, bounce_emit=True,
            )

        t_k2mg = inloop(k2mg, *ray_planes, *nee_planes, *draws)
        print(f"k2mg (merged grad): {t_k2mg*1e3:.2f} ms", flush=True)

    def run_sample(seed2):
        rad, gouts = df._one_sample(
            data, material, scene.camera, seed2, cfg, setup, 0, True,
            grad_extra=(onesf, onesf, onesf),
        )
        return rad

    t_sample = inloop(run_sample, seed)
    print(f"sample: {t_sample*1e3:.2f} ms", flush=True)

    from zdr_tpu import texture as tex
    n = rows * L
    rs = np.random.RandomState(0)
    ids = jnp.asarray(
        np.where(rs.rand(n) < 0.4, (rs.rand(n) * h * w), h * w).astype(np.int32)
    )
    chans = [jnp.asarray(rs.rand(n).astype(np.float32)) for _ in range(4)]

    def flush(ids, *cs):
        return tex.segment_scatter_add4(ids, list(cs), h * w)

    t_flush = inloop(flush, ids, *chans)
    print(f"flush: {t_flush*1e3:.2f} ms", flush=True)

    print(f"rows={rows} lanes={rows*L} shade_frac={float((shade!=0).mean()):.3f}")
    print(f"k1  (closest+gather):  {t_k1*1e3:7.2f} ms")
    print(f"glue (NEE+draws+tex):  {t_glue*1e3:7.2f} ms")
    print(f"k2f (shadow+shade):    {t_k2f*1e3:7.2f} ms")
    print(f"k1b (bounce closest):  {t_k1b*1e3:7.2f} ms")
    print(f"k2g (grad, no sweep):  {t_k2g*1e3:7.2f} ms")
    print(f"full sample fwd+grad:  {t_sample*1e3:7.2f} ms")
    print(f"flush (40% real):      {t_flush*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
