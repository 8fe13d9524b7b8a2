"""Dissect the FUSED path-bounce cost on the bench scene (cbox 512^2).

The headline (bench.py) is fwd 0.51 s / iter 1.68 s at spp64 with a
~2.6 ms per-262k-lane fused bounce; this tool splits that bounce into its
parts with reps-inside-one-jit timing (the only honest method through the
axon tunnel — see docs/ROUND4_NOTES.md §1):

  k1_fori        : fused_trace_interact (14-tri fori sweep)
  tex_gather     : read_quads_planes (the one real gather per bounce)
  glue_light     : sample_light_planes (3 pmj02bn draws + light select)
  glue_draws     : bounce_draws (4 pmj02bn draws)
  glue_start     : start_sample_planes (restart rays; every iteration)
  k2_fwd         : fused_shade forward
  k2_bwd         : fused_shade with gradient taps
  fwd_iter       : measured forward while-loop per-iteration cost
  bwd_iter       : measured backward while-loop per-iteration cost

Usage: python tools/profile_fused_bounce.py [res] [spp]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 64
REPS = 20


def sync(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])


def timeit_l(name, body, *args, reps=REPS):
    """reps-in-jit: body(pert, *args) -> pytree; the first leaf's [0]
    element feeds the next rep's perturbation (defeats CSE)."""

    def outer(*a):
        def step(i, acc):
            out = body(acc * 1e-30, *a)
            return acc + jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, step, jnp.float32(0.0))

    f = jax.jit(outer)
    float(f(*args))  # compile
    t0 = time.perf_counter()
    float(f(*args))
    dt = (time.perf_counter() - t0 - 0.03) / reps
    print(f"{name:>14s}: {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light
    from zdr_tpu.integrators import path_fused as pf
    from zdr_tpu.integrators.fused_glue import (
        bounce_draws,
        sample_light_planes,
        start_sample_planes,
    )
    from zdr_tpu.integrators.pallas_bounce import (
        LANES,
        fused_shade,
        fused_trace_interact,
        read_quads_planes,
    )
    from zdr_tpu.integrators.path import _depths
    from zdr_tpu.integrators.wrapper import _pixel_grid
    from zdr_tpu.texture import pack_quads

    scene = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator="path",
        accel="pallas",
    )
    scene.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(-0.2, 2.6, -0.5),
        target=float3(-0.2, 2.6, -5.0),
    )
    material = jnp.full((1024, 1024, 4), 0.5, jnp.float32)
    cfg = scene._config((RES, RES), SPP)
    coords = _pixel_grid(cfg.res)
    data = scene._data
    cam = scene.camera
    seed = jnp.asarray(0, jnp.int32)
    h, w = 1024, 1024
    md, rr_d = _depths(cfg)

    (meta, scene_pack, tables, env_hw, packed, rows, pxp, pyp,
     start_idx, stop_idx, woop, stream, (perm, inv)) = pf._setup(
        data, material, cfg, coords, 0)
    print(f"lanes: {rows * LANES}, tris: {meta.num_tris}, md={md}, rr={rr_d}, "
          f"woop={'yes' if woop is not None else 'no'}")

    smp0, o0, d0 = start_sample_planes(
        cfg.sampler, pxp, pyp, cam, seed, start_idx, cfg.spp, cfg.res,
        cfg.use_tent_filter,
    )
    zeros = jnp.zeros((rows, LANES), jnp.float32)
    s0 = dict(
        sample_idx=start_idx,
        cur=(zeros, zeros, zeros),
        beta=(zeros + 1.0, zeros + 1.0, zeros + 1.0),
        pdf_prev=zeros + 1e30,
        o=o0, d=d0, smp=smp0,
        depth=jnp.zeros((rows, LANES), jnp.int32),
    )
    lane_live = jnp.ones((rows, LANES), bool)

    # ---------------- k1
    def k1(p, o, d):
        rays8 = (o[0] + p, o[1], o[2], *d, s0["pdf_prev"],
                 lane_live.astype(jnp.int32))
        return fused_trace_interact(scene_pack, meta.num_tris, rays8,
                                    interpret=False, woop=woop)

    timeit_l("k1_fori", k1, s0["o"], s0["d"])

    # get real k1 outputs for downstream components
    k1o = jax.jit(lambda o, d: k1(0.0, o, d))(s0["o"], s0["d"])
    k1o = jax.block_until_ready(k1o)
    (px, py, pz, ux, uy, nsx, nsy, nsz, ngx, ngy, ngz,
     shade, aer, aeg, aeb, miss_i) = k1o

    # ---------------- texture gather
    timeit_l("tex_gather", lambda p, ux, uy: read_quads_planes(
        ux + p, uy, packed, h, w), ux, uy)
    packed_bf16 = pack_quads(material, True)
    timeit_l("tex_gather16", lambda p, ux, uy: read_quads_planes(
        ux + p, uy, packed_bf16, h, w), ux, uy)

    # ---------------- glue: NEE selection + draws
    def glue_light(p, px, py, pz, smp):
        (nee, smp) = sample_light_planes(
            meta, tables, env_hw, (px + p, py, pz), smp)
        return nee[0][0], smp

    timeit_l("glue_light", glue_light, px, py, pz, smp0)

    def glue_draws(p, smp):
        draws, smp = bounce_draws(smp._replace(
            dimension=smp.dimension + (p != 0.0).astype(jnp.uint32)), True)
        return draws[0]

    timeit_l("glue_draws", glue_draws, smp0)

    def glue_start(p, si):
        smp, o, d = start_sample_planes(
            cfg.sampler, pxp, pyp, cam, seed,
            si + (p != 0.0).astype(jnp.int32), cfg.spp, cfg.res,
            cfg.use_tent_filter,
        )
        return o[0] + d[0]

    timeit_l("glue_start", glue_start, start_idx)

    # ---------------- k2
    mat_p = read_quads_planes(ux, uy, packed, h, w)
    nee, smp1 = sample_light_planes(meta, tables, env_hw, (px, py, pz), smp0)
    (wi_l, l_dist, l_pdf, l_ev) = nee
    draws, smp1 = bounce_draws(smp1, True)
    ray_planes = (
        px, py, pz, nsx, nsy, nsz, ngx, ngy, ngz, *s0["d"], shade,
        *mat_p, *s0["beta"], s0["depth"], aer, aeg, aeb,
    )
    nee_planes = (*wi_l, l_dist, l_pdf, *l_ev)
    ray_planes = jax.block_until_ready(ray_planes)
    nee_planes = jax.block_until_ready(nee_planes)
    draws = jax.block_until_ready(draws)

    def k2f(p, rp, np_, dr):
        rp = (rp[0] + p,) + tuple(rp[1:])
        return fused_shade(scene_pack, meta.num_tris, rp, np_, dr,
                           rr_d, md, h, w, interpret=False, woop=woop)

    timeit_l("k2_fwd", k2f, ray_planes, nee_planes, draws)

    from zdr_tpu.samplers.hashes import lcg_to_unit_float

    u_splat = lcg_to_unit_float(smp1.salt())
    gp = (lane_live.astype(jnp.int32), zeros, zeros, zeros,
          zeros + 1.0, zeros + 1.0, zeros + 1.0, ux, uy, u_splat)
    gp = jax.block_until_ready(gp)

    def k2b(p, rp, np_, dr, gp):
        rp = (rp[0] + p,) + tuple(rp[1:])
        return fused_shade(scene_pack, meta.num_tris, rp, np_, dr,
                           rr_d, md, h, w, grad_planes=gp,
                           interpret=False, woop=woop)

    timeit_l("k2_bwd", k2b, ray_planes, nee_planes, draws, gp)

    # ---------------- full fwd / bwd walk: measured per-iteration cost
    # (instrumented copies of the loops would drift; instead time the real
    #  renders and divide by the iteration count from a counter variant)
    def fwd(m, s):
        return pf.render_path_fused(data, m, cam, s, cfg, coords)

    f = jax.jit(fwd)
    img = f(material, seed)
    sync(img)
    t0 = time.perf_counter()
    img = f(material, seed)
    sync(img)
    t_fwd = time.perf_counter() - t0

    # iteration count: rerun the loop with the same schedule, counting
    it_cfg = cfg
    n_iter = _count_iters(pf, data, material, cam, seed, it_cfg, coords)
    print(f"{'fwd_total':>14s}: {t_fwd*1e3:9.1f} ms  ({n_iter} iters -> "
          f"{t_fwd/n_iter*1e3:.3f} ms/iter)")

    def loss(m, s):
        img = scene.render(m, res=(RES, RES), spp=SPP, seed=s)
        return jnp.sum(img[..., :3])

    g = jax.jit(jax.value_and_grad(loss))
    _l, gm = g(material, seed)
    sync(gm)
    t0 = time.perf_counter()
    _l, gm = g(material, seed)
    sync(gm)
    t_it = time.perf_counter() - t0
    # backward walk iterations ~= 2x forward (phase 0 + phase 1)
    print(f"{'fwd+bwd':>14s}: {t_it*1e3:9.1f} ms  (bwd {t_it - t_fwd:.3f} s, "
          f"~{2*n_iter} iters -> {(t_it-t_fwd)/(2*n_iter)*1e3:.3f} ms/iter)")


def _count_iters(pf, data, material, cam, seed, cfg, coords):
    """Run the forward loop once more, returning its iteration count."""
    import jax
    import jax.numpy as jnp
    from zdr_tpu.integrators.fused_glue import start_sample_planes
    from zdr_tpu.integrators.pallas_bounce import LANES
    from zdr_tpu.integrators.path import _depths

    # replicate render_path_fused's loop skeleton, but only count
    (meta, scene_pack, tables, env_hw, packed, rows, pxp, pyp,
     start_idx, stop_idx, woop, stream, (perm, inv)) = pf._setup(
        data, material, cfg, coords, 0)
    h, w = material.shape[0], material.shape[1]
    md, rr_d = _depths(cfg)
    interp = False

    smp0, o0, d0 = start_sample_planes(
        cfg.sampler, pxp, pyp, cam, seed, start_idx, cfg.spp, cfg.res,
        cfg.use_tent_filter,
    )
    zeros = jnp.zeros((rows, LANES), jnp.float32)
    init = dict(
        sample_idx=start_idx,
        acc=(zeros, zeros, zeros),
        cur=(zeros, zeros, zeros),
        beta=(zeros + 1.0, zeros + 1.0, zeros + 1.0),
        pdf_prev=zeros + 1e30,
        o=o0, d=d0, smp=smp0,
        depth=jnp.zeros((rows, LANES), jnp.int32),
        it=jnp.zeros((), jnp.int32),
    )
    max_iters = (cfg.window_count + 1) * md + md

    def cond(s):
        return jnp.any(s["sample_idx"] < stop_idx) & (s["it"] < max_iters)

    def body(s):
        lane_live = s["sample_idx"] < stop_idx
        ray_planes, nee_planes, draws, _uv, smp = pf._bounce(
            data, meta, scene_pack, tables, env_hw, packed, cfg, s,
            lane_live, s["smp"], h, w, interp, woop=woop, stream=stream,
        )
        from zdr_tpu.integrators.pallas_bounce import fused_shade
        from zdr_tpu.samplers import select_on_restart

        k2 = fused_shade(
            scene_pack, meta.num_tris, ray_planes, nee_planes, draws,
            rr_d, md, h, w, interpret=interp, woop=woop,
        )
        (radr, radg, radb, bnr, bng, bnb, pdfb,
         nox, noy, noz, ndx, ndy, ndz, alive_i) = k2
        alive = alive_i != 0
        terminated = lane_live & ~alive
        sample_idx = s["sample_idx"] + terminated.astype(jnp.int32)
        new_smp, new_o, new_d = start_sample_planes(
            cfg.sampler, pxp, pyp, cam, seed, sample_idx, cfg.spp, cfg.res,
            cfg.use_tent_filter,
        )
        restart = terminated & (sample_idx < stop_idx)

        def sel(a, b, c):
            return jnp.where(restart, a, jnp.where(alive, b, c))

        o = tuple(sel(new_o[c], (nox, noy, noz)[c], s["o"][c]) for c in range(3))
        d = tuple(sel(new_d[c], (ndx, ndy, ndz)[c], s["d"][c]) for c in range(3))
        smp = select_on_restart(restart, new_smp, smp)
        beta = tuple(
            jnp.where(terminated, 1.0,
                      jnp.where(alive, (bnr, bng, bnb)[c], s["beta"][c]))
            for c in range(3)
        )
        pdf_prev = jnp.where(terminated, 1e30, jnp.where(alive, pdfb, s["pdf_prev"]))
        depth = jnp.where(terminated, 0, s["depth"] + 1)
        return dict(
            sample_idx=sample_idx, acc=s["acc"], cur=s["cur"], beta=beta,
            pdf_prev=pdf_prev, o=o, d=d, smp=smp, depth=depth,
            it=s["it"] + 1,
        )

    out = jax.jit(lambda: jax.lax.while_loop(cond, body, init))()
    return int(out["it"])


if __name__ == "__main__":
    main()
