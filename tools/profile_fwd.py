"""Dissect the forward path-bounce cost on real TPU.

Times each component of _walk_one_bounce at full wavefront width (512^2 =
262k lanes by default) to locate where the ~2-3 ms/bounce goes:

  trace_closest : pallas dense sweep
  trace_any     : pallas occlusion sweep
  interact      : surface_interact gathers
  read_bsdf     : quad-packed bilinear texture fetch (1024^2 texture)
  sample_light  : NEE light sampling
  ggx           : brdf eval x2 + VNDF sample + pdf
  bounce        : one full _walk_one_bounce
  fwd_loop      : persistent forward, per-iteration cost

Usage: python tools/profile_fwd.py [res] [spp]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def sync(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>14s}: {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.accel import trace_any, trace_closest
    from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light
    from zdr_tpu.integrators import path_persistent as pp
    from zdr_tpu.integrators.path import SPECULAR, _walk_one_bounce
    from zdr_tpu.integrators.wrapper import _pixel_grid, _primary_rays
    from zdr_tpu.interaction import surface_interact
    from zdr_tpu.lights import sample_light
    from zdr_tpu.microfacet import ggx_brdf, ggx_sample, ggx_sample_pdf
    from zdr_tpu.onb import make_onb
    from zdr_tpu.samplers import make_sampler
    from zdr_tpu.texture import read_bsdf

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

    smp0 = make_sampler(cfg.sampler, coords, seed, cfg.spp, 0)
    o, d, smp0 = _primary_rays(coords, cam, smp0, cfg.res, cfg.use_tent_filter)
    o, d = jax.block_until_ready((o, d))
    N = o.shape[0]
    print(f"lanes: {N}, tris: {data.accel.num_triangles}")

    t_c = timeit("trace_closest", jax.jit(lambda o, d: trace_closest(data.accel, o, d)), o, d)
    t_a = timeit("trace_any", jax.jit(lambda o, d: trace_any(data.accel, o, d, t_min=1e-4, t_max=10.0)), o, d)

    hit = jax.jit(lambda o, d: trace_closest(data.accel, o, d))(o, d)
    hit = jax.block_until_ready(hit)
    t_i = timeit("interact", jax.jit(lambda h: surface_interact(h, data.geom)), hit)

    it = jax.block_until_ready(jax.jit(lambda h: surface_interact(h, data.geom))(hit))
    t_t = timeit("read_bsdf", jax.jit(lambda uv, m: read_bsdf(uv, m)), it.uv, material)

    t_l = timeit(
        "sample_light",
        jax.jit(lambda p, s: sample_light(data, p, s)[0]),
        it.p, smp0,
    )

    mat = jax.block_until_ready(jax.jit(lambda uv, m: read_bsdf(uv, m))(it.uv, material))

    def ggx_all(mat, wo_local, u_lobe, u2):
        dif = mat[..., :3]
        rgh = mat[..., 3]
        wi = ggx_sample(wo_local, rgh, u_lobe, u2)
        pdf = ggx_sample_pdf(wo_local, wi, rgh)
        b1 = ggx_brdf(wo_local, wi, dif, SPECULAR, rgh)
        return wi, pdf, b1

    onb = make_onb(it.ns)
    wo_local = jax.block_until_ready(onb.to_local(-d))
    u_lobe, s1 = smp0.next1()
    u2, _ = s1.next2()
    u_lobe, u2 = jax.block_until_ready((u_lobe, u2))
    t_g = timeit("ggx", jax.jit(ggx_all), mat, wo_local, u_lobe, u2)

    pdf_prev = jnp.full((N,), 1e30, jnp.float32)
    active = jnp.ones((N,), bool)
    t_b = timeit(
        "bounce",
        jax.jit(lambda o, d, s: _walk_one_bounce(data, material, o, d, pdf_prev, active, s, cfg)[0].uv),
        o, d, smp0,
    )

    fwd = jax.jit(lambda m, s: pp.render_path_persistent(data, m, cam, s, cfg, coords))
    t_f = timeit("fwd_total", fwd, material, seed, iters=2)
    print(f"  components sum: {(t_c+t_a+t_i+t_t+t_l+t_g)*1e3:.3f} ms vs bounce {t_b*1e3:.3f} ms")


def main_inloop():
    """In-loop (fori_loop) per-component timings — the standalone numbers
    above are dominated by ~6 ms of per-call tunnel overhead."""
    import time
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.accel import trace_any, trace_closest
    from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light
    from zdr_tpu.integrators.path import SPECULAR, _walk_one_bounce
    from zdr_tpu.integrators.wrapper import _pixel_grid, _primary_rays
    from zdr_tpu.interaction import surface_interact
    from zdr_tpu.lights import sample_light
    from zdr_tpu.microfacet import ggx_brdf, ggx_sample, ggx_sample_pdf
    from zdr_tpu.onb import make_onb
    from zdr_tpu.samplers import make_sampler
    from zdr_tpu.texture import read_bsdf

    REPS = 20
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
    cfg = scene._config((RES, RES), SPP)
    coords = _pixel_grid(cfg.res)
    data = scene._data
    cam = scene.camera
    smp0 = make_sampler(cfg.sampler, coords, 0, cfg.spp, 0)
    o, d, smp0 = _primary_rays(coords, cam, smp0, cfg.res, cfg.use_tent_filter)
    N = o.shape[0]
    hit0 = jax.jit(lambda o, d: trace_closest(data.accel, o, d))(o, d)
    it0 = jax.jit(lambda h: surface_interact(h, data.geom))(hit0)
    onb = make_onb(it0.ns)
    wo_local = onb.to_local(-d)
    u_lobe, s1 = smp0.next1()
    u2, _ = s1.next2()
    pdf_prev = jnp.full((N,), 1e30, jnp.float32)
    active = jnp.ones((N,), bool)

    def timeit_l(name, body, *args):
        def outer(*a):
            def step(i, acc):
                pert = jnp.float32(i) * 1e-12
                out = body(pert, *a)
                return acc + jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, REPS, step, jnp.float32(0.0))
        f = jax.jit(outer)
        float(f(*args))
        t0 = time.perf_counter()
        float(f(*args))
        dt = (time.perf_counter() - t0 - 0.03) / REPS
        print(f"{name:>16s}: {dt*1e3:9.3f} ms/op", flush=True)

    timeit_l("trace_closest", lambda p, o, d: trace_closest(data.accel, o + p, d).t, o, d)
    timeit_l("trace_any", lambda p, o, d: trace_any(data.accel, o + p, d, t_min=1e-4, t_max=10.0), o, d)
    timeit_l("interact", lambda p, h: surface_interact(h._replace(bary_u=h.bary_u + p), data.geom).uv, hit0)
    timeit_l("read_bsdf", lambda p, uv, m: read_bsdf(uv + p, m), it0.uv, material)
    timeit_l("sample_light", lambda p, x, s: sample_light(data, x + p, s)[0].wi, it0.p, smp0)

    def ggx_all(p, mat, wol, ul, u2):
        dif = mat[..., :3] + p
        rgh = mat[..., 3]
        wi = ggx_sample(wol, rgh, ul, u2)
        pdf = ggx_sample_pdf(wol, wi, rgh)
        return ggx_brdf(wol, wi, dif, SPECULAR, rgh)

    mat0 = jax.jit(lambda uv, m: read_bsdf(uv, m))(it0.uv, material)
    timeit_l("ggx", ggx_all, mat0, wo_local, u_lobe, u2)
    timeit_l("bounce", lambda p, o, d, s: _walk_one_bounce(data, material, o + p, d, pdf_prev, active, s, cfg)[0].uv, o, d, smp0)


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "inloop":
        main_inloop()
    else:
        main()
