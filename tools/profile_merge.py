"""TPU measurements for the splat_merge decision + the accel-route
backward discrepancy + the refproto glue breakdown.

Sections (each in a subprocess via the round3_batch driver pattern):
  merge   bench-config path iteration at splat_merge 1/2/4, fwd and iter
          timed separately, under both accel="pallas" and accel default
          (the round-3 batch measured bwd/fwd 2.97 on the default route
          but 4.29 under accel="pallas" — bench.py's own setting)
  glue    per-stage glue costs at the refproto size: start_sample_planes
          (pmj02bn vs lcg), sample_light_planes, bounce_draws,
          read_quads_planes (f32 vs bf16 table)

Usage: python -u tools/profile_merge.py [sections...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.asarray(x).sum())


def timeit(fn, n=2):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _merge_one(accel: str, m: int):
    import numpy as np

    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light

    mat = jnp.full((1024, 1024, 4), 0.5, jnp.float32)
    scene = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator="path",
        **({"accel": accel} if accel != "auto" else {}),
    )
    scene.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(-0.2, 2.6, -0.5),
        target=float3(-0.2, 2.6, -5.0),
    )

    def fwd(seed):
        return scene.render(mat, res=(512, 512), spp=64, seed=seed)

    def step(seed):
        def loss(m_):
            return jnp.sum(
                scene.render(m_, res=(512, 512), spp=64, seed=seed)[..., :3]
            )

        return jax.grad(loss)(mat)

    scene.splat_merge = m
    sync(fwd(jnp.asarray(0, jnp.int32)))
    t_fwd = timeit(lambda: fwd(jnp.asarray(1, jnp.int32)))
    sync(step(jnp.asarray(0, jnp.int32)))
    t_it = timeit(lambda: step(jnp.asarray(1, jnp.int32)))
    print(
        f"accel={accel} merge={m}: fwd {t_fwd:.3f}s iter {t_it:.3f}s "
        f"bwd {t_it-t_fwd:.3f}s bwd/fwd {(t_it-t_fwd)/t_fwd:.2f}",
        flush=True,
    )
    # gradient-noise check (merge m vs 1 same-seed, plus inherent noise)
    if m > 1:
        gm = np.asarray(step(jnp.asarray(7, jnp.int32)))
        scene.splat_merge = 1
        g1 = np.asarray(step(jnp.asarray(7, jnp.int32)))
        g1b = np.asarray(step(jnp.asarray(8, jnp.int32)))
        print(
            f"accel={accel} merge={m}: same-seed rel L1 "
            f"{np.abs(gm-g1).sum()/np.abs(g1).sum():.4f} "
            f"(cross-seed inherent {np.abs(g1b-g1).sum()/np.abs(g1).sum():.4f})",
            flush=True,
        )


def merge():
    for accel in ("pallas", "auto"):
        for m in (1, 2, 4):
            _merge_one(accel, m)





def glue():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere
    import zdr_tpu.integrators.direct_fused as df
    from zdr_tpu.integrators.fused_glue import (
        bounce_draws, sample_light_planes, start_sample_planes,
    )
    from zdr_tpu.integrators.pallas_bounce import LANES, read_quads_planes
    from zdr_tpu.integrators.wrapper import _pixel_grid
    from zdr_tpu.texture import pack_quads
    from tools.profile_direct_window import inloop

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
    sidx = jnp.zeros((rows, LANES), jnp.int32)

    for kind in ("pmj02bn", "lcg"):
        def start(_z):
            smp, o, d = start_sample_planes(
                kind, pxp, pyp, scene.camera, seed + _z[0, 0].astype(jnp.int32),
                sidx, cfg.spp, cfg.res, cfg.use_tent_filter,
            )
            return (*o, *d)

        t = inloop(start, jnp.zeros((8, 8), jnp.float32))
        print(f"start_sample[{kind}]: {t*1e3:.2f} ms", flush=True)

    smp, o, d = start_sample_planes(
        cfg.sampler, pxp, pyp, scene.camera, seed, sidx, cfg.spp, cfg.res,
        cfg.use_tent_filter,
    )
    px, py, pz = o  # position planes stand in for hit points (same shapes)

    def nee(px):
        out, smp2 = sample_light_planes(meta, tables, env_hw, (px, py, pz), smp)
        (wi, dist, pdf, ev) = out
        return (*wi, dist, pdf, *ev)

    print(f"sample_light: {inloop(nee, px)*1e3:.2f} ms", flush=True)

    def draws(px):
        d_, smp2 = bounce_draws(smp, want_rr=False)
        return d_

    print(f"bounce_draws(no rr): {inloop(draws, px)*1e3:.2f} ms", flush=True)

    for half in (False, True):
        table = pack_quads(material, half)

        def fetch(u):
            return read_quads_planes(u, py * 0.0 + 0.5, table, h, w)

        t = inloop(fetch, jnp.abs(px) * 0.0 + 0.5)
        print(f"read_quads[{'bf16' if half else 'f32'}]: {t*1e3:.2f} ms", flush=True)


SECTIONS = {"glue": glue}
for _accel in ("pallas", "auto"):
    for _m in (1, 2, 4, 8, 16):
        SECTIONS[f"merge-{_accel}-{_m}"] = (
            lambda a=_accel, m=_m: _merge_one(a, m)
        )


def main():
    args = sys.argv[1:]
    if not args or args[0] == "--driver":
        # run each section as a SUBPROCESS with a hard timeout: a wedged
        # tunnel connection blocks in-process device calls forever
        import subprocess

        for name in args[1:] or list(SECTIONS):
            print(f"\n=== {name} " + "=" * max(0, 50 - len(name)), flush=True)
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "-u", __file__, name],
                    timeout=1500, text=True, capture_output=True,
                )
                out = (r.stdout or "") + (r.stderr or "")
                print("\n".join(
                    ln for ln in out.splitlines() if "WARNING" not in ln
                ), flush=True)
            except subprocess.TimeoutExpired as e:
                out = e.stdout or ""
                if isinstance(out, bytes):
                    out = out.decode()
                print(out + f"\nsection {name} TIMED OUT", flush=True)
            print(f"[{name}: {time.time()-t0:.0f} s]", flush=True)
        return
    for name in args:
        print(f"\n=== {name} " + "=" * max(0, 50 - len(name)), flush=True)
        t0 = time.time()
        try:
            SECTIONS[name]()
        except Exception:  # noqa: BLE001
            import traceback

            traceback.print_exc()
        print(f"[{name}: {time.time()-t0:.0f} s]", flush=True)


if __name__ == "__main__":
    main()
