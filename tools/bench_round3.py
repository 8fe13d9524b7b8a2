"""Round-3 measurement tool: fused envelope coverage on TPU.

Measures (1) the reference-example envmap workflow fused vs unfused
(VERDICT r2 item 1), (2) pmj02bn vs lcg fused throughput (item 3), and
(3) the fused forward/backward split on the flagship config (item 2).
Timing round-trips a scalar (the axon tunnel ignores block_until_ready).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).sum())


def timeit(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    return min(ts)


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import (
        make_cornell_box, make_cornell_light, make_uv_sphere,
    )
    from zdr_tpu.envmap import make_test_envmap

    mat = jnp.asarray(np.random.RandomState(0).rand(256, 256, 4).astype(np.float32))
    res, spp = (256, 256), 16

    def env_scene(sampler="lcg"):
        s = Scene([(make_uv_sphere(0.6, n_lat=16, n_lon=32), None, None)],
                  integrator="path", sampler=sampler)
        s.camera = Camera(fov=0.9, origin=float3(0, 0.3, 2.0),
                          target=float3(0, 0, 0))
        s.add_envmap(make_test_envmap(128, 256))
        return s

    def cbox(sampler="lcg"):
        s = Scene([(make_cornell_box(), None, None),
                   (make_cornell_light(), None, 15.0)],
                  integrator="path", sampler=sampler)
        s.camera = Camera(fov=0.87, origin=float3(-0.2, 2.6, -0.5),
                          target=float3(-0.2, 2.6, -5.0))
        return s

    def fwd(s):
        return lambda: s.render(mat, res=res, spp=spp, seed=1)

    def fwdbwd(s):
        def loss(m):
            return jnp.sum(s.render(m, res=res, spp=spp, seed=1)[..., :3])
        g = jax.jit(jax.grad(loss))
        return lambda: g(mat)

    # 1) env workflow fused vs unfused
    s = env_scene()
    t_f_fwd = timeit(fwd(s))
    t_f_it = timeit(fwdbwd(s))
    s.fused = False
    t_u_fwd = timeit(fwd(s), n=1)
    t_u_it = timeit(fwdbwd(s), n=1)
    print(f"env sphere {res[0]}^2 spp{spp}: fused fwd {t_f_fwd:.3f}s iter {t_f_it:.3f}s | "
          f"unfused fwd {t_u_fwd:.3f}s iter {t_u_it:.3f}s | "
          f"speedup fwd {t_u_fwd/t_f_fwd:.1f}x iter {t_u_it/t_f_it:.1f}x", flush=True)

    # 2) pmj02bn vs lcg (fused, cbox + env scene)
    for mk, name in ((cbox, "cbox"), (env_scene, "env")):
        tl = timeit(fwdbwd(mk("lcg")))
        tp = timeit(fwdbwd(mk("pmj02bn")))
        tc = timeit(fwdbwd(mk("corrmj")))
        print(f"{name} fused iter: lcg {tl:.3f}s pmj02bn {tp:.3f}s ({tp/tl:.2f}x) "
              f"corrmj {tc:.3f}s ({tc/tl:.2f}x)", flush=True)

    # 3) fwd/bwd split, flagship config
    s = cbox()
    t_fwd = timeit(fwd(s))
    t_it = timeit(fwdbwd(s))
    print(f"cbox {res[0]}^2 spp{spp}: fused fwd {t_fwd:.3f}s full iter {t_it:.3f}s "
          f"bwd/fwd {(t_it-t_fwd)/t_fwd:.2f}", flush=True)


if __name__ == "__main__":
    main()
