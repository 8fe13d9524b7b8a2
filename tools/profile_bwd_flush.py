"""Measure the splat flush's real share of the fused PRB backward (512^2,
1024^2 texture — the bench.py config), by timing the backward with the
flush (a) real, (b) stubbed to zeros (same shapes, no sort/scatter), and
(c) at different SCATTER_BATCH sizes."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


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
    from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light
    import zdr_tpu.integrators.path_fused as pf
    import zdr_tpu.texture as tex

    s = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator="path",
    )
    s.camera = Camera(fov=0.87, origin=float3(-0.2, 2.6, -0.5),
                      target=float3(-0.2, 2.6, -5.0))
    mat = jnp.asarray(np.random.RandomState(0).rand(1024, 1024, 4).astype(np.float32))
    res, spp = (512, 512), 64

    def fwd():
        return s.render(mat, res=res, spp=spp, seed=1)

    def loss(m):
        return jnp.sum(s.render(m, res=res, spp=spp, seed=1)[..., :3])

    g = jax.jit(jax.grad(loss))
    t_fwd = timeit(fwd)
    t_it = timeit(lambda: g(mat))
    print(f"fwd {t_fwd:.3f}s  full iter {t_it:.3f}s  bwd {t_it-t_fwd:.3f}s "
          f"bwd/fwd {(t_it-t_fwd)/t_fwd:.2f}", flush=True)

    real = tex.segment_scatter_add4

    def stub(ids, chans, n_bins, k_compact=None, packed=True, prepacked=False):
        z = ids[:8].sum().astype(jnp.float32) * 0.0
        return jnp.zeros((4, n_bins), jnp.float32) + z

    from zdr_tpu.integrators import wrapper

    # the fused flush goes through tex.flush_splat_buffer, which resolves
    # segment_scatter_add4 as a texture-module global — one patch point
    tex.segment_scatter_add4 = stub
    try:
        # build_render is lru_cached and jitted: without dropping both the
        # cache and the compiled programs, the stub never reaches the
        # compiled backward (first run of this tool reported a bogus 0%).
        wrapper.build_render.cache_clear()
        jax.clear_caches()
        g2 = jax.jit(jax.grad(loss))
        t_it2 = timeit(lambda: g2(mat))
        print(f"flush stubbed: iter {t_it2:.3f}s -> flush share of bwd "
              f"{(t_it-t_it2)/(t_it-t_fwd)*100:.0f}%", flush=True)
    finally:
        tex.segment_scatter_add4 = real

    for sb in (8, 16):
        old = pf.SCATTER_BATCH
        pf.SCATTER_BATCH = sb  # path_fused binds the value at import
        try:
            wrapper.build_render.cache_clear()
            jax.clear_caches()
            g3 = jax.jit(jax.grad(loss))
            t3 = timeit(lambda: g3(mat))
            print(f"SCATTER_BATCH={sb}: iter {t3:.3f}s", flush=True)
        finally:
            pf.SCATTER_BATCH = old


if __name__ == "__main__":
    main()
