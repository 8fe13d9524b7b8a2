"""Adversarial gradient-contention benchmark: every ray splats ONE texel.

The reference README's motivating failure is atomic-scatter contention
when many threads accumulate gradients into the same texel
(/root/reference/README.md:21 — the "worst case" the whole PRB+scatter
design exists to survive). The TPU rebuild's sorted-segment flush is
contention-free by construction; this benchmark PROVES it end-to-end for
all three integrators by rendering a sphere whose every UV is the same
point (all gradient splats land in one texel) and comparing the full
backward time against the normal-UV sphere.

Prints per-integrator: normal-uv s/iter, one-texel s/iter, ratio.
A contention cliff would show as ratio >> 1 (the reference's CUDA atomic
path degrades ~100x); the sorted pipeline should hold ratio ~1.

Usage: python -u tools/bench_adversarial.py [res] [spp]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere

    def scene_for(collapse_uv):
        sph = make_uv_sphere(0.5, 16, 32)
        if collapse_uv:
            sph = sph._replace(uvs=np.full_like(sph.uvs, 0.5))
        s = Scene(
            [(sph, None, None), (make_quad(size=1.0, y=-2.0), None, 40.0)],
            integrator="direct",
        )
        s.camera = Camera(
            fov=0.8, origin=float3(1.5, 0.3, 0.0), target=float3(0.0, 0.0, 0.0)
        )
        s.max_spp_per_call = 16
        return s

    material = jnp.full((1024, 1024, 4), 0.5, jnp.float32)

    def time_bwd(s, integ):
        s.integrator = integ

        def loss(m):
            return jnp.sum(s.render(m, res=(RES, RES), spp=SPP, seed=1)[..., :3])

        step = jax.grad(loss)
        _ = float(step(material).sum())  # compile
        t0 = time.perf_counter()
        g = step(material)
        checks = float(jnp.abs(g).sum())
        dt = time.perf_counter() - t0
        assert np.isfinite(checks) and checks > 0, (integ, checks)
        return dt

    normal, adversarial = scene_for(False), scene_for(True)
    for integ in ("collocated", "direct", "path"):
        tn = time_bwd(normal, integ)
        ta = time_bwd(adversarial, integ)
        print(
            f"{integ:10s}: normal-uv {tn:6.2f} s  one-texel {ta:6.2f} s  "
            f"ratio {ta/tn:5.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
