"""The reference's own benchmark protocol (ref benchmark.py:26-39):
direct integrator with MIS, 512x512, 256 spp, textured sphere + one area
light, full differentiable iteration (render + I.sum().backward()).

Prints seconds/iteration and effective Mrays/s using the protocol's ray
accounting (primary closest + NEE shadow + MIS bounce closest, forward and
re-traced backward: ~6 rays/sample).

Usage: python -u tools/bench_reference.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
RES = (512, 512)
SPP = 256


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere

    # sphere + one quad light overhead (the lightstage light stand-in)
    scene = Scene(
        [
            (make_uv_sphere(0.5, 16, 32), None, None),
            # +y-normal quad below the sphere, facing it (the reference's
            # light-stage light obj is absent from its snapshot)
            (make_quad(size=1.0, y=-2.0), None, 40.0),
        ],
        integrator="direct",
    )
    scene.camera = Camera(
        fov=0.8, origin=float3(1.5, 0.3, 0.0), target=float3(0.0, 0.0, 0.0)
    )
    material = jnp.full((1024, 1024, 4), 0.5, jnp.float32)
    # spp windows bound each device call's runtime (the axon worker kills
    # long executions) but every window boundary pays the tunnel's ~25 ms
    # sync-mode dispatch tax. At round-4 per-sample speed a 64-spp backward
    # window runs ~1 s/call — far from the kill — and 16 -> 64 windows
    # measured 6.04 -> 5.73 s/iter (identical sampling; the window split is
    # an implementation detail of the same estimator).
    scene.max_spp_per_call = 64

    def loss(m, seed):
        img = scene.render(m, res=RES, spp=SPP, seed=seed)
        return jnp.sum(img[..., :3])

    # NO outer jit: Scene.render slices spp into windows precisely so each
    # device execution stays under the remote worker's ~1-minute kill; an
    # outer jit would fuse all windows (fwd+bwd) into one giant program.
    step = jax.value_and_grad(loss)
    l, g = step(material, jnp.asarray(0, jnp.int32))
    _ = float(g.sum())
    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        l, g = step(material, jnp.asarray(i + 1, jnp.int32))
        _ = float(g.sum())
        times.append(time.perf_counter() - t0)
    dt = sum(times) / ITERS
    rays = RES[0] * RES[1] * SPP * 6.0
    print(
        f"reference protocol (direct 512^2 256spp fwd+bwd): "
        f"{dt:.2f} s/iter ({rays/dt/1e6:.1f} Mrays/s)  "
        f"times: {' '.join(f'{t:.2f}' for t in times)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
