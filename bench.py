"""Benchmark: Cornell-box 512x512 path trace, forward + PRB backward.

The driver-defined north-star metric (BASELINE.json): Mrays/s for a full
differentiable iteration (render + texture-gradient) on the path integrator.
The reference publishes no numbers (BASELINE.md), so this establishes the
baseline; `vs_baseline` is measured against the first value recorded in
BASELINE.md (BASELINE_MRAYS below).

Ray accounting (documented, honest): the path_stats probe measures the
average number of closest-hit and shadow traces per camera sample for this
exact scene/sampler. Forward cost = (closest + shadow) rays per sample. The
backward's walk count depends on the routed implementation: the round-5
megakernel loop (integrators/pallas_loop.py) walks each sample ONCE (the
tap-replay backward recovers the continuation adjoint from stored
per-bounce taps), while the 2-walk PRB backward replays Le first. So
    total_rays = res^2 * spp * (closest + shadow) * (1 + bwd_walks),
with bwd_walks probed from the routing (1 for the loop, 2 otherwise).

Note: on the axon remote-TPU platform, block_until_ready() does not actually
synchronize — a host transfer (float()) is the only reliable fence, so all
timing here round-trips a scalar.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

RES = (512, 512)
SPP = 64
ITERS = 5  # per-iteration times also printed to stderr (spread check)
# First value measured on this hardware (v5e-1 via axon, 2026-08-16),
# recorded in BASELINE.md. Update when re-baselining.
BASELINE_MRAYS = 8.4


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light
    from zdr_tpu.integrators.path import path_stats
    from zdr_tpu.integrators.wrapper import _pixel_grid, _primary_rays
    from zdr_tpu.samplers import make_sampler

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

    # --- ray-count probe (small res; per-sample averages are res-agnostic)
    cfg_probe = scene._config(res=(64, 64), spp=1)
    coords = _pixel_grid(cfg_probe.res)
    smp = make_sampler(cfg_probe.sampler, coords, 0, 1, 0)
    o, d, smp = _primary_rays(
        coords, scene.camera, smp, cfg_probe.res, cfg_probe.use_tent_filter
    )
    n_closest, n_shadow = path_stats(scene._data, material, o, d, smp)
    rays_per_sample = float(n_closest) + float(n_shadow)

    # --- timed fwd+bwd iterations
    def loss_fn(m, seed):
        img = scene.render(m, res=RES, spp=SPP, seed=seed)
        return jnp.sum(img[..., :3])

    step = jax.jit(jax.value_and_grad(loss_fn))

    # warmup / compile (float() forces a real device sync through the tunnel)
    l, g = step(material, jnp.asarray(0, jnp.int32))
    _ = float(g.sum())

    import sys

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        l, g = step(material, jnp.asarray(i + 1, jnp.int32))
        _ = float(g.sum())  # host transfer = the only real fence on axon
        times.append(time.perf_counter() - t0)
    dt = sum(times) / ITERS
    print(
        "iter times (s): " + " ".join(f"{t:.2f}" for t in times),
        file=sys.stderr,
    )

    from zdr_tpu.integrators.pallas_loop import loop_eligible

    bwd_walks = 1.0 if loop_eligible(scene._data, scene._config(RES, SPP)) else 2.0
    n_samples = RES[0] * RES[1] * SPP
    total_rays = n_samples * rays_per_sample * (1.0 + bwd_walks)
    mrays = total_rays / dt / 1e6

    vs = mrays / BASELINE_MRAYS if BASELINE_MRAYS else 1.0
    print(
        json.dumps(
            {
                "metric": "cbox512_path_fwd+prb_bwd",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


def main_with_retry():
    # the axon tunnel occasionally kills the TPU worker under load and
    # takes 1-5 min to recover; one retry keeps driver runs robust
    try:
        main()
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"bench attempt 1 failed ({type(e).__name__}); retrying", file=sys.stderr)
        for _ in range(10):
            time.sleep(60)
            try:
                import jax.numpy as _j

                if float(_j.ones(8).sum()) == 8.0:
                    break
            except Exception:  # noqa: BLE001
                continue
        main()


if __name__ == "__main__":
    main_with_retry()
