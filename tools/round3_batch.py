"""Round-3 serialized TPU measurement batch.

The axon tunnel dies for long stretches; when it returns, run EVERY pending
measurement in one serialized process (never two TPU jobs at once):

  1. reference protocol (tools/bench_reference logic, 2 iters), at
     16-spp and 32-spp windows — after the merged bounce_emit kernel and
     the prepacked bf16 splat buffer
  2. bench.py headline (path+PRB, 512^2 spp64)
  3. fused path backward/forward split (512^2 spp16 + spp64) — the
     single-walk-PRB go/no-go evidence (ROUND3_NOTES §14.3)
  4. per-stage direct window profile (tools/profile_direct_window)
  5. big-mesh in-render number: 66k-tri sphere render via the
     HBM-streamed fused path (VERDICT r2 item 4 wants a render number)

Each section is try/except'd; a tunnel probe with retries gates the start.

Usage: python -u tools/round3_batch.py [sections...]   (default: all)
"""

import sys
import time
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.asarray(x).sum())


def wait_tunnel(max_wait_s=3600):
    """Probe the tunnel in a SUBPROCESS with a hard timeout: a dead tunnel
    BLOCKS device calls indefinitely rather than raising, so an in-process
    probe would hang this batch forever."""
    import subprocess

    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "x = jnp.ones((256, 256));"
                 "print(float((x @ x).sum()))"],
                capture_output=True, timeout=90, text=True,
            )
            if r.returncode == 0 and "16777216" in r.stdout:
                print(f"tunnel up after {time.time()-t0:.0f} s", flush=True)
                return True
            print(f"probe rc={r.returncode}", flush=True)
        except subprocess.TimeoutExpired:
            print("probe timed out (tunnel down)", flush=True)
        time.sleep(60)
    return False


def section(name):
    print(f"\n=== {name} " + "=" * max(0, 60 - len(name)), flush=True)


def ref_protocol(window_spp):
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere

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
    material = jnp.full((1024, 1024, 4), 0.5, jnp.float32)
    scene.max_spp_per_call = window_spp
    RES, SPP = (512, 512), 256

    def loss(m, seed):
        img = scene.render(m, res=RES, spp=SPP, seed=seed)
        return jnp.sum(img[..., :3])

    grad = jax.grad(loss)

    def iteration(seed):
        g = grad(material, jnp.asarray(seed, jnp.int32))
        return sync(g)

    iteration(0)  # warm/compile
    times = []
    for i in range(2):
        t0 = time.perf_counter()
        iteration(i + 1)
        times.append(time.perf_counter() - t0)
    dt = sum(times) / len(times)
    rays = RES[0] * RES[1] * SPP * 6 / 1e6
    print(
        f"refprotocol window_spp={window_spp}: "
        + " ".join(f"{t:.2f}" for t in times)
        + f" -> {dt:.2f} s/iter, {rays/dt:.1f} Mrays/s",
        flush=True,
    )


def headline():
    import importlib

    import bench

    importlib.reload(bench)
    bench.main()


def bwd_split():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light

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
    for spp in (16, 64):

        def fwd(seed):
            return scene.render(material, res=(512, 512), spp=spp, seed=seed)

        def step(seed):
            def loss(m):
                img = scene.render(m, res=(512, 512), spp=spp, seed=seed)
                return jnp.sum(img[..., :3])

            return jax.grad(loss)(material)

        sync(fwd(jnp.asarray(0, jnp.int32)))
        t0 = time.perf_counter()
        sync(fwd(jnp.asarray(1, jnp.int32)))
        t_fwd = time.perf_counter() - t0
        sync(step(jnp.asarray(0, jnp.int32)))
        t0 = time.perf_counter()
        sync(step(jnp.asarray(1, jnp.int32)))
        t_it = time.perf_counter() - t0
        t_bwd = t_it - t_fwd
        print(
            f"path 512^2 spp{spp}: fwd {t_fwd:.3f} s, iter {t_it:.3f} s, "
            f"bwd {t_bwd:.3f} s, bwd/fwd {t_bwd/t_fwd:.2f}",
            flush=True,
        )


def direct_window():
    import tools.profile_direct_window as pdw

    pdw.main()


def bigmesh_render():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_uv_sphere

    sph = make_uv_sphere(0.5, n_lat=160, n_lon=160)  # bench_bigmesh's 51k-tri mesh
    scene = Scene([(sph, None, None)], integrator="collocated")
    scene.camera = Camera(
        fov=0.8, origin=float3(1.5, 0.3, 0.0), target=float3(0.0, 0.0, 0.0)
    )
    ntris = scene._data.geom.num_triangles
    material = jnp.full((1024, 1024, 4), 0.5, jnp.float32)

    def fwd(seed):
        return scene.render(material, res=(512, 512), spp=4, seed=seed)

    def step(seed):
        def loss(m):
            img = scene.render(m, res=(512, 512), spp=4, seed=seed)
            return jnp.sum(img[..., :3])

        return jax.grad(loss)(material)

    sync(fwd(jnp.asarray(0, jnp.int32)))
    t0 = time.perf_counter()
    sync(fwd(jnp.asarray(1, jnp.int32)))
    t_fwd = time.perf_counter() - t0
    sync(step(jnp.asarray(0, jnp.int32)))
    t0 = time.perf_counter()
    sync(step(jnp.asarray(1, jnp.int32)))
    t_it = time.perf_counter() - t0
    rays = 512 * 512 * 4 / 1e6
    print(
        f"bigmesh({ntris} tris) collocated 512^2 spp4 render: fwd {t_fwd:.3f} s "
        f"({rays/t_fwd:.1f} Mrays/s primary), fwd+bwd {t_it:.3f} s",
        flush=True,
    )
    # direct integrator too (closest + shadow + bounce per sample)
    from zdr_tpu.geometry.procedural import make_quad

    scene2 = Scene(
        [(sph, None, None), (make_quad(size=1.0, y=-2.0), None, 40.0)],
        integrator="direct",
    )
    scene2.camera = scene.camera

    def fwd2(seed):
        return scene2.render(material, res=(512, 512), spp=4, seed=seed)

    sync(fwd2(jnp.asarray(0, jnp.int32)))
    t0 = time.perf_counter()
    sync(fwd2(jnp.asarray(1, jnp.int32)))
    t2 = time.perf_counter() - t0
    print(
        f"bigmesh direct 512^2 spp4 fwd: {t2:.3f} s "
        f"({512*512*4*3/1e6/t2:.1f} Mrays/s)",
        flush=True,
    )


def example_workflow():
    """Reference-example workflow (sphere + envmap, direct, texture opt):
    fused vs unfused iteration time — VERDICT r2 item 1's done-criterion
    wants this ratio (>= 3x) as a BASELINE.md row."""
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.envmap import make_test_envmap
    from zdr_tpu.geometry.procedural import make_uv_sphere

    for fused in ("auto", False):
        scene = Scene([(make_uv_sphere(0.5), None, None)], integrator="direct")
        scene.fused = fused
        scene.add_envmap(make_test_envmap(256, 512))
        scene.camera = Camera(
            fov=50 / 180 * 3.1415926,
            origin=float3(1.0, 0.0, 0.0),
            target=float3(0.0, 0.0, 0.0),
        )
        scene.max_spp_per_call = 16
        material = jnp.full((512, 512, 4), 0.5, jnp.float32)

        def step(seed):
            def loss(m):
                img = scene.render(m, res=(512, 512), spp=64, seed=seed)
                return jnp.sum(img[..., :3])

            return jax.grad(loss)(material)

        sync(step(jnp.asarray(0, jnp.int32)))
        times = []
        for i in range(2):
            t0 = time.perf_counter()
            sync(step(jnp.asarray(i + 1, jnp.int32)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(
            f"example-workflow fused={fused}: "
            + " ".join(f"{t:.2f}" for t in times)
            + f" -> {dt:.2f} s/iter (512^2 spp64 direct+envmap fwd+bwd)",
            flush=True,
        )


def flush_share():
    import tools.profile_bwd_flush as pbf

    pbf.main()


SECTIONS = {
    "ref16": lambda: ref_protocol(16),
    "ref32": lambda: ref_protocol(32),
    "headline": headline,
    "bwdsplit": bwd_split,
    "flush": flush_share,
    "window": direct_window,
    "example": example_workflow,
    "bigmesh": bigmesh_render,
}


def drive(names):
    """Run each section as a SUBPROCESS with a hard timeout, so a tunnel
    death mid-section (which blocks in-process device calls forever) only
    costs that section."""
    import subprocess

    if not wait_tunnel():
        print("tunnel never came up", flush=True)
        return
    for name in names:
        section(name)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-u", __file__, name],
                timeout=2400, text=True, capture_output=True,
            )
            out = (r.stdout or "") + (r.stderr or "")
            print("\n".join(
                ln for ln in out.splitlines() if "WARNING" not in ln
            ), flush=True)
            if r.returncode != 0:
                print(f"section {name} rc={r.returncode}", flush=True)
                if not wait_tunnel(1800):
                    print("tunnel gone; stopping", flush=True)
                    return
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            print(out, flush=True)
            print(f"section {name} TIMED OUT; probing tunnel", flush=True)
            if not wait_tunnel(1800):
                print("tunnel gone; stopping", flush=True)
                return
        print(f"[{name}: {time.time()-t0:.0f} s]", flush=True)


def main():
    args = sys.argv[1:]
    if not args or args[0] == "--driver":
        drive(args[1:] or list(SECTIONS))
        return
    for name in args:
        section(name)
        t0 = time.time()
        try:
            SECTIONS[name]()
        except Exception:  # noqa: BLE001
            traceback.print_exc()
        print(f"[{name}: {time.time()-t0:.0f} s]", flush=True)


if __name__ == "__main__":
    main()
