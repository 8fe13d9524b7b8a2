"""Light-stage material capture workload.

Reference: /root/reference/test_lightstage.py — an object surrounded by many
individually switchable area lights (quads placed on a Fibonacci sphere via
rotation matrices), rendered under different light configurations via
`update_lights`. The missing bunnyuv.obj is replaced by the procedural UV
sphere; lightstage/l*.obj quads are generated with the same rotate-matrix
construction.

Also demonstrates the batched multi-light recovery workflow (BASELINE.json
config #5): render GT under several light patterns, then jointly optimize
the texture from all of them.

Run:  python apps/lightstage.py [--small]
"""

from __future__ import annotations

import argparse
import os
import sys
from math import acos, cos, pi, sin

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere


def rotate_mat(theta: float, phi: float, offset) -> np.ndarray:
    """Pitch-then-yaw-then-translate 4x4 (test_lightstage.py:24-45)."""
    pitch = np.array(
        [
            [cos(theta), -sin(theta), 0, 0],
            [sin(theta), cos(theta), 0, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ]
    )
    yaw = np.array(
        [
            [cos(phi), 0, -sin(phi), 0],
            [0, 1, 0, 0],
            [sin(phi), 0, cos(phi), 0],
            [0, 0, 0, 1],
        ]
    )
    translate = np.eye(4)
    translate[:3, 3] = offset
    return yaw @ pitch @ translate


def build_lightstage(n_lights: int = 30, emission: float = 50.0) -> Scene:
    """Object + n quads distributed on a golden-angle sphere shell."""
    models = [(make_uv_sphere(0.35), rotate_mat(0, -0.4, (0, 0, 0)), None)]
    # quad at y=-2 with its +y normal: after the pitch/yaw rotation it sits
    # on a radius-2 shell facing the object at the origin
    quad = make_quad(0.18, y=-2.0)
    for i in range(n_lights):
        theta = acos((i + 0.5) / n_lights * 2 - 1)
        phi = pi * 2 * 0.618 * (i + 1)
        models.append((quad, rotate_mat(theta, phi, (0.0, 0.0, 0.0)), emission))
    return Scene(models, integrator="direct")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument(
        "--batched",
        action="store_true",
        help="shard the light patterns over the device mesh "
        "(parallel.render_batch): every iteration renders ALL patterns, "
        "one per device group, and steps on the joint loss",
    )
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument(
        "--tex", type=int, default=None,
        help="texture side override (coarser = more gradient signal per "
        "texel: the CI convergence gate uses 8)",
    )
    args = ap.parse_args()
    n_lights = 10 if args.small else 30
    res = (48, 48) if args.small else (512, 512)
    spp = 16 if args.small else 256
    iters = args.iters if args.iters else (20 if args.small else 200)

    scene = build_lightstage(n_lights)
    scene.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(0, 0.5, 2),
        target=float3(0, 0, 0),
        up=float3(0.0, 1.0, 0.0),
    )

    key = jax.random.PRNGKey(5)
    tex = args.tex if args.tex else (32 if args.small else 256)
    material_gt = jax.random.uniform(key, (tex, tex, 4), minval=0.2, maxval=0.8)

    # GT views: one render per light pattern (update_lights switching,
    # render.py:130-148 workflow). Off-light policy differs by mode:
    # - sequential: None — update_lights STRUCTURALLY removes the light
    #   (the reference workflow; NEE only samples the on-lights)
    # - batched: epsilon emission — render_batch shares ONE static light
    #   structure for the whole batch (the fused kernels' light table is
    #   compile-time static), so off lights stay in the table at ~zero
    #   value. Display parity: the reference shows any non-first instance
    #   by its emission, so an off light reads black there too. With
    #   matching eps patterns the two modes are bit-identical
    #   (tests/test_apps.py parity test); with None-off they legitimately
    #   differ in NEE sampling (pdf spans all table lights) and off-quad
    #   display (emission-black vs surface-shaded).
    OFF = 1e-6 if args.batched else None
    patterns = []
    n_pat = 4 if args.small else 8
    rng = np.random.RandomState(0)
    for p in range(n_pat):
        on = rng.choice(n_lights, max(n_lights // 4, 1), replace=False)
        em = [None] + [50.0 if i in on else OFF for i in range(n_lights)]
        patterns.append(em)

    mesh = None
    if args.batched:
        # the multi-view/multi-light DCN story (SURVEY §5): every pattern
        # renders concurrently, batch sharded over the device mesh, with
        # the gradient summed across views by the batched vjp
        from zdr_tpu.parallel import make_mesh, render_batch

        n_dev = len(jax.devices())
        fit = max(d for d in range(1, min(n_dev, n_pat) + 1) if n_pat % d == 0)
        mesh = make_mesh(fit)
        print(f"batched mode: {n_pat} patterns over a {fit}-device mesh")

    def render_all(m, seed0):
        """(n_pat, H, W, 4) — one frame per pattern, batched or sequential
        (identical per-view sampling either way up to the seed policy)."""
        if mesh is not None:
            return render_batch(
                scene, m, scene.camera, patterns, res=res, spp=spp,
                seed=seed0, mesh=mesh,
            )
        outs = []
        for p, em in enumerate(patterns):
            scene.update_lights(em)
            outs.append(
                scene.render(m, res=res, spp=spp, seed=seed0 + 7919 * p)
            )
        return jnp.stack(outs)

    if args.batched:
        targets = render_all(material_gt, 0)
        for p in range(n_pat):
            m = float(targets[p, ..., :3].mean())
            print(f"pattern {p}: mean {m:.4f}")
            assert m > 1e-4, "light pattern renders black — lights misconfigured"
    else:
        targets = []
        for p, em in enumerate(patterns):
            scene.update_lights(em)
            tgt = scene.render(material_gt, res=res, spp=spp, seed=p)
            targets.append(tgt)
            m = float(tgt[..., :3].mean())
            print(f"pattern {p}: mean {m:.4f}")
            assert m > 1e-4, "light pattern renders black — lights misconfigured"
        targets = jnp.stack(targets)

    # joint recovery across patterns
    material = jnp.full((tex, tex, 4), 0.5, jnp.float32)
    opt = optax.adam(2e-2)
    opt_state = opt.init(material)
    losses = []
    for it in range(iters):
        if args.batched:
            # all patterns per step: the loss/grad average over the batch
            def loss_fn(m):
                imgs = render_all(m, 100 + it * 104729)
                return jnp.sum((imgs - targets) ** 2) / n_pat

            loss, g = jax.value_and_grad(loss_fn)(material)
            tag = "all"
        else:
            p = it % n_pat
            scene.update_lights(patterns[p])

            def loss_fn(m):
                img = scene.render(m, res=res, spp=spp, seed=100 + it)
                return jnp.sum((img - targets[p]) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(material)
            tag = str(p)
        updates, opt_state = opt.update(g, opt_state)
        material = optax.apply_updates(material, updates)
        material = jnp.clip(material, 1e-3, 1.0)
        losses.append(float(loss))
        if it % max(iters // 10, 1) == 0:
            print(f"iter {it:3d} pattern {tag} loss {float(loss):.6f}")

    err = float(jnp.abs(material - material_gt).mean())
    err_diffuse = float(jnp.abs(material - material_gt)[..., :3].mean())
    err0_diffuse = float(jnp.abs(0.5 - material_gt)[..., :3].mean())
    first = float(np.mean(losses[:n_pat]))
    last = float(np.mean(losses[-n_pat:]))
    # MC noise floor of the loss: rendering the TRUE material against the
    # (noisy, other-seed) targets. With low-discrepancy sampling (pmj02bn
    # default) the floor dominates small CI-sized losses, so convergence
    # must be judged on the excess above it, not the raw ratio.
    if args.batched:
        imgs = render_all(material_gt, 5000 * 104729)
        floor = float(jnp.sum((imgs - targets) ** 2)) / n_pat
    else:
        floors = []
        for p, em in enumerate(patterns):
            scene.update_lights(em)
            img = scene.render(material_gt, res=res, spp=spp, seed=5000 + p)
            floors.append(float(jnp.sum((img - targets[p]) ** 2)))
        floor = float(np.mean(floors))
    print(
        f"loss {first:.4f} -> {last:.4f} (noise floor {floor:.4f})  "
        f"mean |tex err| {err:.4f}"
    )
    return {
        "loss_first": first,
        "loss_last": last,
        "noise_floor": floor,
        "tex_err": err,
        "tex_err_diffuse": err_diffuse,
        "tex_err0_diffuse": err0_diffuse,
    }


if __name__ == "__main__":
    main()
