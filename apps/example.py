"""End-to-end texture optimization demo (reference: /root/reference/example.py).

Renders a ground-truth image of a textured sphere under an environment
light, then recovers the material texture (diffuse RGB + roughness) from
scratch with Adam. The reference's missing assets (empty_workshop_4k.exr,
wood textures) are replaced by procedural equivalents.

Run:  python apps/example.py [--small]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.envmap import make_test_envmap
from zdr_tpu.geometry.procedural import make_uv_sphere


def procedural_wood(res: int) -> jnp.ndarray:
    """Procedural wood-like material (diffuse rings + varying roughness),
    standing in for the reference's assets/wood_olive textures."""
    y, x = np.mgrid[0:res, 0:res].astype(np.float64) / res
    r = np.sqrt((x - 0.4) ** 2 + (y - 0.55) ** 2)
    rings = 0.5 + 0.5 * np.sin(r * 60.0 + 2.0 * np.sin(x * 9.0))
    base = np.stack(
        [0.45 + 0.25 * rings, 0.28 + 0.15 * rings, 0.12 + 0.06 * rings], -1
    )
    rough = 0.3 + 0.5 * (1.0 - rings)
    mat = np.concatenate([base, rough[..., None]], -1).astype(np.float32)
    return jnp.asarray(np.clip(mat, 1e-3, 1.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CI-sized run")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--out", default="results")
    args = ap.parse_args()

    if args.small:
        img_res, tex_res, spp_gt, spp_opt, iters = (64, 64), 32, 64, 16, 40
    else:
        img_res, tex_res, spp_gt, spp_opt, iters = (512, 512), 512, 512, 64, 500
    if args.iters:
        iters = args.iters

    scene = Scene([(make_uv_sphere(0.5), None, None)], integrator="direct")
    scene.add_envmap(make_test_envmap(256, 512))
    scene.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(1.0, 0.0, 0.0),
        target=float3(0.0, 0.0, 0.0),
        up=float3(0.0, 1.0, 0.0),
    )

    material_gt = procedural_wood(tex_res)
    print("Image resolution:", img_res, " Texture resolution:", tex_res)

    t0 = time.time()
    I_gt = scene.render(material_gt, res=img_res, spp=spp_gt)
    I_gt.block_until_ready()
    print(f"GT render ({spp_gt} spp): {time.time()-t0:.1f}s")

    # footprint AOV (example.py:61-67)
    duvdxy = scene.render_duvdxy(material_gt, res=img_res, spp=max(spp_opt // 4, 1))
    print("duv/dxy AOV mean |du/dx|:", float(jnp.abs(duvdxy[..., 0]).mean()))

    material = jnp.full((tex_res, tex_res, 4), 0.5, jnp.float32)
    opt = optax.adam(1e-2)
    opt_state = opt.init(material)

    @jax.jit
    def train_step(material, opt_state, seed):
        def loss_fn(m):
            img = scene.render(m, res=img_res, spp=spp_opt, seed=seed)
            return jnp.sum((img - I_gt) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(material)
        updates, opt_state = opt.update(g, opt_state)
        material = optax.apply_updates(material, updates)
        return jnp.clip(material, 1e-3, 1.0), opt_state, loss

    t0 = time.time()
    for it in range(iters):
        material, opt_state, loss = train_step(
            material, opt_state, jnp.asarray(it + 1, jnp.int32)
        )
        if it % max(iters // 10, 1) == 0:
            print(f"iter {it:4d}  loss {float(loss):.4f}")
    print(f"optimized {iters} iters in {time.time()-t0:.1f}s")

    I = scene.render(material, res=img_res, spp=spp_gt)
    mse = float(jnp.mean((I - I_gt) ** 2))
    tex_err = float(jnp.abs(material - material_gt).mean())
    print("final image MSE:", mse, " mean |tex err|:", tex_err)

    os.makedirs(args.out, exist_ok=True)
    for name, arr in [
        ("gt", I_gt), ("recon", I), ("diffuse", material[..., :3]),
        ("roughness", material[..., 3:]),
    ]:
        np.save(os.path.join(args.out, f"{name}.npy"), np.asarray(arr))
    print("wrote results to", args.out)
    return mse


if __name__ == "__main__":
    main()
