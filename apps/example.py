"""End-to-end texture optimization demo (reference: /root/reference/example.py).

Renders a ground-truth image of a textured sphere under an environment
light, then recovers the material texture (diffuse RGB + roughness) from
scratch with Adam. The reference's missing assets (empty_workshop_4k.exr,
wood textures) are replaced by procedural equivalents — or supplied via
--material (a PNG/EXR diffuse texture and optional roughness map, loaded
like reference example.py:13-18 with the same **2.2 sRGB->linear mapping)
and --envmap (an equirect EXR). Outputs are written as EXR (HDR images,
diffuse/roughness like reference example.py:92-96) plus PNG previews, via
the built-in EXR codec (zdr_tpu.imageio_exr — this environment has no EXR
backend).

Run:  python apps/example.py [--small] [--material d.png[,r.png]] [--envmap e.exr]
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


def load_material_files(spec: str, tex_res: int) -> jnp.ndarray:
    """Load a ground-truth material from image files, reference
    example.py:13-18 style: 'diffuse.png[,roughness.png]' -> (R, R, 4) with
    sRGB->linear (**2.2) applied to LDR diffuse. Missing roughness map ->
    constant 0.5 (the reference's wood asset carries one; procedural scenes
    may not)."""
    from zdr_tpu.imageio_exr import load_image

    parts = spec.split(",")
    d = load_image(parts[0])[..., :3]
    if not parts[0].lower().endswith(".exr"):
        d = d**2.2
    if len(parts) > 1:
        r = load_image(parts[1])
        r = r[..., 0] if r.ndim == 3 else r
    else:
        r = np.full(d.shape[:2], 0.5, np.float32)
    mat = np.concatenate([d, r[..., None]], axis=-1).astype(np.float32)
    if mat.shape[0] != tex_res:
        # nearest resize to the optimization resolution
        yi = (np.arange(tex_res) * mat.shape[0] / tex_res).astype(int)
        xi = (np.arange(tex_res) * mat.shape[1] / tex_res).astype(int)
        mat = mat[yi][:, xi]
    return jnp.asarray(np.clip(mat, 1e-3, 1.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CI-sized run")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--out", default="results")
    ap.add_argument("--material", default=None,
                    help="GT material images: diffuse.png[,roughness.png]")
    ap.add_argument("--envmap", default=None, help="equirect EXR/PNG envmap")
    args = ap.parse_args()

    if args.small:
        img_res, tex_res, spp_gt, spp_opt, iters = (64, 64), 32, 64, 16, 40
    else:
        img_res, tex_res, spp_gt, spp_opt, iters = (512, 512), 512, 512, 64, 500
    if args.iters:
        iters = args.iters

    scene = Scene([(make_uv_sphere(0.5), None, None)], integrator="direct")
    if args.envmap:
        from zdr_tpu.imageio_exr import load_image

        scene.add_envmap(jnp.asarray(load_image(args.envmap)[..., :3]))
    else:
        scene.add_envmap(make_test_envmap(256, 512))
    scene.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(1.0, 0.0, 0.0),
        target=float3(0.0, 0.0, 0.0),
        up=float3(0.0, 1.0, 0.0),
    )

    if args.material:
        material_gt = load_material_files(args.material, tex_res)
    else:
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

    # EXR outputs (reference example.py:92-96) + PNG previews + the duvdxy
    # footprint AOV (reference example.py:61-67)
    from zdr_tpu.imageio_exr import save_image

    os.makedirs(args.out, exist_ok=True)
    footprint = jnp.abs(
        duvdxy[..., 0] * duvdxy[..., 3] - duvdxy[..., 1] * duvdxy[..., 2]
    )
    for name, arr in [
        ("gt", I_gt[..., :3]),
        ("recon", I[..., :3]),
        ("diffuse", material[..., :3]),
        ("roughness", jnp.repeat(material[..., 3:], 3, axis=-1)),
        ("duvdxy_det", jnp.repeat(footprint[..., None], 3, axis=-1)),
    ]:
        arr = np.asarray(arr)
        save_image(os.path.join(args.out, f"{name}.exr"), arr)
        save_image(os.path.join(args.out, f"{name}.png"), np.clip(arr, 0, 1) ** (1 / 2.2))
    print("wrote EXR + PNG results to", args.out)
    return mse


if __name__ == "__main__":
    main()
