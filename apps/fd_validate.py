"""Finite-difference vs AD gradient validator (CLI).

Port of /root/reference/fd_validate.py's protocol: pick an (image pixel,
texel) pair by importance (brightest non-light pixel, largest |grad| texel,
roughness channel forced with p=0.5), then print the FD and AD estimates of
dI[imgidx]/dmaterial[texidx] for spp = 1..2^max_exp across 5 fixed seeds.
"Good if values in the last rows of AD and FD are similar."

The deterministic pytest version of this gate lives in
tests/test_fd_validate.py; this CLI reproduces the reference's sweep output
for eyeball comparison.

Run:  python apps/fd_validate.py [--integrator path] [--max-exp 8]
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light

SEEDS = [0, 12345, 853402567, 19260817, 948377263]  # fd_validate.py:97
FD_EPS = 0.01


def make_scene(integrator: str) -> Scene:
    s = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator=integrator,
    )
    s.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(-0.2, 2.6, -0.5),
        target=float3(-0.2, 2.6, -5.0),
    )
    return s


def pixel_grad(scene, material, imgidx, res, spp, seed):
    def f(m):
        return scene.render(m, res=res, spp=spp, seed=seed)[imgidx]

    return jax.grad(f)(material)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--integrator", default="path")
    ap.add_argument("--max-exp", type=int, default=8)
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--tex", type=int, default=48)
    args = ap.parse_args()
    res = (args.res, args.res)

    scene = make_scene(args.integrator)
    key = jax.random.PRNGKey(0)
    material = jax.random.uniform(key, (args.tex, args.tex, 4), minval=0.25, maxval=0.75)

    # --- select (imgidx, texidx) by importance (fd_validate.py:151-178)
    probe_spp = 64
    img = scene.render(material, res=res, spp=probe_spp, seed=0)
    black = jnp.zeros_like(material).at[..., 3].set(1.0)
    img_black = scene.render(black, res=res, spp=probe_spp, seed=0)
    weight = np.asarray(img[..., :3]).copy()
    light_mask = np.all(np.asarray(img) == np.asarray(img_black), axis=-1)
    weight[light_mask] = 0.0
    flat = weight.reshape(-1)
    imgflat = int(np.argmax(flat))
    imgidx = np.unravel_index(imgflat, weight.shape)
    print("Image index:", imgidx, " brightness:", float(img[imgidx]))

    g = np.asarray(pixel_grad(scene, material, imgidx, res, 64, 0))
    try_roughness = random.Random(0).random() < 0.5
    ch = 3 if try_roughness else None
    if ch is not None:
        gc = np.abs(g[..., ch])
        texidx = np.unravel_index(int(np.argmax(gc)), gc.shape) + (ch,)
    else:
        texidx = np.unravel_index(int(np.argmax(np.abs(g))), g.shape)
    print("Texture index:", texidx, " grad:", float(g[texidx]))
    if float(material[texidx]) < FD_EPS or float(material[texidx]) > 1 - FD_EPS:
        raise RuntimeError("material too close to boundary, can not FD")

    print("\nIncreasing spp, 5 seeds each (fd_validate.py:96-114)")
    print("FD:")
    for e in range(args.max_exp + 1):
        spp = 2**e
        row = []
        for seed in SEEDS:
            m0 = material.at[texidx].add(-FD_EPS)
            m1 = material.at[texidx].add(FD_EPS)
            i0 = float(scene.render(m0, res=res, spp=spp, seed=seed)[imgidx])
            i1 = float(scene.render(m1, res=res, spp=spp, seed=seed)[imgidx])
            row.append((i1 - i0) / (2 * FD_EPS))
        print(" ".join(f"{v:0.6f}" for v in row))
    print("AD:")
    for e in range(args.max_exp + 1):
        spp = 2**e
        row = [
            float(pixel_grad(scene, material, imgidx, res, spp, seed)[texidx])
            for seed in SEEDS
        ]
        print(" ".join(f"{v:0.6f}" for v in row))
    print("good if values in the last rows of AD and FD are similar")


if __name__ == "__main__":
    main()
