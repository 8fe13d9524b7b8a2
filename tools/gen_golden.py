"""Generate golden images for regression tests (run on the CPU backend,
which is what CI uses). Commit the outputs under tests/golden/."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.envmap import make_test_envmap
from zdr_tpu.geometry.procedural import (
    make_cornell_box,
    make_cornell_light,
    make_uv_sphere,
)

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def checker_material(res=16):
    y, x = np.mgrid[0:res, 0:res]
    c = ((x // 4 + y // 4) % 2).astype(np.float32)
    mat = np.stack([0.2 + 0.6 * c, 0.7 - 0.5 * c, 0.4 * np.ones_like(c), 0.3 + 0.4 * c], -1)
    return jnp.asarray(mat)


def scenes():
    cbox = [
        (make_cornell_box(), None, None),
        (make_cornell_light(), None, 15.0),
    ]
    cam_box = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(-0.2, 2.6, -0.5),
        target=float3(-0.2, 2.6, -5.0),
    )
    cam_sphere = Camera(fov=0.8, origin=float3(1.2, 0.2, 0.0), target=float3(0, 0, 0))

    s1 = Scene([(make_uv_sphere(0.5), None, None)], integrator="collocated")
    s1.camera = cam_sphere
    yield "collocated_sphere", s1

    s2 = Scene(cbox, integrator="direct")
    s2.camera = cam_box
    yield "direct_cbox", s2

    s3 = Scene(cbox, integrator="path")
    s3.camera = cam_box
    yield "path_cbox", s3

    s4 = Scene([(make_uv_sphere(0.5), None, None)], integrator="direct")
    s4.add_envmap(make_test_envmap())
    s4.camera = cam_sphere
    yield "direct_env_sphere", s4


def main():
    os.makedirs(OUT, exist_ok=True)
    mat = checker_material()
    for name, scene in scenes():
        img = np.asarray(scene.render(mat, res=(32, 32), spp=16, seed=7))
        np.save(os.path.join(OUT, f"{name}.npy"), img)
        print(name, "mean", img[..., :3].mean())


if __name__ == "__main__":
    main()
