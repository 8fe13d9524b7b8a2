"""Parity checks against the reference's real OBJ assets (skipped when the
reference checkout is absent). Renders the actual Cornell-box scene from
/root/reference/assets with the reference's own camera (example.py:28-33)
and gates gradients through the FD check."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdr_tpu import Camera, Scene, float3

ASSETS = "/root/reference/assets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="reference assets unavailable"
)


@pytest.fixture(scope="module")
def cbox_scene():
    scene = Scene(
        [
            (os.path.join(ASSETS, "cboxuv.obj"), None, None),
            (os.path.join(ASSETS, "cbox-light.obj"), None, float3(17, 12, 4)),
        ],
        integrator="path",
    )
    scene.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(-0.2, 2.6, 6.0),
        target=float3(-0.2, 2.6, -2.5),
        up=float3(0.0, 1.0, 0.0),
    )
    return scene


class TestCboxAssets:
    def test_renders_lit_colored(self, cbox_scene):
        mat = jnp.full((32, 32, 4), 0.6)
        img = np.asarray(cbox_scene.render(mat, res=(48, 48), spp=24, seed=0))
        assert np.isfinite(img).all()
        assert img[..., :3].mean() > 0.02
        # the light panel region (top middle) should be much brighter
        assert img[..., :3].max() > 1.0

    def test_emission_color_passthrough(self, cbox_scene):
        # light pixels show the (17, 12, 4) emission -> red > green > blue
        mat = jnp.full((16, 16, 4), 0.5)
        img = np.asarray(cbox_scene.render(mat, res=(64, 64), spp=8, seed=0))
        bright = img[..., :3].max(axis=-1) > 5.0
        assert bright.any(), "no directly visible light pixels"
        px = img[bright]
        assert (px[:, 0] > px[:, 1]).all() and (px[:, 1] > px[:, 2]).all()

    def test_fd_gradient(self, cbox_scene):
        key = jax.random.PRNGKey(0)
        material = jax.random.uniform(key, (24, 24, 4), minval=0.25, maxval=0.75)

        # real cbox has more GI variance than the procedural box: FD noise
        # is amplified 1/(2 eps) = 50x, so use higher spp + looser rtol
        # (measured convergence: FD 3.91 @128spp -> 3.55 @512spp vs AD 3.31)
        def loss(m, spp=256):
            return jnp.sum(cbox_scene.render(m, res=(40, 40), spp=spp, seed=3)[..., :3])

        g = np.asarray(jax.grad(loss)(material))
        ti = np.unravel_index(np.argmax(np.abs(g)), g.shape)
        ad = float(g[ti])
        eps = 0.01
        fd = (
            float(loss(material.at[ti].add(eps)))
            - float(loss(material.at[ti].add(-eps)))
        ) / (2 * eps)
        assert abs(ad) > 1e-6
        assert abs(ad - fd) <= 0.2 * max(abs(ad), abs(fd)), (ad, fd)

    def test_uvgrad_on_assets(self, cbox_scene):
        mat = jnp.full((16, 16, 4), 0.5)
        g = np.asarray(cbox_scene.render_duvdxy(mat, res=(32, 32), spp=4))
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0


class TestSphereAsset:
    def test_sphere_obj_collocated(self):
        scene = Scene([("/root/reference/sphere.obj", None, None)], integrator="collocated")
        scene.camera = Camera(
            fov=50 / 180 * 3.1415926, origin=float3(1.0, 0.0, 0.0), target=float3(0, 0, 0)
        )
        mat = jnp.full((16, 16, 4), 0.5)
        img = np.asarray(scene.render(mat, res=(32, 32), spp=8, seed=0))
        assert np.isfinite(img).all()
        assert img[16, 16, :3].mean() > 0.05  # sphere fills view center
