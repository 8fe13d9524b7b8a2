"""Scene API + end-to-end optimization tests (reference example.py workflow)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.geometry.procedural import (
    make_cornell_box,
    make_cornell_light,
    make_quad,
    make_uv_sphere,
)


@pytest.fixture(scope="module")
def sphere_scene():
    s = Scene([(make_uv_sphere(0.5), None, None)], integrator="collocated")
    s.camera = Camera(fov=0.8, origin=float3(1.2, 0.0, 0.0), target=float3(0, 0, 0))
    return s


class TestSceneAPI:
    def test_render_shape_and_alpha(self, sphere_scene):
        mat = jnp.full((8, 8, 4), 0.5)
        img = sphere_scene.render(mat, res=(24, 16), spp=2)
        assert img.shape == (16, 24, 4)
        np.testing.assert_allclose(np.asarray(img[..., 3]), 1.0)

    def test_seed_changes_noise(self, sphere_scene):
        mat = jnp.full((8, 8, 4), 0.5)
        a = sphere_scene.render(mat, res=(16, 16), spp=1, seed=0)
        b = sphere_scene.render(mat, res=(16, 16), spp=1, seed=9)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_spp_reduces_variance(self, sphere_scene):
        mat = jnp.full((8, 8, 4), 0.5)
        ref = np.asarray(sphere_scene.render(mat, res=(16, 16), spp=256, seed=100))
        lo = [np.asarray(sphere_scene.render(mat, res=(16, 16), spp=4, seed=s)) for s in range(3)]
        hi = [np.asarray(sphere_scene.render(mat, res=(16, 16), spp=64, seed=s)) for s in range(3)]
        err_lo = np.mean([(np.abs(x - ref)).mean() for x in lo])
        err_hi = np.mean([(np.abs(x - ref)).mean() for x in hi])
        assert err_hi < err_lo

    def test_emission_scalar_broadcast(self):
        s = Scene(
            [(make_cornell_box(), None, None), (make_cornell_light(), None, 20)],
            integrator="direct",
        )
        np.testing.assert_allclose(np.asarray(s._data.emission[1]), 20.0)
        assert int(s._data.light_count) == 1

    def test_update_lights(self):
        s = Scene(
            [
                (make_cornell_box(), None, None),
                (make_cornell_light(), None, 20),
                (make_quad(0.3), None, None),
            ],
            integrator="direct",
        )
        assert int(s._data.light_count) == 1
        s.update_lights([None, None, 5.0])
        assert int(s._data.light_count) == 1
        assert int(s._data.light_insts[0]) == 2
        np.testing.assert_allclose(np.asarray(s._data.emission[1]), 0.0)
        s.update_lights([None, 20, 5.0])
        assert int(s._data.light_count) == 2

    def test_update_lights_changes_image(self):
        s = Scene(
            [(make_cornell_box(), None, None), (make_cornell_light(), None, 20)],
            integrator="direct",
        )
        s.camera = Camera(
            fov=0.9, origin=float3(-0.2, 2.6, -0.5), target=float3(-0.2, 2.6, -5.0)
        )
        mat = jnp.full((8, 8, 4), 0.5)
        a = np.asarray(s.render(mat, res=(16, 16), spp=16, seed=0))
        s.update_lights([None, 40])
        b = np.asarray(s.render(mat, res=(16, 16), spp=16, seed=0))
        assert b[..., :3].mean() > a[..., :3].mean() * 1.5


class TestOptimization:
    def test_texture_recovery_reduces_loss(self, sphere_scene):
        """Miniature of example.py:75-87: Adam recovers a texture."""
        scene = sphere_scene
        key = jax.random.PRNGKey(1)
        gt = jax.random.uniform(key, (8, 8, 4), minval=0.2, maxval=0.8)
        res, spp = (24, 24), 24
        target = scene.render(gt, res=res, spp=spp, seed=0)

        material = jnp.full((8, 8, 4), 0.5)
        opt = optax.adam(3e-2)
        state = opt.init(material)

        def loss_fn(m, seed):
            img = scene.render(m, res=res, spp=spp, seed=seed)
            return jnp.sum((img - target) ** 2)

        losses = []
        for it in range(30):
            l, g = jax.value_and_grad(loss_fn)(material, it + 1)
            up, state = opt.update(g, state)
            material = optax.apply_updates(material, up)
            material = jnp.clip(material, 1e-3, 1.0)  # example.py:86
            losses.append(float(l))
        assert losses[-1] < 0.5 * losses[0], losses[::6]
