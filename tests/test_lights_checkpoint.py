"""Point lights + checkpoint/resume tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.checkpoint import load_checkpoint, save_checkpoint
from zdr_tpu.geometry.procedural import make_uv_sphere


class TestPointLights:
    @pytest.fixture(scope="class")
    def scene(self):
        s = Scene([(make_uv_sphere(0.5), None, None)], integrator="direct")
        s.add_point_light((2.0, 0.0, 0.0), 10.0)
        s.camera = Camera(fov=0.8, origin=float3(1.5, 0.8, 0.0), target=float3(0, 0, 0))
        return s

    def test_lit_from_light_side(self, scene):
        mat = jnp.full((8, 8, 4), 0.5)
        img = np.asarray(scene.render(mat, res=(32, 32), spp=16, seed=0))
        assert np.isfinite(img).all()
        assert img[..., :3].mean() > 0.01

    def test_inverse_square_falloff(self):
        # one quad facing +y, point light above the center: radiance at the
        # center pixel ~ I * brdf / r^2 ... check doubling distance quarters it
        from zdr_tpu.geometry.procedural import make_quad

        vals = []
        for h in [1.0, 2.0]:
            s = Scene([(make_quad(4.0), None, None)], integrator="direct")
            s.add_point_light((0.0, h, 0.0), 10.0)
            s.camera = Camera(
                fov=0.3, origin=float3(0, 0.5, 0), target=float3(0, 0, 0), up=float3(0, 0, -1)
            )
            mat = jnp.full((8, 8, 4), 0.5)
            img = np.asarray(s.render(mat, res=(16, 16), spp=64, seed=0))
            vals.append(img[8, 8, 0])
        # cosine is 1 both times; the raw falloff would give 4x, but the
        # reference-faithful estimator applies the balanced heuristic to
        # delta lights too (direct.py:50-53 computes MIS for every light
        # sample), which scales each measurement by pdf/(pdf+pdf_bsdf) with
        # pdf = r^2: measured ratio = 4 * mis(r=1)/mis(r=2) ~ 2.7.
        ratio = vals[0] / max(vals[1], 1e-9)
        assert 2.2 < ratio < 4.2, (vals, ratio)

    def test_gradient_flows(self, scene):
        mat = jnp.full((8, 8, 4), 0.5)

        def loss(m):
            return jnp.sum(scene.render(m, res=(16, 16), spp=8, seed=0)[..., :3])

        g = jax.grad(loss)(mat)
        assert float(jnp.abs(g).sum()) > 0
        assert np.isfinite(np.asarray(g)).all()


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        material = jnp.full((8, 8, 4), 0.3)
        opt = optax.adam(1e-2)
        state = opt.init(material)
        # take one update so the state is nontrivial
        g = jnp.ones_like(material)
        up, state = opt.update(g, state)
        material = optax.apply_updates(material, up)

        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, material, state, step=17, extra={"loss": 1.25})
        m2, s2, step, extras = load_checkpoint(path, opt.init(material))
        np.testing.assert_array_equal(np.asarray(m2), np.asarray(material))
        assert step == 17
        assert float(extras["loss"]) == 1.25
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_training_identical(self, tmp_path):
        """Save at step k, resume, and check the next update matches an
        uninterrupted run."""
        opt = optax.adam(1e-2)

        def run(n, material, state, start=0):
            for i in range(start, start + n):
                g = jnp.sin(material * (i + 1))  # deterministic pseudo-grads
                up, state = opt.update(g, state)
                material = optax.apply_updates(material, up)
            return material, state

        m0 = jnp.full((4, 4, 4), 0.5)
        s0 = opt.init(m0)
        m_full, _ = run(6, m0, s0)

        m3, s3 = run(3, m0, s0)
        path = str(tmp_path / "c.npz")
        save_checkpoint(path, m3, s3, step=3)
        m3r, s3r, step, _ = load_checkpoint(path, opt.init(m0))
        m_resumed, _ = run(3, m3r, s3r, start=step)
        np.testing.assert_allclose(np.asarray(m_resumed), np.asarray(m_full), atol=1e-7)
