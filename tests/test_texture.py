"""Texture fetch/scatter tests: addressing parity and gather/scatter adjointness."""

import jax
import jax.numpy as jnp
import numpy as np

from zdr_tpu.texture import read_bsdf, write_bsdf_grad


def checker(h, w):
    y, x = np.mgrid[0:h, 0:w]
    base = ((x + y) % 2).astype(np.float32)
    return jnp.asarray(np.stack([base, 1 - base, base * 0.5, base * 0.25 + 0.5], -1))


class TestReadBsdf:
    def test_texel_centers_exact(self):
        h = w = 8
        tex = checker(h, w)
        # uv hitting texel (x, y) exactly: u = x/(w-1), v = 1 - y/(h-1)
        xs, ys = np.mgrid[0:w, 0:h]
        u = xs.flatten() / (w - 1)
        v = 1.0 - ys.flatten() / (h - 1)
        uv = jnp.asarray(np.stack([u, v], -1).astype(np.float32))
        vals = read_bsdf(uv, tex)
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(tex)[ys.flatten(), xs.flatten()], atol=1e-6
        )

    def test_bilinear_midpoint(self):
        tex = jnp.zeros((2, 2, 4)).at[0, 0].set(1.0)
        # u=v=0.5 is the center of the 2x2 grid -> average = 0.25
        val = read_bsdf(jnp.array([[0.5, 0.5]]), tex)
        np.testing.assert_allclose(np.asarray(val[0]), 0.25, atol=1e-6)

    def test_clamp_outside(self):
        tex = checker(4, 4)
        v1 = read_bsdf(jnp.array([[-0.5, 0.5]]), tex)
        v2 = read_bsdf(jnp.array([[0.0, 0.5]]), tex)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


class TestAdjointness:
    def test_write_equals_vjp(self):
        """Hand-written scatter == JAX's transpose of the gather."""
        h = w = 16
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        tex = jax.random.uniform(k1, (h, w, 4))
        uv = jax.random.uniform(k2, (64, 2))
        ct = jax.random.normal(k3, (64, 4))

        _, vjp = jax.vjp(lambda m: read_bsdf(uv, m), tex)
        (auto,) = vjp(ct)
        manual = write_bsdf_grad(uv, ct, jnp.zeros((h, w, 4)))
        np.testing.assert_allclose(np.asarray(auto), np.asarray(manual), atol=1e-5)

    def test_duplicate_uv_accumulates(self):
        uv = jnp.tile(jnp.array([[0.25, 0.75]]), (100, 1))
        d = write_bsdf_grad(uv, jnp.ones((100, 4)), jnp.zeros((8, 8, 4)))
        np.testing.assert_allclose(float(d.sum()), 400.0, rtol=1e-5)
