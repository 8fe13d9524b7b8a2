"""Envmap importance-sampling correctness: alias tables, pdf consistency,
direction mapping round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdr_tpu.envmap import (
    SAMPLE_MAP_H,
    SAMPLE_MAP_W,
    build_envmap,
    create_alias_table,
    direction_to_uv,
    env_sampled_light_pdf,
    make_test_envmap,
    sample_envmap,
    uv_to_direction,
)


class TestAliasTable:
    def test_uniform(self):
        prob, alias, pdf = create_alias_table(np.ones(7))
        np.testing.assert_allclose(prob, 1.0)
        np.testing.assert_allclose(pdf, 1 / 7)

    def test_pdf_normalized(self):
        rng = np.random.RandomState(0)
        v = rng.rand(100) * 10
        prob, alias, pdf = create_alias_table(v)
        np.testing.assert_allclose(pdf.sum(), 1.0, rtol=1e-5)
        np.testing.assert_allclose(pdf, v / v.sum(), rtol=1e-5)

    def test_sampling_distribution(self):
        """Drawing via the alias table reproduces the target distribution."""
        v = np.array([1.0, 0.0, 3.0, 6.0])
        prob, alias, pdf = create_alias_table(v)
        n = 200_000
        rng = np.random.RandomState(1)
        u = rng.rand(n) * 4
        i = np.minimum(u.astype(int), 3)
        ur = u - np.floor(u)
        take_self = ur < prob[i]
        picked = np.where(take_self, i, alias[i])
        counts = np.bincount(picked, minlength=4) / n
        np.testing.assert_allclose(counts, pdf, atol=5e-3)

    def test_zero_distribution(self):
        prob, alias, pdf = create_alias_table(np.zeros(5))
        np.testing.assert_allclose(pdf, 0.2)


class TestDirectionMapping:
    def test_roundtrip(self):
        key = jax.random.PRNGKey(0)
        uv = jax.random.uniform(key, (512, 2), minval=0.01, maxval=0.99)
        d = uv_to_direction(uv)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5
        )
        uv2 = direction_to_uv(d)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-4)

    def test_poles(self):
        up = uv_to_direction(jnp.array([[0.5, 0.0]]))
        np.testing.assert_allclose(float(up[0, 1]), 1.0, atol=1e-5)


class TestEnvSampling:
    @pytest.fixture(scope="class")
    def env(self):
        return build_envmap(make_test_envmap(), compensate_mis=False)

    def test_pdf_consistency(self, env):
        """env_sampled_light_pdf(direction sampled by sample_envmap) must
        equal the pdf sample_envmap reported."""
        key = jax.random.PRNGKey(2)
        u2 = jax.random.uniform(key, (4096, 2))
        wi, dist, pdf, rad = sample_envmap(env, u2)
        pdf2 = env_sampled_light_pdf(env, wi)
        a, b = np.asarray(pdf), np.asarray(pdf2)
        ok = np.isfinite(a) & (a > 0)
        # uv->direction->uv roundtrip can cross a texel boundary for a tiny
        # fraction of samples; the bulk must agree exactly
        frac_equal = np.mean(np.abs(a[ok] - b[ok]) <= 1e-3 * np.abs(a[ok]))
        assert frac_equal > 0.97, frac_equal

    def test_pdf_integrates_to_one(self, env):
        """MC estimate of ∫ pdf dω over the sphere ≈ 1 (uniform directions)."""
        key = jax.random.PRNGKey(3)
        d = jax.random.normal(key, (200_000, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pdf = np.asarray(env_sampled_light_pdf(env, d))
        est = pdf.mean() * 4 * np.pi
        assert abs(est - 1.0) < 0.05, est

    def test_importance_matches_luminance(self, env):
        """Sampled directions concentrate where the sky is bright (the sun
        blob of make_test_envmap at uv ~ (0.3, 0.3))."""
        key = jax.random.PRNGKey(4)
        u2 = jax.random.uniform(key, (8192, 2))
        wi, _, _, _ = sample_envmap(env, u2)
        uv = np.asarray(direction_to_uv(wi))
        near_sun = (np.abs(uv[:, 0] - 0.3) < 0.1) & (np.abs(uv[:, 1] - 0.3) < 0.1)
        # the sun window is 2% of the square but should catch ~18% of
        # samples (measured; far above the uniform 2%)
        assert near_sun.mean() > 0.12, near_sun.mean()

    def test_mis_compensation_flattens(self):
        env_plain = build_envmap(make_test_envmap(), compensate_mis=False)
        env_comp = build_envmap(make_test_envmap(), compensate_mis=True)
        key = jax.random.PRNGKey(5)
        u2 = jax.random.uniform(key, (8192, 2))
        wi_c, _, _, _ = sample_envmap(env_comp, u2)
        uv_c = np.asarray(direction_to_uv(wi_c))
        near_sun_c = (np.abs(uv_c[:, 0] - 0.3) < 0.1) & (np.abs(uv_c[:, 1] - 0.3) < 0.1)
        wi_p, _, _, _ = sample_envmap(env_plain, u2)
        uv_p = np.asarray(direction_to_uv(wi_p))
        near_sun_p = (np.abs(uv_p[:, 0] - 0.3) < 0.1) & (np.abs(uv_p[:, 1] - 0.3) < 0.1)
        # compensation subtracts the flat base -> sun gets a larger share
        assert near_sun_c.mean() > near_sun_p.mean()
