"""Texture fetch/scatter tests: addressing parity and gather/scatter adjointness."""

import jax
import pytest
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

    def test_nearest_vjp_matches_naive(self):
        """The sorted-pipeline bwd of the NEAREST fetch == XLA's duplicate
        scatter-add (the two branches of _read_bsdf_bwd route through the
        same segment pipeline; this pins the bilinear=False one)."""
        h = w = 16
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        tex = jax.random.uniform(k1, (h, w, 4))
        uv = jax.random.uniform(k2, (256, 2))
        ct = jax.random.normal(k3, (256, 4))

        _, vjp = jax.vjp(lambda m: read_bsdf(uv, m, bilinear=False), tex)
        (auto,) = vjp(ct)

        x = jnp.clip((uv[:, 0] * (w - 1) + 0.4999).astype(jnp.int32), 0, w - 1)
        y = jnp.clip(((1.0 - uv[:, 1]) * (h - 1) + 0.4999).astype(jnp.int32),
                     0, h - 1)
        naive = jnp.zeros((h, w, 4)).at[y, x].add(ct)
        np.testing.assert_allclose(np.asarray(auto), np.asarray(naive),
                                   atol=1e-5)
        # gradient sum is conserved regardless of duplicates
        np.testing.assert_allclose(float(auto.sum()), float(ct.sum()),
                                   rtol=1e-5)

    @pytest.mark.parametrize("bilinear", [True, False])
    def test_batched_uv_vjp(self, bilinear):
        """uv with extra leading dims (e.g. an image-shaped UV grid) must
        differentiate: the segment pipeline is 1-D, so the bwd flattens.
        Gradient == the flattened equivalent."""
        h = w = 8
        key = jax.random.PRNGKey(7)
        k1, k2, k3 = jax.random.split(key, 3)
        tex = jax.random.uniform(k1, (h, w, 4))
        uv = jax.random.uniform(k2, (3, 5, 2))
        ct = jax.random.normal(k3, (3, 5, 4))

        _, vjp = jax.vjp(lambda m: read_bsdf(uv, m, bilinear=bilinear), tex)
        (batched,) = vjp(ct)
        _, vjp_f = jax.vjp(
            lambda m: read_bsdf(uv.reshape(-1, 2), m, bilinear=bilinear), tex
        )
        (flat,) = vjp_f(ct.reshape(-1, 4))
        np.testing.assert_allclose(np.asarray(batched), np.asarray(flat),
                                   atol=1e-6)
        np.testing.assert_allclose(float(batched.sum()), float(ct.sum()),
                                   rtol=1e-5)


class TestCompactedScatter:
    """segment_scatter_add4: the compacted/packed PRB flush pipeline
    (sortA -> cumsum -> sortB -> consecutive-diff totals -> .set scatter)."""

    def _ref(self, ids, chans, nb):
        from zdr_tpu.texture import segment_scatter_add

        return np.asarray(
            segment_scatter_add(
                jnp.asarray(ids), [jnp.asarray(c) for c in chans], nb,
                channel_major=True,
            )
        )

    @pytest.mark.parametrize("case", ["random", "same", "masked", "overflow"])
    def test_exact_matches_ff_pipeline(self, case):
        from zdr_tpu.texture import segment_scatter_add4

        rng = np.random.default_rng(7)
        nb, m = 128, 500
        if case == "same":
            ids = np.zeros(m, np.int32)
        elif case == "overflow":
            # every entry a distinct texel: uniques exceed the k_compact
            # head, forcing the lax.cond tail branch
            ids = (np.arange(m, dtype=np.int32) * 13) % nb
        else:
            ids = rng.integers(0, nb, m).astype(np.int32)
        chans = [rng.standard_normal(m).astype(np.float32) for _ in range(4)]
        if case == "masked":
            # sentinel id nb marks dropped entries; the ff reference gets
            # the same entries with zero values at a real id instead
            mask = rng.random(m) < 0.5
            ids = np.where(mask, nb, ids)
            chans = [np.where(mask, 0.0, c).astype(np.float32) for c in chans]
        ref = self._ref(np.where(ids == nb, 0, ids), [np.where(ids == nb, 0, c) for c in chans], nb)
        out = np.asarray(
            segment_scatter_add4(
                jnp.asarray(ids), [jnp.asarray(c) for c in chans], nb,
                packed=False,
            )
        )
        if case == "masked":
            # sentinel routing moves the zero entries to the end of the
            # sorted stream; XLA's parallel-prefix cumsum then regroups the
            # same values differently -> last-ulp differences only
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)
        else:
            np.testing.assert_array_equal(out, ref)

    def test_packed_within_bf16(self):
        from zdr_tpu.texture import segment_scatter_add4

        rng = np.random.default_rng(8)
        nb, m = 64, 400
        ids = rng.integers(0, nb, m).astype(np.int32)
        chans = [rng.standard_normal(m).astype(np.float32) for _ in range(4)]
        ref = self._ref(ids, chans, nb)
        out = np.asarray(
            segment_scatter_add4(
                jnp.asarray(ids), [jnp.asarray(c) for c in chans], nb,
                packed=True,
            )
        )
        scale = np.abs(ref).max()
        assert np.abs(out - ref).max() <= 0.01 * scale

    def test_prepacked_matches_packed(self):
        """prepacked=True (bf16 pairs packed at emission, 3-operand first
        sort) agrees with the packed flush to the same bf16 error class,
        including sentinel-masked entries and the overflow tail."""
        from zdr_tpu.texture import pack_bf16_pair, segment_scatter_add4

        rng = np.random.default_rng(11)
        nb, m = 64, 400
        ids = rng.integers(0, nb, m).astype(np.int32)
        ids[rng.random(m) < 0.3] = nb  # sentinel-masked entries
        chans = [rng.standard_normal(m).astype(np.float32) for _ in range(4)]
        ref = self._ref(
            np.where(ids == nb, 0, ids),
            [np.where(ids == nb, 0, c) for c in chans],
            nb,
        )
        j = [jnp.asarray(c) for c in chans]
        out = np.asarray(
            segment_scatter_add4(
                jnp.asarray(ids),
                [pack_bf16_pair(j[0], j[1]), pack_bf16_pair(j[2], j[3])],
                nb,
                packed=True,
                prepacked=True,
            )
        )
        scale = np.abs(ref).max()
        assert np.abs(out - ref).max() <= 0.02 * scale
        # overflow tail: all-distinct ids with k_compact below the uniques
        ids2 = ((np.arange(m, dtype=np.int32) * 13) % nb).astype(np.int32)
        ref2 = self._ref(ids2, chans, nb)
        out2 = np.asarray(
            segment_scatter_add4(
                jnp.asarray(ids2),
                [pack_bf16_pair(j[0], j[1]), pack_bf16_pair(j[2], j[3])],
                nb,
                k_compact=16,
                packed=True,
                prepacked=True,
            )
        )
        assert np.abs(out2 - ref2).max() <= 0.02 * np.abs(ref2).max()
