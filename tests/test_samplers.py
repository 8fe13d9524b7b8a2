"""Sampler tests: uniformity, determinism, hash semantics.

Replaces the reference's eyeballed scatter plots (test_sampler.py) with
numerical checks (SURVEY.md §4 suggests chi-square)."""

import jax.numpy as jnp
import pytest
import numpy as np

from zdr_tpu.samplers import make_sampler
from zdr_tpu.samplers.hashes import (
    next_pow2_mask,
    permutation_element,
    xxhash32_4,
)


def chi2_uniform(samples: np.ndarray, bins: int = 16) -> float:
    """Return chi-square statistic per dof for U[0,1) samples."""
    hist, _ = np.histogram(samples, bins=bins, range=(0, 1))
    expected = len(samples) / bins
    return float(((hist - expected) ** 2 / expected).sum() / (bins - 1))


class TestHashes:
    def test_xxhash_deterministic_and_spread(self):
        n = 10000
        x = jnp.arange(n, dtype=jnp.uint32)
        h1 = np.asarray(xxhash32_4(x, x * 7, x * 13, x * 31))
        h2 = np.asarray(xxhash32_4(x, x * 7, x * 13, x * 31))
        np.testing.assert_array_equal(h1, h2)
        # roughly uniform over uint32
        u = h1.astype(np.float64) / 2**32
        assert chi2_uniform(u) < 2.0

    def test_permutation_is_bijection(self):
        for spp in [7, 16, 64, 100]:
            w = next_pow2_mask(spp)
            i = jnp.arange(spp, dtype=jnp.uint32)
            p = jnp.full((spp,), 0xDEADBEEF, dtype=jnp.uint32)
            out = np.asarray(
                permutation_element(i, jnp.full((spp,), spp, jnp.uint32), jnp.full((spp,), w, jnp.uint32), p)
            )
            assert sorted(out.tolist()) == list(range(spp)), spp

    def test_next_pow2_mask(self):
        assert next_pow2_mask(1) == 0
        assert next_pow2_mask(2) == 1
        assert next_pow2_mask(3) == 3
        assert next_pow2_mask(64) == 63
        assert next_pow2_mask(65) == 127


class TestLCG:
    def _samples(self, kind="lcg", n=50000, dims=4):
        pixel = jnp.stack(
            [jnp.arange(n, dtype=jnp.int32) % 512, jnp.arange(n, dtype=jnp.int32) // 512],
            axis=-1,
        )
        s = make_sampler(kind, pixel, seed=7, spp=16, sample_index=3)
        out = []
        for _ in range(dims // 2):
            u, s = s.next2()
            out.append(u)
        return np.asarray(jnp.concatenate(out, axis=-1))

    def test_range_and_uniform(self):
        u = self._samples()
        assert u.min() >= 0.0 and u.max() < 1.0
        # chi2/dof for 15 dof: mean 1, sd 0.37; 3.0 is ~5 sigma — catches
        # broken hashing without flaking on unlucky seeds.
        for d in range(u.shape[1]):
            assert chi2_uniform(u[:, d]) < 3.0, d

    def test_decorrelated_across_pixels(self):
        u = self._samples()
        c = np.corrcoef(u[:-1, 0], u[1:, 0])[0, 1]
        assert abs(c) < 0.02

    def test_deterministic_replay(self):
        pixel = jnp.zeros((8, 2), jnp.int32).at[:, 0].set(jnp.arange(8))
        s1 = make_sampler("lcg", pixel, seed=1, spp=8, sample_index=2)
        s2 = make_sampler("lcg", pixel, seed=1, spp=8, sample_index=2)
        a, s1 = s1.next2()
        b, s2 = s2.next2()
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        a2, _ = s1.next1()
        b2, _ = s2.next1()
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))

    def test_seed_changes_stream(self):
        pixel = jnp.zeros((128, 2), jnp.int32).at[:, 0].set(jnp.arange(128))
        a, _ = make_sampler("lcg", pixel, 0, 8, 0).next1()
        b, _ = make_sampler("lcg", pixel, 1, 8, 0).next1()
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestPMJ02BN:
    def _sampler(self, n=4096, seed=7, spp=64, si=3):
        pixel = jnp.stack(
            [jnp.arange(n, dtype=jnp.int32) % 64, jnp.arange(n, dtype=jnp.int32) // 64],
            axis=-1,
        )
        return make_sampler("pmj02bn", pixel, seed, spp, si)

    def test_uniform_and_range(self):
        s = self._sampler()
        u2, s = s.next2()
        u1, s = s.next1()
        u = np.asarray(jnp.concatenate([u2, u1[:, None]], -1))
        assert u.min() >= 0.0 and u.max() < 1.0
        for d in range(3):
            assert chi2_uniform(u[:, d]) < 3.0, d

    def test_stratification_beats_random(self):
        """The whole point of pmj02: per-pixel spp-sample sets are
        stratified. Star-discrepancy proxy: 2D samples of one pixel across
        sample_index should cover the sqrt(spp) grid."""
        spp = 64
        pixel = jnp.tile(jnp.array([[13, 27]], jnp.int32), (spp, 1))
        s = make_sampler(
            "pmj02bn", pixel, 5, spp, jnp.arange(spp, dtype=jnp.int32)
        )
        u, _ = s.next2()
        u = np.asarray(u)
        g = 8  # sqrt(64)
        cells = set(zip((u[:, 0] * g).astype(int), (u[:, 1] * g).astype(int)))
        # the per-pixel blue-noise Cranley-Patterson rotation toroidally
        # shifts the (0,2) set, so only the two wrap seams can double up:
        # coverage stays >= spp - 2*sqrt(spp), far above random (~40.5)
        assert len(cells) >= spp - 2 * g
        # and well above iid-random expectation
        rng = np.random.RandomState(0)
        r = rng.rand(spp, 2)
        rand_cells = set(zip((r[:, 0] * g).astype(int), (r[:, 1] * g).astype(int)))
        assert len(cells) > len(rand_cells)

    def test_deterministic(self):
        a, _ = self._sampler().next2()
        b, _ = self._sampler().next2()
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pixel_anticorrelation(self):
        """Blue-noise Cranley-Patterson offsets make *negative* neighbor
        correlation (that is the point of the 'bn' in pmj02bn) — assert no
        positive correlation and a sane magnitude."""
        s = self._sampler()
        u, _ = s.next2()
        u = np.asarray(u)
        c = np.corrcoef(u[:-1, 0], u[1:, 0])[0, 1]
        assert c < 0.05 and abs(c) < 0.5, c


class TestCorrMJ:
    def test_uniform_and_range(self):
        n = 8192
        pixel = jnp.stack(
            [jnp.arange(n, dtype=jnp.int32) % 64, jnp.arange(n, dtype=jnp.int32) // 64],
            axis=-1,
        )
        s = make_sampler("corrmj", pixel, 3, 16, 2)
        u2, s = s.next2()
        u1, s = s.next1()
        u = np.asarray(jnp.concatenate([u2, u1[:, None]], -1))
        assert u.min() >= 0.0 and u.max() < 1.0
        for d in range(3):
            assert chi2_uniform(u[:, d]) < 3.0, d

    def test_multijitter_stratification(self):
        spp = 16
        pixel = jnp.tile(jnp.array([[3, 9]], jnp.int32), (spp, 1))
        s = make_sampler("corrmj", pixel, 11, spp, jnp.arange(spp, dtype=jnp.int32))
        u, _ = s.next2()
        u = np.asarray(u)
        g = 4
        cells = set(zip((u[:, 0] * g).astype(int), (u[:, 1] * g).astype(int)))
        assert len(cells) == spp


class TestSamplersEndToEnd:
    """Every sampler kind drives the full render + PRB gradient path."""

    @pytest.mark.parametrize("kind", ["lcg", "pmj02bn", "corrmj"])
    def test_render_and_grad(self, kind):
        import jax
        from zdr_tpu import Camera, Scene, float3
        from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light

        s = Scene(
            [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
            integrator="path",
            sampler=kind,
        )
        s.camera = Camera(
            fov=0.9, origin=float3(-0.2, 2.6, -0.5), target=float3(-0.2, 2.6, -5.0)
        )
        mat = jnp.full((8, 8, 4), 0.5)
        img = np.asarray(s.render(mat, res=(16, 16), spp=4, seed=0))
        assert np.isfinite(img).all()
        assert img[..., :3].mean() > 0.01
        g = jax.grad(lambda m: jnp.sum(s.render(m, res=(16, 16), spp=4, seed=0)[..., :3]))(mat)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_stratified_sampler_lowers_variance(self):
        """pmj02bn should beat lcg on a soft-shadow scene at equal spp."""
        import jax
        from zdr_tpu import Camera, Scene, float3
        from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light

        imgs = {}
        for kind in ["lcg", "pmj02bn"]:
            s = Scene(
                [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
                integrator="direct",
                sampler=kind,
            )
            s.camera = Camera(
                fov=0.9, origin=float3(-0.2, 2.6, -0.5), target=float3(-0.2, 2.6, -5.0)
            )
            mat = jnp.full((8, 8, 4), 0.5)
            ref = np.asarray(s.render(mat, res=(24, 24), spp=512, seed=99))
            errs = []
            for seed in range(4):
                lo = np.asarray(s.render(mat, res=(24, 24), spp=8, seed=seed))
                errs.append(((lo - ref) ** 2).mean())
            imgs[kind] = np.mean(errs)
        assert imgs["pmj02bn"] < imgs["lcg"], imgs


def test_pmj_point_matches_table():
    """The procedural Owen-scrambled Sobol' point (samplers/pmj02bn.py
    _pmj_point — zero-gather draw path) must reproduce the generated table
    exactly (same construction, same per-set seeds)."""
    import numpy as np

    from zdr_tpu.samplers.pmj02bn import _pmj_point, _tables

    pmj_packed, _, n_sets, n_samples, _, _ = _tables()
    rng = np.random.RandomState(3)
    idx = rng.randint(0, n_samples, size=512).astype(np.uint32)
    sets = rng.randint(0, n_sets, size=512).astype(np.int32)
    x, y = _pmj_point(jnp.asarray(sets), jnp.asarray(idx))
    packed = pmj_packed[sets.astype(np.int64) * n_samples + idx.astype(np.int64)]
    tx = (packed >> 16).astype(np.float64) / 65536.0
    ty = (packed & 0xFFFF).astype(np.float64) / 65536.0
    # table is 16-bit-quantized for packing; procedural is full precision
    assert np.abs(np.asarray(x, np.float64) - tx).max() < 1.0 / 65536.0
    assert np.abs(np.asarray(y, np.float64) - ty).max() < 1.0 / 65536.0


class TestPow2FastPath:
    """The loop-free power-of-two permutation (hashes.permutation_element_
    pow2 via the *SamplerP2 classes) must be BIT-identical to the generic
    rejection-loop form, and the factory must pick the right class."""

    def test_permutation_pow2_bitwise(self):
        from zdr_tpu.samplers.hashes import permutation_element_pow2

        rng = np.random.RandomState(7)
        for l in (1, 2, 8, 64, 1024):
            w = next_pow2_mask(l)
            i = jnp.asarray(rng.randint(0, l, size=257), jnp.uint32)
            p = jnp.asarray(rng.randint(0, 2**31, size=257), jnp.uint32)
            a = permutation_element(i, jnp.uint32(l), jnp.uint32(w), p)
            b = permutation_element_pow2(i, jnp.uint32(w), p)
            assert (np.asarray(a) == np.asarray(b)).all(), l

    @pytest.mark.parametrize("kind", ["pmj02bn", "corrmj"])
    def test_draw_streams_bitwise_equal(self, kind):
        """Force the generic class on a pow2 spp and compare every draw."""
        coords = jnp.stack(
            [jnp.arange(64, dtype=jnp.int32) % 8,
             jnp.arange(64, dtype=jnp.int32) // 8], axis=-1
        )
        spp = 16
        s_fast = make_sampler(kind, coords, 5, spp, 3)
        # rebuild as the generic base class (same field values)
        base = type(s_fast).__mro__[1]
        s_slow = base(*s_fast)
        assert type(s_fast) is not base  # factory picked the P2 class
        for _ in range(4):
            u1f, s_fast = s_fast.next1()
            u1s, s_slow = s_slow.next1()
            assert (np.asarray(u1f) == np.asarray(u1s)).all()
            u2f, s_fast = s_fast.next2()
            u2s, s_slow = s_slow.next2()
            assert (np.asarray(u2f) == np.asarray(u2s)).all()

    def test_non_pow2_uses_generic(self):
        from zdr_tpu.samplers.pmj02bn import PMJ02BNSampler, PMJ02BNSamplerP2

        coords = jnp.zeros((4, 2), jnp.int32)
        assert type(make_sampler("pmj02bn", coords, 0, 12, 0)) is PMJ02BNSampler
        assert type(make_sampler("pmj02bn", coords, 0, 16, 0)) is PMJ02BNSamplerP2


def test_pack_quads_half_roundtrip():
    """pack_quads(half=True) -> (T, 8) f32 bf16-pair rows; unpack must
    reproduce bf16-quantized texels in the documented channel order."""
    from zdr_tpu.texture import pack_quads, unpack_quad_rows

    rng = np.random.RandomState(11)
    mat = jnp.asarray(rng.rand(5, 6, 4), jnp.float32)
    full = np.asarray(pack_quads(mat, False))
    packed = pack_quads(mat, True)
    assert packed.shape == (4 * 5, 8) and packed.dtype == jnp.float32
    got = np.asarray(unpack_quad_rows(packed))
    want = np.asarray(jnp.asarray(full).astype(jnp.bfloat16), np.float32)
    assert (got == want).all()
