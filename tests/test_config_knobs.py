"""Render-config knobs + emission-based light gating.

Round-2 items (VERDICT.md 6 & 8): the reference's module-level flags
(use_MIS direct.py:14, max_depth/rr_depth prb.py:15-16, bilinear
interaction.py:33) are RenderConfig fields keyed into the compile cache, so
flipping a knob on a Scene takes effect without a process restart; and light
identification is by emission rather than the reference's `hit.inst > 0`
hack (direct.py:30-32), so a scene with several non-emissive instances
shades all of them.
"""

import jax.numpy as jnp
import numpy as np

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.geometry.procedural import (
    make_cornell_box,
    make_cornell_light,
    make_uv_sphere,
)


def _cbox_scene(integrator):
    scene = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator=integrator,
    )
    scene.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(-0.2, 2.6, -0.5),
        target=float3(-0.2, 2.6, -5.0),
    )
    return scene


MAT = jnp.full((32, 32, 4), 0.5, jnp.float32)


class TestKnobsTakeEffect:
    def test_use_mis_flip_changes_direct_render(self):
        scene = _cbox_scene("direct")
        img_mis = scene.render(MAT, res=(24, 24), spp=4, seed=0)
        scene.use_mis = False
        img_nomis = scene.render(MAT, res=(24, 24), spp=4, seed=0)
        # different estimator: images agree in expectation, not per-sample
        assert not np.allclose(np.asarray(img_mis), np.asarray(img_nomis))
        # flipping back reproduces the original bits (cache keyed correctly)
        scene.use_mis = True
        img_again = scene.render(MAT, res=(24, 24), spp=4, seed=0)
        np.testing.assert_array_equal(np.asarray(img_mis), np.asarray(img_again))

    def test_max_depth_flip_changes_path_render(self):
        scene = _cbox_scene("path")
        img16 = scene.render(MAT, res=(16, 16), spp=4, seed=0)
        scene.max_depth = 1
        img1 = scene.render(MAT, res=(16, 16), spp=4, seed=0)
        # depth-1 path = primary emitter/env hits only, strictly less light
        assert float(jnp.sum(img1[..., :3])) < float(jnp.sum(img16[..., :3]))

    def test_bilinear_flip_changes_filtering(self):
        scene = _cbox_scene("direct")
        # high-frequency texture so nearest vs bilinear differ visibly
        tex = jnp.asarray(
            np.random.default_rng(0).uniform(0.1, 0.9, (8, 8, 4)), jnp.float32
        )
        img_bi = scene.render(tex, res=(24, 24), spp=4, seed=0)
        scene.bilinear = False
        img_nn = scene.render(tex, res=(24, 24), spp=4, seed=0)
        assert not np.allclose(np.asarray(img_bi), np.asarray(img_nn))

    def test_rr_depth_in_config(self):
        scene = _cbox_scene("path")
        img_default = scene.render(MAT, res=(16, 16), spp=4, seed=0)
        scene.rr_depth = 1  # RR starts earlier: different sample outcomes
        img_rr1 = scene.render(MAT, res=(16, 16), spp=4, seed=0)
        assert not np.allclose(np.asarray(img_default), np.asarray(img_rr1))


class TestLaneOrder:
    def test_morton_vs_linear_identical_on_fused_path(self):
        """lane_order only permutes sweep lanes: per-lane arithmetic is
        order-independent, so the forward image must be bit-identical and
        the gradient equal up to flush summation order (ADVICE r3 — a
        regression in the inverse-permutation plumbing would scramble
        pixels with no other signal)."""
        import jax

        tex = jnp.asarray(
            np.random.default_rng(3).uniform(0.2, 0.8, (16, 16, 4)),
            jnp.float32,
        )

        def render_and_grad(order):
            scene = _cbox_scene("path")
            scene.fused = "force"
            scene.lane_order = order
            img = scene.render(tex, res=(16, 16), spp=2, seed=0)
            g = jax.grad(
                lambda m: jnp.sum(
                    scene.render(m, res=(16, 16), spp=2, seed=0)[..., :3]
                )
            )(tex)
            return np.asarray(img), np.asarray(g)

        img_m, g_m = render_and_grad("morton")
        img_l, g_l = render_and_grad("linear")
        np.testing.assert_array_equal(img_m, img_l)
        np.testing.assert_allclose(g_m, g_l, rtol=1e-5, atol=1e-6)

    def test_unknown_lane_order_raises(self):
        import pytest

        scene = _cbox_scene("direct")
        scene.lane_order = "Morton"  # typo must fail loudly, not raster-fall-back
        with pytest.raises(ValueError):
            scene.render(MAT, res=(8, 8), spp=1, seed=0)


class TestEmissionGating:
    def test_two_diffuse_instances_both_render(self):
        """A second non-emissive instance must shade, not go black
        (the reference's inst>0 hack rendered it as a zero-emission light)."""
        # cbox as instance 0, light, plus a diffuse sphere mid-room in view
        xf = np.eye(4, dtype=np.float32)
        xf[:3, 3] = (-0.2, 2.6, -3.0)
        sphere = make_uv_sphere(radius=0.8, n_lat=8, n_lon=16)
        for integrator in ("direct", "path"):
            scene = Scene(
                [
                    (make_cornell_box(), None, None),
                    (make_cornell_light(), None, 15.0),
                    (sphere, xf, None),
                ],
                integrator=integrator,
            )
            scene.camera = Camera(
                fov=50 / 180 * 3.1415926,
                origin=float3(-0.2, 2.6, -0.5),
                target=float3(-0.2, 2.6, -5.0),
            )
            img = scene.render(MAT, res=(48, 48), spp=8, seed=0)
            rgb = np.asarray(img[..., :3])
            # the sphere fills the image center; require non-black shading
            h, w = rgb.shape[:2]
            crop = rgb[h // 3 : 2 * h // 3, w // 3 : 2 * w // 3]
            assert crop.mean() > 1e-3, f"{integrator}: second instance is black"


class TestSplatMerge:
    def test_reservoir_merge_exact_and_unbiased(self):
        """texture.reservoir_merge_taps: exact when one side is masked or
        zero-weight; unbiased (integrates to the sum) when both are real;
        zero-weight groups collapse to the sentinel id."""
        from zdr_tpu.texture import reservoir_merge_taps

        nb = 100
        # exact cases: pend masked -> new survives unscaled (and vice versa)
        pend = (jnp.array([nb, 5]),) + tuple(
            jnp.array([0.0, 2.0]) for _ in range(4)
        )
        new = (jnp.array([7, nb]),) + tuple(
            jnp.array([3.0, 0.0]) for _ in range(4)
        )
        for u in (0.0, 0.5, 0.9999):
            out = reservoir_merge_taps(pend, new, jnp.full((2,), u), nb)
            assert int(out[0][0]) == 7 and float(out[1][0]) == 3.0
            assert int(out[0][1]) == 5 and float(out[1][1]) == 2.0
        # unbiasedness: integrate the estimator over u on a fine grid
        pend = (jnp.array([5]),) + tuple(
            jnp.array([v]) for v in (1.0, -2.0, 0.5, 0.0)
        )
        new = (jnp.array([7]),) + tuple(
            jnp.array([v]) for v in (4.0, 1.0, 0.0, -1.0)
        )
        n = 4096
        us = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
        bp = tuple(jnp.broadcast_to(x, us.shape) for x in pend)
        bn = tuple(jnp.broadcast_to(x, us.shape) for x in new)
        out = reservoir_merge_taps(bp, bn, us, nb)
        want = (5.0, -1.0, 0.5, -1.0)  # pend + new per channel
        for c in range(4):
            got = float(jnp.mean(out[1 + c]))
            assert abs(got - want[c]) < 2e-3, (c, got, want[c])
        # all-zero group -> sentinel id (keeps the flush compaction clean)
        z = tuple(jnp.zeros((1,)) for _ in range(4))
        out = reservoir_merge_taps(
            (jnp.array([5]),) + z, (jnp.array([nb]),) + z, jnp.array([0.5]), nb
        )
        assert int(out[0][0]) == nb

    def test_splat_merge_grad_unbiased_and_close(self):
        """splat_merge=2 halves the flush volume at a bounded reservoir-
        noise cost: the same-seed realization difference must stay well
        below the estimator's own cross-seed MC noise (measured here:
        merge diff ~0.18 vs cross-seed ~0.34 L1 at this size), and the
        knob must engage (bits change)."""
        import jax

        scene = _cbox_scene("path")

        def grad(seed, merge):
            scene.splat_merge = merge
            def loss(m):
                return jnp.sum(
                    scene.render(m, res=(24, 24), spp=8, seed=seed)[..., :3]
                )

            return np.asarray(jax.grad(loss)(MAT))

        g1 = grad(3, 1)
        g2 = grad(3, 2)
        assert not np.array_equal(g1, g2), "splat_merge knob did not engage"
        denom = np.abs(g1).sum()
        assert denom > 0
        merge_noise = np.abs(g1 - g2).sum() / denom
        inherent = np.abs(g1 - grad(4, 1)).sum() / denom
        assert merge_noise < 0.8 * inherent, (merge_noise, inherent)


class TestPackedSplat:
    def test_packed_splat_grad_close_to_exact(self):
        """packed_splat quantizes per-flush splat totals to bf16: the PRB
        gradient must stay within ~1% of the exact-splat gradient."""
        import jax

        scene = _cbox_scene("path")

        def loss(m):
            return jnp.sum(
                scene.render(m, res=(24, 24), spp=8, seed=5)[..., :3]
            )

        scene.packed_splat = True
        g_packed = np.asarray(jax.grad(loss)(MAT))
        scene.packed_splat = False
        g_exact = np.asarray(jax.grad(loss)(MAT))
        scale = np.abs(g_exact).max()
        assert scale > 0
        assert np.abs(g_packed - g_exact).max() <= 0.02 * scale
