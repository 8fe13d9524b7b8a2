"""Fused Pallas bounce kernels (integrators/pallas_bounce.py + path_fused.py)
vs the unfused persistent walk: same LCG stream, same math, so forward and
PRB gradients must agree to float tolerance. Runs in pallas interpret mode
on the CPU backend (tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.envmap import make_test_envmap
from zdr_tpu.geometry.procedural import (
    make_cornell_box,
    make_cornell_light,
    make_uv_sphere,
)
from zdr_tpu.integrators.path_fused import fused_eligible


def _cbox():
    s = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator="path",
    )
    s.camera = Camera(
        fov=0.87, origin=float3(-0.2, 2.6, -0.5), target=float3(-0.2, 2.6, -5.0)
    )
    s.fused = "force"  # CPU CI runs pallas interpret mode
    return s


MAT = jnp.full((16, 16, 4), 0.5, jnp.float32)


class TestFusedForward:
    def test_matches_unfused(self):
        s = _cbox()
        assert s._data.fused_meta is not None
        img_f = np.asarray(s.render(MAT, res=(24, 24), spp=4, seed=1))
        s.fused = False
        img_u = np.asarray(s.render(MAT, res=(24, 24), spp=4, seed=1))
        np.testing.assert_allclose(img_f, img_u, atol=2e-5)

    def test_nonsquare_res_and_padding(self):
        # n_pix not a multiple of the plane block: padded lanes must not
        # contribute
        s = _cbox()
        img_f = np.asarray(s.render(MAT, res=(20, 12), spp=2, seed=0))
        s.fused = False
        img_u = np.asarray(s.render(MAT, res=(20, 12), spp=2, seed=0))
        np.testing.assert_allclose(img_f, img_u, atol=2e-5)


class TestFusedBackward:
    def test_grad_matches_unfused(self):
        s = _cbox()
        # realization equality only holds with per-tap flushing: at
        # splat_merge > 1 the one-walk loop backward groups taps by walk
        # iteration while the unfused walk groups by interleaved phase —
        # both unbiased (gated statistically in test_config_knobs), but
        # different realizations. packed_splat off for the same reason
        # (flush-order bf16 reassociation).
        s.splat_merge = 1
        s.packed_splat = False

        def loss(m):
            return jnp.sum(s.render(m, res=(16, 16), spp=4, seed=0)[..., :3])

        g_f = np.asarray(jax.grad(loss)(MAT))
        s.fused = False
        g_u = np.asarray(jax.grad(loss)(MAT))
        scale = np.abs(g_u).max()
        assert scale > 0
        assert np.abs(g_f - g_u).max() <= 1e-3 * scale


class TestEligibility:
    def test_env_scene_is_eligible(self):
        # round-3: envmaps run fused (the reference's flagship example.py
        # workflow); the glue does the alias draws + equirect fetches
        s = Scene([(make_uv_sphere(0.5), None, None)], integrator="path")
        s.fused = "force"
        s.add_envmap(make_test_envmap())
        assert fused_eligible(s._data, s._config((8, 8), 1))
        img = s.render(MAT, res=(8, 8), spp=1, seed=0)
        assert bool(jnp.isfinite(img).all())

    def test_point_light_keeps_meta(self):
        s = _cbox()
        assert s._data.fused_meta is not None
        s.add_point_light((0.0, 1.0, 0.0), 5.0)
        assert s._data.fused_meta is not None
        assert s._data.fused_meta.n_point == 1

    def test_no_lights_gate(self):
        # a scene with no lights of any kind keeps a meta (it is in kernel
        # scope) but the fused path declines it (nothing to sample)
        s = Scene([(make_uv_sphere(0.5), None, None)], integrator="path")
        s.fused = "force"
        assert not fused_eligible(s._data, s._config((8, 8), 1))

    def test_cpu_auto_mode_falls_back(self):
        s = _cbox()
        s.fused = "auto"
        assert not fused_eligible(s._data, s._config((8, 8), 1))

    def test_samplers_eligible(self):
        # round-3: the table samplers draw in the glue, so they are fused-
        # capable; only unknown kinds fall back
        s = _cbox()
        s.sampler = "pmj02bn"
        assert fused_eligible(s._data, s._config((8, 8), 1))
        s.sampler = "corrmj"
        assert fused_eligible(s._data, s._config((8, 8), 1))


class TestUpdateLights:
    def test_value_change_keeps_meta(self):
        s = _cbox()
        m0 = s._data.fused_meta
        s.update_lights([None, 30.0])  # same structure, brighter
        assert s._data.fused_meta == m0  # no recompile (static key equal)
        img = np.asarray(s.render(MAT, res=(12, 12), spp=2, seed=0))
        s.fused = False
        img_u = np.asarray(s.render(MAT, res=(12, 12), spp=2, seed=0))
        np.testing.assert_allclose(img, img_u, atol=5e-5)

    def test_structure_change_rebuilds_meta(self):
        s = _cbox()
        m0 = s._data.fused_meta
        s.update_lights([1.0, 15.0])  # instance 0 becomes emissive too
        assert s._data.fused_meta != m0
        assert s._data.fused_meta.n_lights == 2
        img = s.render(MAT, res=(12, 12), spp=2, seed=0)
        assert bool(jnp.isfinite(img).all())


class TestWindowing:
    def test_spp_windows_match(self):
        s = _cbox()
        old = type(s).max_spp_per_call
        type(s).max_spp_per_call = 4
        try:
            img_w = np.asarray(s.render(MAT, res=(12, 12), spp=10, seed=0))
        finally:
            type(s).max_spp_per_call = old
        img_1 = np.asarray(s.render(MAT, res=(12, 12), spp=10, seed=0))
        np.testing.assert_allclose(img_w, img_1, atol=2e-5)


class TestFusedDirect:
    """Direct integrator on the fused kernels (integrators/direct_fused.py):
    one fused bounce + an extra emitter-lookup trace."""

    def _scene(self):
        s = _cbox()
        s.integrator = "direct"
        return s

    def test_forward_matches_unfused(self):
        s = self._scene()
        from zdr_tpu.integrators.direct_fused import direct_fused_eligible

        assert direct_fused_eligible(s._data, s._config((16, 16), 2))
        i_f = np.asarray(s.render(MAT, res=(24, 24), spp=4, seed=1))
        s.fused = False
        i_u = np.asarray(s.render(MAT, res=(24, 24), spp=4, seed=1))
        # same draws (the extra in-kernel RR uniform is unused), same math up
        # to two documented epsilon-level mask deviations
        np.testing.assert_allclose(i_f, i_u, atol=2e-3)
        assert np.abs(i_f - i_u).mean() < 1e-5

    def test_grad_unbiased_vs_fd(self):
        s = self._scene()
        material = jax.random.uniform(
            jax.random.PRNGKey(0), (16, 16, 4), minval=0.25, maxval=0.75
        )

        def loss(m):
            return jnp.sum(s.render(m, res=(24, 24), spp=96, seed=3)[..., :3])

        g = np.asarray(jax.grad(loss)(material))
        gc = np.abs(g[..., 0])
        ti = np.unravel_index(np.argmax(gc), gc.shape) + (0,)
        ad = float(g[ti])
        fd = (
            float(loss(material.at[ti].add(0.01)))
            - float(loss(material.at[ti].add(-0.01)))
        ) / 0.02
        assert abs(ad - fd) <= 0.1 * abs(fd), (ad, fd)

    def test_use_mis_off_falls_back(self):
        s = self._scene()
        s.use_mis = False
        from zdr_tpu.integrators.direct_fused import direct_fused_eligible

        assert not direct_fused_eligible(s._data, s._config((8, 8), 1))
        img = s.render(MAT, res=(8, 8), spp=1, seed=0)
        assert bool(jnp.isfinite(img).all())

    def test_merged_bounce_emit_matches_unfused(self):
        """MXU scenes (>= MXU_MIN_TRIS tris, no env) run the merged
        bounce_emit shade kernel — the bounce emitter lookup happens
        in-kernel instead of in a separate lite kernel-1 pass, and the
        backward shades once. Image AND gradient must match the unfused
        direct estimator at the documented fused tolerance."""
        from zdr_tpu.geometry.procedural import make_quad
        from zdr_tpu.integrators.pallas_bounce import MXU_MIN_TRIS

        s = Scene(
            [
                (make_uv_sphere(0.5, 16, 32), None, None),
                (make_quad(size=1.2, y=-1.5), None, 25.0),
            ],
            integrator="direct",
        )
        s.camera = Camera(
            fov=0.8, origin=float3(1.6, 0.2, 0.0), target=float3(0, 0, 0)
        )
        s.fused = "force"
        assert s._data.fused_meta.num_tris >= MXU_MIN_TRIS
        assert s._data.fused_meta.n_env == 0
        i_f = np.asarray(s.render(MAT, res=(24, 24), spp=4, seed=1))
        s.fused = False
        i_u = np.asarray(s.render(MAT, res=(24, 24), spp=4, seed=1))
        np.testing.assert_allclose(i_f, i_u, atol=2e-3)
        assert np.abs(i_f - i_u).mean() < 1e-5

        s.fused = "force"

        def loss_f(m):
            return jnp.sum(s.render(m, res=(24, 24), spp=8, seed=2)[..., :3])

        g_f = np.asarray(jax.grad(loss_f)(MAT))
        s.fused = False
        g_u = np.asarray(jax.grad(loss_f)(MAT))
        assert np.abs(g_f).sum() > 0
        scale = np.abs(g_u).max()
        # measured 1.9e-3 on CPU/HIGHEST: the documented epsilon deviations
        # (NEE gate, offset-origin pdf) land near the shared 2e-3 class
        np.testing.assert_allclose(g_f, g_u, atol=3e-3 * max(scale, 1.0))


class TestFusedCollocated:
    """Collocated integrator on fused kernel 1 (integrators/
    collocated_fused.py): one fused trace, elementwise XLA shade, shared
    splat-buffer backward. Round 4: mesh-light scenes are in scope (the
    validity mask is shade | emit)."""

    def _scene(self, sampler="lcg"):
        from zdr_tpu.geometry.procedural import make_uv_sphere

        s = Scene(
            [(make_uv_sphere(0.5, 12, 24), None, None)],
            integrator="collocated",
            sampler=sampler,
        )
        s.camera = Camera(
            fov=0.8, origin=float3(1.6, 0.2, 0.0), target=float3(0, 0, 0)
        )
        s.fused = "force"
        return s

    def test_eligibility(self):
        from zdr_tpu.integrators.collocated_fused import (
            collocated_fused_eligible,
        )

        s = self._scene()
        assert collocated_fused_eligible(s._data, s._config((8, 8), 1))
        # round 4: mesh-light scenes are eligible too (VERDICT r3 item 4)
        lit = _cbox()
        lit.integrator = "collocated"
        assert collocated_fused_eligible(lit._data, lit._config((8, 8), 1))

    def test_forward_matches_unfused_with_mesh_lights(self):
        """A sphere + emissive quad: collocated shades the emissive
        surface's material like any other front-facing hit (reference
        collocated.py:10-31 ignores emission), so fused == unfused must
        hold with the light present (VERDICT r3 item 4 done-criterion)."""
        from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere

        s = Scene(
            [
                (make_uv_sphere(0.5, 12, 24), None, None),
                (make_quad(size=1.2, y=-0.9), None, 25.0),
            ],
            integrator="collocated",
        )
        s.camera = Camera(
            fov=0.9, origin=float3(1.6, 0.2, 0.0), target=float3(0, -0.3, 0)
        )
        s.fused = "force"
        i_f = np.asarray(s.render(MAT, res=(24, 20), spp=3, seed=2))
        s.fused = False
        i_u = np.asarray(s.render(MAT, res=(24, 20), spp=3, seed=2))
        # the emissive quad must actually be visible and shaded
        assert i_u[..., :3].sum() > 0
        np.testing.assert_allclose(i_f, i_u, atol=2e-4)

        s.fused = "force"
        s.packed_splat = False

        def loss(m):
            return jnp.sum(s.render(m, res=(16, 16), spp=2, seed=1)[..., :3])

        g_f = np.asarray(jax.grad(loss)(MAT))
        s.fused = False
        g_u = np.asarray(jax.grad(loss)(MAT))
        scale = np.abs(g_u).max()
        assert scale > 0
        assert np.abs(g_f - g_u).max() <= 1e-4 * scale

    @pytest.mark.parametrize("sampler", ["lcg", "pmj02bn"])
    def test_forward_matches_unfused(self, sampler):
        s = self._scene(sampler)
        i_f = np.asarray(s.render(MAT, res=(24, 20), spp=3, seed=2))
        s.fused = False
        i_u = np.asarray(s.render(MAT, res=(24, 20), spp=3, seed=2))
        np.testing.assert_allclose(i_f, i_u, atol=2e-4)

    def test_grad_matches_unfused(self):
        # the unfused collocated backward splats in f32 (segment_scatter_add)
        # while the fused one shares the bf16-pair packed flush with path/
        # direct; compare exactly with packing off, loosely at the default
        s = self._scene()
        s.packed_splat = False

        def loss(m):
            return jnp.sum(s.render(m, res=(16, 16), spp=4, seed=1)[..., :3])

        g_f = np.asarray(jax.grad(loss)(MAT))
        s.fused = False
        g_u = np.asarray(jax.grad(loss)(MAT))
        scale = np.abs(g_u).max()
        assert scale > 0
        assert np.abs(g_f - g_u).max() <= 1e-4 * scale

        s.fused = "force"
        s.packed_splat = True
        g_p = np.asarray(jax.grad(loss)(MAT))
        # bf16 payload quantization: ~2^-9 relative per splat entry
        assert np.abs(g_p - g_u).max() <= 5e-3 * max(scale, 1.0)

    def test_spp_windows_match(self):
        s = self._scene()
        old = type(s).max_spp_per_call
        type(s).max_spp_per_call = 4
        try:
            img_w = np.asarray(s.render(MAT, res=(12, 12), spp=10, seed=0))
        finally:
            type(s).max_spp_per_call = old
        img_1 = np.asarray(s.render(MAT, res=(12, 12), spp=10, seed=0))
        np.testing.assert_allclose(img_w, img_1, atol=2e-5)


class TestFusedScopeRound3:
    """Round-3 widened fused envelope: envmaps, point lights and the table
    samplers (pmj02bn / corrmj) all run through the glue-based pipeline and
    must match the unfused walk (forward and PRB gradients)."""

    def _scene(self, integrator, sampler, env=False, point=False, light=True):
        models = [(make_cornell_box(), None, None)]
        if light:
            models.append((make_cornell_light(), None, 15.0))
        s = Scene(models, integrator=integrator, sampler=sampler)
        s.camera = Camera(
            fov=0.87,
            origin=float3(-0.2, 2.6, -0.5),
            target=float3(-0.2, 2.6, -5.0),
        )
        if env:
            s.add_envmap(make_test_envmap(16, 32))
        if point:
            s.add_point_light((0.0, 2.5, -2.0), (2.0, 1.5, 1.0))
        s.fused = "force"
        return s

    @pytest.mark.parametrize(
        "integrator,sampler,env,point",
        [
            ("path", "lcg", True, False),
            ("path", "pmj02bn", False, False),
            ("path", "pmj02bn", True, True),
            ("path", "corrmj", True, False),
            ("path", "lcg", False, True),
            ("direct", "lcg", True, False),
            ("direct", "pmj02bn", True, False),
        ],
    )
    def test_forward_matches_unfused(self, integrator, sampler, env, point):
        s = self._scene(integrator, sampler, env=env, point=point)
        i_f = np.asarray(s.render(MAT, res=(20, 20), spp=2, seed=3))
        s.fused = False
        i_u = np.asarray(s.render(MAT, res=(20, 20), spp=2, seed=3))
        np.testing.assert_allclose(i_f, i_u, atol=2e-3)
        assert np.abs(i_f - i_u).mean() < 1e-4

    @pytest.mark.parametrize(
        "integrator,sampler,env,point",
        [
            ("path", "lcg", True, False),
            ("path", "pmj02bn", True, False),
            ("direct", "lcg", True, True),
        ],
    )
    def test_grad_matches_unfused(self, integrator, sampler, env, point):
        s = self._scene(integrator, sampler, env=env, point=point)

        def loss(m):
            return jnp.sum(s.render(m, res=(16, 16), spp=2, seed=0)[..., :3])

        g_f = np.asarray(jax.grad(loss)(MAT))
        s.fused = False
        g_u = np.asarray(jax.grad(loss)(MAT))
        scale = np.abs(g_u).max()
        assert scale > 0
        assert np.abs(g_f - g_u).max() <= 5e-3 * scale

    def test_env_only_scene(self):
        # the reference example.py workflow: object + envmap, no mesh light
        s = Scene(
            [(make_uv_sphere(0.5), None, None)],
            integrator="path",
            sampler="pmj02bn",
        )
        s.add_envmap(make_test_envmap(16, 32))
        s.fused = "force"
        assert fused_eligible(s._data, s._config((16, 16), 2))
        i_f = np.asarray(s.render(MAT, res=(16, 16), spp=2, seed=1))
        s.fused = False
        i_u = np.asarray(s.render(MAT, res=(16, 16), spp=2, seed=1))
        np.testing.assert_allclose(i_f, i_u, atol=2e-3)


class TestLoopKernel:
    """Round-5 megakernel loop (integrators/pallas_loop.py): one Pallas
    call per bounce with in-kernel sampler draws / NEE selection / restart
    camera rays, plus the one-walk tap-replay backward. Must match the
    2-kernel fused pipeline at float tolerance (same stream, same math)."""

    def _cfg(self, s, res, spp, **kw):
        import dataclasses

        return dataclasses.replace(
            s._config(res, spp), fused="force", **kw
        )

    def test_eligible_and_forward_matches_fused(self):
        from zdr_tpu.integrators import pallas_loop as plp
        from zdr_tpu.integrators import path_fused as pf
        from zdr_tpu.integrators.wrapper import _pixel_grid

        s = _cbox()
        cfg = self._cfg(s, (24, 24), 4)
        assert plp.loop_eligible(s._data, cfg)
        coords = _pixel_grid(cfg.res)
        a = np.asarray(pf.render_path_fused(
            s._data, MAT, s.camera, jnp.int32(3), cfg, coords))
        b = np.asarray(plp.render_path_loop(
            s._data, MAT, s.camera, jnp.int32(3), cfg, coords))
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_one_walk_backward_matches_two_walk(self):
        from zdr_tpu.integrators import pallas_loop as plp
        from zdr_tpu.integrators import path_fused as pf
        from zdr_tpu.integrators.wrapper import _pixel_grid

        s = _cbox()
        s.max_depth = 4
        # merge=1 + unpacked flush: tap values must agree at float
        # precision (only flush summation order differs)
        cfg = self._cfg(s, (16, 16), 4, splat_merge=1, packed_splat=False)
        coords = _pixel_grid(cfg.res)
        le = jnp.asarray(
            np.random.RandomState(1).rand(16 * 16, 3), jnp.float32
        )
        a = np.asarray(pf.render_path_backward_fused(
            s._data, MAT, s.camera, jnp.int32(3), cfg, coords, le))
        b = np.asarray(plp.render_path_backward_loop(
            s._data, MAT, s.camera, jnp.int32(3), cfg, coords, le))
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-5

    def test_tap_cap_outer_resume_exact(self):
        """Force LOOP_TAP_CAP below one window's iteration count: the
        outer while must resume the walk and still produce identical
        gradients (sample streams are restart-invariant)."""
        from zdr_tpu.integrators import pallas_loop as plp
        from zdr_tpu.integrators.wrapper import _pixel_grid

        s = _cbox()
        s.max_depth = 4
        cfg = self._cfg(s, (16, 16), 8, splat_merge=1, packed_splat=False)
        coords = _pixel_grid(cfg.res)
        le = jnp.ones((16 * 16, 3), jnp.float32)
        args = (s._data, MAT, s.camera, jnp.int32(2), cfg, coords, le)
        ref = np.asarray(plp.render_path_backward_loop(*args))
        cap = plp.LOOP_TAP_CAP
        try:
            plp.LOOP_TAP_CAP = 12  # > max_depth, < needed iterations
            capped = np.asarray(plp.render_path_backward_loop(*args))
        finally:
            plp.LOOP_TAP_CAP = cap
        assert np.abs(ref - capped).max() / np.abs(ref).max() < 1e-5

    def test_eligibility_gates(self):
        import dataclasses

        from zdr_tpu.integrators import pallas_loop as plp

        s = _cbox()
        cfg = self._cfg(s, (16, 16), 4)
        assert plp.loop_eligible(s._data, cfg)
        # non-pow2 spp: pmj02bn falls back to the 2-kernel pipeline
        cfg12 = dataclasses.replace(self._cfg(s, (16, 16), 4), spp=12)
        assert not plp.loop_eligible(s._data, cfg12)
        assert plp.loop_eligible(
            s._data, dataclasses.replace(cfg12, sampler="lcg")
        )
        # env scenes keep the glue route (alias/equirect gathers)
        s_env = _cbox()
        s_env.add_envmap(make_test_envmap())
        assert not plp.loop_eligible(s_env._data, self._cfg(s_env, (16, 16), 4))
        from zdr_tpu.integrators.path_fused import fused_eligible as fe

        assert fe(s_env._data, self._cfg(s_env, (16, 16), 4))

    def test_point_light_loop(self):
        """Point lights are loop-capable (in-kernel NEE where-chain)."""
        s = _cbox()
        s.add_point_light((0.0, 4.5, -4.0), 6.0)
        cfg = self._cfg(s, (16, 16), 4)
        from zdr_tpu.integrators import pallas_loop as plp
        from zdr_tpu.integrators import path_fused as pf
        from zdr_tpu.integrators.wrapper import _pixel_grid

        assert plp.loop_eligible(s._data, cfg)
        coords = _pixel_grid(cfg.res)
        a = np.asarray(pf.render_path_fused(
            s._data, MAT, s.camera, jnp.int32(1), cfg, coords))
        b = np.asarray(plp.render_path_loop(
            s._data, MAT, s.camera, jnp.int32(1), cfg, coords))
        np.testing.assert_allclose(a, b, atol=2e-6)
