"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light
from zdr_tpu.parallel import make_mesh, render_batch, render_sharded


@pytest.fixture(scope="module")
def scene():
    s = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator="path",
    )
    s.camera = Camera(
        fov=0.9, origin=float3(-0.2, 2.6, -0.5), target=float3(-0.2, 2.6, -5.0)
    )
    return s


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


class TestShardedRender:
    def test_forward_matches_single_device(self, scene, mesh):
        mat = jnp.full((16, 16, 4), 0.5)
        sharded = render_sharded(scene, mat, res=(32, 32), spp=8, seed=0, mesh=mesh)
        single = scene.render(mat, res=(32, 32), spp=8, seed=0)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), atol=1e-5
        )

    def test_gradient_matches_single_device(self, scene, mesh):
        """The psum'd texture gradient must equal the one-device scatter.

        packed_splat is disabled here: bf16 flush quantization depends on
        how entries group into flushes, which legitimately differs between
        the per-device and single-device walks. With exact splats the
        sharding machinery itself must be equality-tight."""
        scene.packed_splat = False
        mat = jnp.full((16, 16, 4), 0.5)

        def loss_sharded(m):
            img = render_sharded(scene, m, res=(32, 32), spp=8, seed=0, mesh=mesh)
            return jnp.sum(img[..., :3])

        def loss_single(m):
            return jnp.sum(scene.render(m, res=(32, 32), spp=8, seed=0)[..., :3])

        g8 = np.asarray(jax.grad(loss_sharded)(mat))
        g1 = np.asarray(jax.grad(loss_single)(mat))
        scene.packed_splat = True
        assert np.abs(g8).sum() > 0
        np.testing.assert_allclose(g8, g1, rtol=1e-4, atol=1e-5)

    def test_output_is_sharded(self, scene, mesh):
        mat = jnp.full((8, 8, 4), 0.5)
        img = render_sharded(scene, mat, res=(16, 16), spp=2, seed=0, mesh=mesh)
        assert img.shape == (16, 16, 4)

    def test_spp_windowing_matches_single_device(self, scene, mesh):
        """spp > max_spp_per_call slices into the same sample windows the
        single-device path uses (VERDICT round-1 item 7); forward and
        gradient must match Scene.render across a window boundary."""
        mat = jnp.full((8, 8, 4), 0.5)
        old_chunk = type(scene).max_spp_per_call
        type(scene).max_spp_per_call = 4  # force windows: spp=10 -> 4+4+2
        scene.packed_splat = False  # exact splats: see gradient test above
        try:
            sharded = render_sharded(scene, mat, res=(16, 16), spp=10, seed=0, mesh=mesh)
            single = scene.render(mat, res=(16, 16), spp=10, seed=0)
            np.testing.assert_allclose(
                np.asarray(sharded), np.asarray(single), atol=1e-5
            )

            def loss_sharded(m):
                img = render_sharded(scene, m, res=(16, 16), spp=10, seed=0, mesh=mesh)
                return jnp.sum(img[..., :3])

            def loss_single(m):
                return jnp.sum(scene.render(m, res=(16, 16), spp=10, seed=0)[..., :3])

            g8 = np.asarray(jax.grad(loss_sharded)(mat))
            g1 = np.asarray(jax.grad(loss_single)(mat))
            assert np.abs(g8).sum() > 0
            np.testing.assert_allclose(g8, g1, rtol=1e-4, atol=1e-5)
        finally:
            type(scene).max_spp_per_call = old_chunk
            scene.packed_splat = True

    def test_fused_sharded_matches_single_device(self, scene, mesh):
        """fused='force' under shard_map (pallas interpret mode on the CPU
        mesh): the fused Pallas bounce path must compose with the sharding
        machinery — per-device fused walks + psum'd gradient == the
        single-device fused render (VERDICT r2 item 6a)."""
        scene.fused = "force"
        scene.packed_splat = False  # exact splats: see gradient test above
        # merge=1: the loop backward's post-pass walks stored taps in
        # reverse iteration order, so merge-group boundaries depend on the
        # shard's max iteration count — sharded and single-device merge
        # REALIZATIONS differ at merge > 1 (both unbiased; merge statistics
        # gated in test_config_knobs). Per-tap flushing is shard-invariant.
        scene.splat_merge = 1
        mat = jnp.full((8, 8, 4), 0.5)
        try:
            sharded = render_sharded(scene, mat, res=(16, 16), spp=2, seed=0, mesh=mesh)
            single = scene.render(mat, res=(16, 16), spp=2, seed=0)
            np.testing.assert_allclose(
                np.asarray(sharded), np.asarray(single), atol=1e-5
            )

            def loss_sharded(m):
                img = render_sharded(scene, m, res=(16, 16), spp=2, seed=0, mesh=mesh)
                return jnp.sum(img[..., :3])

            def loss_single(m):
                return jnp.sum(scene.render(m, res=(16, 16), spp=2, seed=0)[..., :3])

            g8 = np.asarray(jax.grad(loss_sharded)(mat))
            g1 = np.asarray(jax.grad(loss_single)(mat))
            assert np.abs(g8).sum() > 0
            np.testing.assert_allclose(g8, g1, rtol=1e-4, atol=1e-5)
        finally:
            scene.fused = "auto"
            scene.packed_splat = True
            scene.splat_merge = 4

    def test_streamed_sharded_matches_single_device(self, mesh):
        """The HBM-streamed big-mesh trace under shard_map: per-device
        chunked stream kernels + psum'd gradient == single-device, on a
        sphere forced through the streamed route (tiny FUSED_MAX_TRIS)."""
        from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere
        from zdr_tpu.integrators import pallas_bounce as pb

        s = Scene(
            [
                (make_uv_sphere(0.5, 16, 32), None, None),
                (make_quad(size=1.0, y=-2.0), None, 40.0),
            ],
            integrator="direct",
        )
        s.camera = Camera(
            fov=0.8, origin=float3(1.5, 0.3, 0.0), target=float3(0, 0, 0)
        )
        s.fused = "force"
        s.packed_splat = False
        mat = jnp.full((8, 8, 4), 0.5)
        old = pb.FUSED_MAX_TRIS
        pb.FUSED_MAX_TRIS = 64
        try:
            sharded = render_sharded(s, mat, res=(16, 16), spp=2, seed=0, mesh=mesh)
            single = s.render(mat, res=(16, 16), spp=2, seed=0)
            np.testing.assert_allclose(
                np.asarray(sharded), np.asarray(single), atol=1e-5
            )

            def loss_sharded(m):
                img = render_sharded(s, m, res=(16, 16), spp=2, seed=0, mesh=mesh)
                return jnp.sum(img[..., :3])

            def loss_single(m):
                return jnp.sum(s.render(m, res=(16, 16), spp=2, seed=0)[..., :3])

            g8 = np.asarray(jax.grad(loss_sharded)(mat))
            g1 = np.asarray(jax.grad(loss_single)(mat))
            assert np.abs(g8).sum() > 0
            np.testing.assert_allclose(g8, g1, rtol=1e-4, atol=1e-5)
        finally:
            pb.FUSED_MAX_TRIS = old

    def test_fused_collocated_sharded_matches_single_device(self, mesh):
        """The fused collocated route (integrators/collocated_fused.py)
        under shard_map: trace-only kernel 1 + XLA shade must compose with
        the sharding machinery like the other fused integrators."""
        from zdr_tpu.geometry.procedural import make_uv_sphere

        s = Scene(
            [(make_uv_sphere(0.5, 12, 24), None, None)],
            integrator="collocated",
        )
        s.camera = Camera(
            fov=0.8, origin=float3(1.6, 0.2, 0.0), target=float3(0, 0, 0)
        )
        s.fused = "force"
        s.packed_splat = False  # exact splats: see gradient test above
        mat = jnp.full((8, 8, 4), 0.5)
        sharded = render_sharded(s, mat, res=(16, 16), spp=2, seed=0, mesh=mesh)
        single = s.render(mat, res=(16, 16), spp=2, seed=0)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), atol=1e-5
        )

        def loss_sharded(m):
            img = render_sharded(s, m, res=(16, 16), spp=2, seed=0, mesh=mesh)
            return jnp.sum(img[..., :3])

        def loss_single(m):
            return jnp.sum(s.render(m, res=(16, 16), spp=2, seed=0)[..., :3])

        g8 = np.asarray(jax.grad(loss_sharded)(mat))
        g1 = np.asarray(jax.grad(loss_single)(mat))
        assert np.abs(g8).sum() > 0
        np.testing.assert_allclose(g8, g1, rtol=1e-4, atol=1e-5)

    def test_indivisible_pixels_raises(self, scene):
        mesh3 = make_mesh(3)
        mat = jnp.full((8, 8, 4), 0.5)
        with pytest.raises(ValueError, match="not divisible"):
            render_sharded(scene, mat, res=(16, 17), spp=1, seed=0, mesh=mesh3)


class TestBatchedViews:
    """Leading camera/light-pattern batch axis over the mesh (BASELINE.json
    config #5, the light-stage DCN story of SURVEY §5)."""

    def _scene(self):
        s = Scene(
            [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
            integrator="path",
        )
        s.packed_splat = False
        return s

    def _views(self):
        cams = [
            Camera(fov=0.9, origin=float3(-0.2, 2.6, -0.5),
                   target=float3(-0.2, 2.6, -5.0)),
            Camera(fov=0.7, origin=float3(0.3, 2.0, -1.0),
                   target=float3(0.0, 2.6, -5.0)),
        ] * 4
        # emission VALUE patterns (structure fixed: light stays a light)
        patterns = [[None, 15.0 * (1.0 + 0.1 * b)] for b in range(8)]
        return cams, patterns

    def test_batched_matches_sequential(self, mesh):
        scene = self._scene()
        cams, patterns = self._views()
        mat = jnp.full((16, 16, 4), 0.5)
        batched = render_batch(
            scene, mat, cams, patterns, res=(16, 16), spp=4, seed=3, mesh=mesh
        )
        assert batched.shape == (8, 16, 16, 4)
        # sequential reference: same per-view seed derivation (seed + 7919*b)
        for b in [0, 3, 7]:
            scene.update_lights(patterns[b])
            scene.camera = cams[b]
            single = scene.render(mat, res=(16, 16), spp=4, seed=3 + 7919 * b)
            np.testing.assert_allclose(
                np.asarray(batched[b]), np.asarray(single), atol=1e-5,
                err_msg=f"view {b}",
            )

    def test_batched_gradient_sums_views(self, mesh):
        scene = self._scene()
        cams, patterns = self._views()
        mat = jnp.full((16, 16, 4), 0.5)

        def loss_batched(m):
            imgs = render_batch(
                scene, m, cams, patterns, res=(16, 16), spp=2, seed=5, mesh=mesh
            )
            return jnp.sum(imgs[..., :3])

        g_b = np.asarray(jax.grad(loss_batched)(mat))

        g_seq = np.zeros_like(g_b)
        for b in range(8):
            scene.update_lights(patterns[b])
            scene.camera = cams[b]

            def loss_one(m):
                img = scene.render(m, res=(16, 16), spp=2, seed=5 + 7919 * b)
                return jnp.sum(img[..., :3])

            g_seq += np.asarray(jax.grad(loss_one)(mat))
        assert np.abs(g_b).sum() > 0
        np.testing.assert_allclose(g_b, g_seq, rtol=1e-4, atol=1e-5)

    def test_indivisible_batch_raises(self, mesh):
        scene = self._scene()
        cams, patterns = self._views()
        with pytest.raises(ValueError, match="not divisible"):
            render_batch(
                scene, jnp.full((8, 8, 4), 0.5), cams[:3], patterns[:3],
                res=(8, 8), spp=1, mesh=mesh,
            )


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (64, 64, 4)
        assert bool(jnp.isfinite(out).all())

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestPerDeviceWorkScaling:
    """Ground the near-linear multi-chip claim with WORK, not wall clock
    (VERDICT r3 item 6): XLA's per-device cost analysis of the compiled
    sharded backward must show per-device flops shrinking with the mesh,
    with the psum'd texture combine the only replicated term."""

    def test_backward_flops_scale_down(self, scene):
        from zdr_tpu.parallel import build_render_sharded, make_mesh

        mat = jnp.full((32, 32, 4), 0.5, jnp.float32)
        cfg = scene._config((32, 32), 4)

        def flops_at(n):
            mesh = make_mesh(n)
            call = build_render_sharded(cfg, mesh)

            # lower the full grad step through the public sharded callable
            def step(m):
                img = call(m, scene._data, scene.camera, 0)
                return jnp.sum(img[..., :3])

            comp = jax.jit(jax.grad(step)).lower(mat).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca["flops"])

        f1 = flops_at(1)
        f2 = flops_at(2)
        f4 = flops_at(4)
        f8 = flops_at(8)
        # monotone decreasing per-device work
        assert f2 < f1 and f4 < f2 and f8 < f4, (f1, f2, f4, f8)
        # near-linear: the per-device share at 8 devices keeps at least
        # 75% of the ideal 8x reduction; the remainder is the replicated
        # texture combine (psum + quad packing), which is resolution- and
        # mesh-independent
        assert f8 <= f1 / 6.0, (f1, f8, f1 / f8)
        # the replicated term: extrapolate from two mesh sizes and check
        # it stays a small fraction of the single-device work
        repl = max(0.0, 2 * f8 - f4)  # f(n) ~ work/n + repl
        assert repl <= 0.25 * f1, (repl, f1)
