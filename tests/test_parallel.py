"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light
from zdr_tpu.parallel import make_mesh, render_sharded


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

    def test_indivisible_pixels_raises(self, scene):
        mesh3 = make_mesh(3)
        mat = jnp.full((8, 8, 4), 0.5)
        with pytest.raises(ValueError, match="not divisible"):
            render_sharded(scene, mat, res=(16, 17), spp=1, seed=0, mesh=mesh3)


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
