"""End-to-end application smoke tests (reference example.py /
test_lightstage.py workflows, CI-sized)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))


class TestExample:
    def test_texture_recovery(self, tmp_path, monkeypatch):
        monkeypatch.setattr(
            sys, "argv", ["example.py", "--small", "--iters", "10", "--out", str(tmp_path)]
        )
        import example

        mse = example.main()
        # recovered image should be close to GT after a few Adam steps
        assert mse < 0.2, mse
        # EXR + PNG workflow outputs (reference example.py:92-96)
        from zdr_tpu.imageio_exr import load_exr

        for name in ["diffuse", "roughness", "gt", "recon", "duvdxy_det"]:
            assert (tmp_path / f"{name}.exr").exists()
            assert (tmp_path / f"{name}.png").exists()
        d = load_exr(str(tmp_path / "diffuse.exr"))
        assert d.ndim == 3 and d.shape[2] == 3


class TestLightstage:
    def test_multi_light_recovery(self, monkeypatch):
        monkeypatch.setattr(sys, "argv", ["lightstage.py", "--small"])
        import lightstage

        r = lightstage.main()
        # judge convergence on the loss EXCESS above the MC noise floor:
        # under the pmj02bn default the floor is most of the raw loss at
        # CI sizes, so a raw-ratio gate only measures noise, not recovery
        excess_first = r["loss_first"] - r["noise_floor"]
        excess_last = r["loss_last"] - r["noise_floor"]
        assert excess_first > 0, r
        assert excess_last < 0.8 * excess_first, r

    def test_batched_matches_sequential_lightstage(self):
        """The app's epsilon-off pattern policy makes render_batch bit-match
        the sequential update_lights loop on the lightstage scene (direct
        integrator, many instances, ON/OFF light patterns). With None-off
        patterns the two modes legitimately diverge: update_lights rebuilds
        the light STRUCTURE per view while the batch shares one static
        structure (build_render_batched docstring)."""
        import jax
        import jax.numpy as jnp

        import lightstage
        from zdr_tpu import Camera, float3
        from zdr_tpu.parallel import make_mesh, render_batch

        scene = lightstage.build_lightstage(6)
        scene.camera = Camera(
            fov=0.87, origin=float3(0, 0.5, 2), target=float3(0, 0, 0)
        )
        gt = jax.random.uniform(jax.random.PRNGKey(5), (16, 16, 4),
                                minval=0.2, maxval=0.8)
        res, spp = (16, 16), 2
        patterns = [
            [None] + [50.0 if i % 2 == g else 1e-6 for i in range(6)]
            for g in range(2)
        ]
        batched = render_batch(
            scene, gt, scene.camera, patterns, res=res, spp=spp, seed=11,
            mesh=make_mesh(2),
        )
        import numpy as np

        for p, em in enumerate(patterns):
            scene.update_lights(em)
            single = scene.render(gt, res=res, spp=spp, seed=11 + 7919 * p)
            np.testing.assert_allclose(
                np.asarray(batched[p]), np.asarray(single), atol=1e-6,
                err_msg=f"view {p}",
            )

    def test_batched_mode_recovers(self, monkeypatch):
        """--batched: all patterns render per step through
        parallel.render_batch over the CPU mesh, and the joint optimizer
        RECOVERS (VERDICT r4 item 8): at an 8^2 texture each texel
        averages enough pixels that the gradient signal beats the CI-sized
        MC noise (calibrated: diffuse error 0.1535 -> 0.1479 and loss
        704 -> 640 in 10 iterations; the 32^2 CI texture showed no
        measurable recovery at this budget). batched==sequential
        equivalence is gated bit-tight in test_parallel.py."""
        monkeypatch.setattr(
            sys, "argv",
            ["lightstage.py", "--small", "--batched", "--iters", "10",
             "--tex", "8"],
        )
        import importlib

        import lightstage

        importlib.reload(lightstage)
        r = lightstage.main()
        assert r["loss_first"] > 0 and r["noise_floor"] > 0, r
        # convergence, not boundedness: the diffuse error must shrink
        # from the 0.5-init and the joint loss must drop
        assert r["tex_err_diffuse"] < 0.985 * r["tex_err0_diffuse"], r
        assert r["loss_last"] < 0.97 * r["loss_first"], r
        # and not diverge past the noise band
        assert r["loss_last"] < 1.5 * r["noise_floor"], r
