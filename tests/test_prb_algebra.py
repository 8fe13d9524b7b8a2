"""PRB backward algebra gate: the hand-written path backward must equal
pure jax.grad through the forward estimator on the SAME sample stream.

This is the check that caught (round 2) a throughput-factor bug inherited
from the reference's stale prb.py:157-163: with absolute remaining-radiance
bookkeeping the continuation adjoint must be Le/bsdf, not beta/pdf*Le (the
latter carries a spurious beta_{j+1}). Before the fix this test read ~12-15%
on diffuse channels at max_depth >= 2; after, ~2e-6.

Channel semantics:
  * diffuse channels never influence sampling decisions (with RR pushed
    past max_depth), so detached-sampling PRB and full autodiff compute
    the same derivative -> tight tolerance.
  * the roughness channel drives VNDF lobe shapes / MIS weights / pdfs;
    PRB detaches those (exactly like the reference's in-kernel AD seeds
    only the brdf value), while jax.grad differentiates through them.
    Both estimators are unbiased for the true derivative, but they differ
    per-realization — no per-seed assertion is possible there.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light
from zdr_tpu.integrators import get_integrator
from zdr_tpu.integrators.wrapper import (
    _pixel_grid,
    render_forward_rays,
    render_grad_rays,
)

SEED = 3
RES, SPP = 24, 8


def _setup(max_depth):
    scene = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator="path",
    )
    scene.camera = Camera(
        fov=50 / 180 * 3.14159,
        origin=float3(-0.2, 2.6, -0.5),
        target=float3(-0.2, 2.6, -5.0),
    )
    scene.rr_depth = 99  # RR survival scale is detached; keep it out of play
    scene.max_depth = max_depth
    cfg = dataclasses.replace(
        scene._config((RES, RES), SPP),
        persistent=False,
        stochastic_splat=False,  # exact 4-corner splat for exact comparison
    )
    material = jax.random.uniform(
        jax.random.PRNGKey(0), (24, 24, 4), minval=0.25, maxval=0.75
    )
    return scene, cfg, material


def _grads(scene, cfg, material):
    estimator, backward = get_integrator("path")
    coords = _pixel_grid((RES, RES))
    data, cam = scene._data, scene.camera
    seed = jnp.asarray(SEED, jnp.int32)
    le = jnp.ones((RES * RES, 3), jnp.float32) / SPP

    def fwd_sum(m):
        return jnp.sum(
            render_forward_rays(data, m, cam, seed, cfg, estimator, coords)
        )

    g_pure = np.asarray(jax.grad(fwd_sum)(material))
    g_prb = np.asarray(
        render_grad_rays(
            data, material, cam, seed, le, cfg, estimator, backward, coords
        )
    )
    return g_pure, g_prb


class TestPRBEqualsAutodiff:
    def test_depth3_diffuse_channels_exact(self):
        scene, cfg, material = _setup(max_depth=3)
        g_pure, g_prb = _grads(scene, cfg, material)
        scale = np.abs(g_pure[..., :3]).max()
        assert scale > 0
        rel = np.abs(g_prb[..., :3] - g_pure[..., :3]).max() / scale
        assert rel < 1e-4, rel

    def test_depth1_single_bounce_exact(self):
        scene, cfg, material = _setup(max_depth=1)
        g_pure, g_prb = _grads(scene, cfg, material)
        scale = np.abs(g_pure[..., :3]).max()
        rel = np.abs(g_prb[..., :3] - g_pure[..., :3]).max() / scale
        assert rel < 1e-4, rel

    def test_persistent_matches_scan_backward(self):
        """The persistent-lane backward and the scan backward share sample
        AND splat-salt streams, so with the stochastic splat they must
        agree to summation-order tolerance."""
        scene, cfg, material = _setup(max_depth=4)
        # splat_merge pinned off: the scan backward emits every tap, so
        # realization equality only holds against an unmerged persistent walk
        # (merge UNBIASEDNESS is gated separately in test_config_knobs.py).
        cfg_st = dataclasses.replace(cfg, stochastic_splat=True, splat_merge=1)
        cfg_pers = dataclasses.replace(
            cfg_st, persistent=True, fused=False
        )
        estimator, backward = get_integrator("path")
        coords = _pixel_grid((RES, RES))
        data, cam = scene._data, scene.camera
        seed = jnp.asarray(SEED, jnp.int32)
        le = jnp.ones((RES * RES, 3), jnp.float32) / SPP
        g_scan = np.asarray(
            render_grad_rays(
                data, material, cam, seed, le, cfg_st, estimator, backward, coords
            )
        )
        g_pers = np.asarray(
            render_grad_rays(
                data, material, cam, seed, le, cfg_pers, estimator, backward, coords
            )
        )
        scale = np.abs(g_scan).max()
        assert np.abs(g_pers - g_scan).max() / scale < 2e-3
