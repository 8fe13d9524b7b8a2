"""Intersection tests: brute force vs analytic, BVH vs brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdr_tpu.accel import build_accel, trace_any, trace_closest
from zdr_tpu.geometry.mesh import build_geometry
from zdr_tpu.geometry.procedural import make_cornell_box, make_quad, make_uv_sphere
from zdr_tpu.vecmath import normalize


def sphere_geom(n_lat=24, n_lon=48):
    return build_geometry([(make_uv_sphere(radius=1.0, n_lat=n_lat, n_lon=n_lon), None)])


def random_rays(n, key=0, r=3.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    o = normalize(jax.random.normal(k1, (n, 3))) * r
    target = jax.random.normal(k2, (n, 3)) * 0.3
    d = normalize(target - o)
    return o, d


class TestBruteForce:
    def test_sphere_hit_distance(self):
        geom = sphere_geom(n_lat=64, n_lon=128)
        accel = build_accel(geom, method="bruteforce")
        o = jnp.array([[3.0, 0.0, 0.0]])
        d = jnp.array([[-1.0, 0.0, 0.0]])
        hit = trace_closest(accel, o, d)
        assert not bool(hit.miss[0])
        np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=2e-3)
        assert int(hit.inst[0]) == 0

    def test_miss(self):
        geom = sphere_geom()
        accel = build_accel(geom, method="bruteforce")
        o = jnp.array([[3.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        hit = trace_closest(accel, o, d)
        assert bool(hit.miss[0])
        assert int(hit.prim[0]) == -1

    def test_trace_any_matches_closest(self):
        geom = sphere_geom()
        accel = build_accel(geom, method="bruteforce")
        o, d = random_rays(512, key=1)
        hit = trace_closest(accel, o, d)
        occ = trace_any(accel, o, d, t_min=1e-4, t_max=1e30)
        np.testing.assert_array_equal(np.asarray(occ), ~np.asarray(hit.miss))

    def test_t_max_respected(self):
        geom = sphere_geom()
        accel = build_accel(geom, method="bruteforce")
        o = jnp.array([[3.0, 0.0, 0.0]])
        d = jnp.array([[-1.0, 0.0, 0.0]])
        occ = trace_any(accel, o, d, t_min=1e-4, t_max=1.5)
        assert not bool(occ[0])  # sphere surface at t=2

    def test_interpolate_position(self):
        geom = sphere_geom(n_lat=64, n_lon=128)
        accel = build_accel(geom, method="bruteforce")
        o, d = random_rays(256, key=2)
        hit = trace_closest(accel, o, d)
        p = o + hit.t[:, None] * d
        ok = ~np.asarray(hit.miss)
        r = np.linalg.norm(np.asarray(p)[ok], axis=-1)
        assert np.abs(r - 1.0).max() < 5e-3


class TestBVH:
    def test_matches_bruteforce_sphere(self):
        geom = sphere_geom(n_lat=32, n_lon=64)
        brute = build_accel(geom, method="bruteforce")
        bvh = build_accel(geom, method="bvh")
        o, d = random_rays(2048, key=3)
        h1 = trace_closest(brute, o, d)
        h2 = trace_closest(bvh, o, d)
        np.testing.assert_array_equal(np.asarray(h1.miss), np.asarray(h2.miss))
        ok = ~np.asarray(h1.miss)
        np.testing.assert_allclose(
            np.asarray(h1.t)[ok], np.asarray(h2.t)[ok], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(h1.prim)[ok], np.asarray(h2.prim)[ok])

    def test_matches_bruteforce_cbox(self):
        geom = build_geometry([(make_cornell_box(), None), (make_quad(), None)])
        brute = build_accel(geom, method="bruteforce")
        bvh = build_accel(geom, method="bvh")
        # rays from inside the box in random directions
        k = jax.random.PRNGKey(4)
        o = jnp.tile(jnp.array([[-0.2, 2.6, -2.0]]), (1024, 1))
        d = normalize(jax.random.normal(k, (1024, 3)))
        h1 = trace_closest(brute, o, d)
        h2 = trace_closest(bvh, o, d)
        np.testing.assert_array_equal(np.asarray(h1.miss), np.asarray(h2.miss))
        ok = ~np.asarray(h1.miss)
        np.testing.assert_allclose(np.asarray(h1.t)[ok], np.asarray(h2.t)[ok], rtol=1e-5, atol=1e-5)

    def test_any_hit(self):
        geom = sphere_geom(n_lat=32, n_lon=64)
        bvh = build_accel(geom, method="bvh")
        o, d = random_rays(1024, key=5)
        occ = trace_any(bvh, o, d, t_min=1e-4, t_max=1e30)
        hit = trace_closest(bvh, o, d)
        np.testing.assert_array_equal(np.asarray(occ), ~np.asarray(hit.miss))

    def test_jit_compatible(self):
        geom = sphere_geom()
        bvh = build_accel(geom, method="bvh")
        o, d = random_rays(64, key=6)

        @jax.jit
        def f(o, d):
            return trace_closest(bvh, o, d).t

        t = f(o, d)
        assert np.isfinite(np.asarray(t)).any()


class TestNativeBVH:
    def test_native_builder_available(self):
        from zdr_tpu.accel.native import native_available

        assert native_available(), "g++ toolchain should build the native BVH"

    def test_native_matches_bruteforce(self):
        from zdr_tpu.accel.bvh import LEAF_SIZE
        from zdr_tpu.accel.native import build_bvh_native

        geom = sphere_geom(n_lat=32, n_lon=64)
        tris = np.asarray(geom.triangles)
        pos = np.asarray(geom.positions)
        b = build_bvh_native(pos[tris[:, 0]], pos[tris[:, 1]], pos[tris[:, 2]], LEAF_SIZE)
        assert b is not None
        # structural sanity
        assert b.node_is_leaf.any()
        real = b.tri_perm[b.tri_perm >= 0]
        assert sorted(real.tolist()) == list(range(tris.shape[0]))
        # every leaf owns exactly LEAF_SIZE slots
        assert len(b.tri_perm) % LEAF_SIZE == 0
        # traversal agreement vs brute force (native build is the default
        # 'bvh' path in build_accel)
        brute = build_accel(geom, method="bruteforce")
        bvh = build_accel(geom, method="bvh")
        o, d = random_rays(2048, key=7)
        h1 = trace_closest(brute, o, d)
        h2 = trace_closest(bvh, o, d)
        np.testing.assert_array_equal(np.asarray(h1.miss), np.asarray(h2.miss))
        ok = ~np.asarray(h1.miss)
        np.testing.assert_allclose(np.asarray(h1.t)[ok], np.asarray(h2.t)[ok], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(h1.prim)[ok], np.asarray(h2.prim)[ok])


class TestPallasTrace:
    """Pallas kernel runs in interpret mode on CPU; compiled on TPU."""

    def test_matches_bruteforce(self):
        geom = sphere_geom(n_lat=16, n_lon=32)
        brute = build_accel(geom, method="bruteforce")
        pallas = build_accel(geom, method="pallas")
        o, d = random_rays(1000, key=11)
        h1 = trace_closest(brute, o, d)
        h2 = trace_closest(pallas, o, d)
        np.testing.assert_array_equal(np.asarray(h1.miss), np.asarray(h2.miss))
        ok = ~np.asarray(h1.miss)
        np.testing.assert_allclose(np.asarray(h1.t)[ok], np.asarray(h2.t)[ok], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(h1.prim)[ok], np.asarray(h2.prim)[ok])
        occ1 = trace_any(brute, o, d, t_min=1e-4, t_max=1e30)
        occ2 = trace_any(pallas, o, d, t_min=1e-4, t_max=1e30)
        np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))

    def test_full_render_and_grad(self):
        import jax.numpy as jnp
        from zdr_tpu import Camera, Scene, float3
        from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light

        scenes = []
        for accel_kind in ("pallas", "bruteforce"):
            s = Scene(
                [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
                integrator="path",
                accel=accel_kind,
            )
            s.camera = __import__("zdr_tpu").Camera(
                fov=0.9, origin=float3(-0.2, 2.6, -0.5), target=float3(-0.2, 2.6, -5.0)
            )
            scenes.append(s)
        mat = jnp.full((16, 16, 4), 0.5)
        imgs = [np.asarray(s.render(mat, res=(16, 16), spp=4, seed=0)) for s in scenes]
        np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-5)
        grads = [
            np.asarray(
                jax.grad(lambda m, s=s: jnp.sum(s.render(m, res=(16, 16), spp=4, seed=0)[..., :3]))(mat)
            )
            for s in scenes
        ]
        np.testing.assert_allclose(grads[0], grads[1], rtol=1e-4, atol=1e-4)


class TestStackless:
    """Escape-link (stackless) traversal structure (accel/bvh.to_stackless):
    the default BVH path since round 2 — the stack-based loop paid two
    (N,)-row scatters per step (11.4 s/trace at 66k tris on TPU; stackless
    measured 2.5-3x faster and scatter-free)."""

    def test_preorder_walk_visits_all_nodes(self):
        from zdr_tpu.accel.bvh import build_bvh, to_stackless

        rng = np.random.default_rng(0)
        v0 = rng.random((300, 3)).astype(np.float32)
        v1 = v0 + rng.random((300, 3)).astype(np.float32) * 0.1
        v2 = v0 + rng.random((300, 3)).astype(np.float32) * 0.1
        s = to_stackless(build_bvh(v0, v1, v2))
        m = s.node_packed.shape[0]
        esc = s.node_packed[:, 6].view(np.int32)
        leafw = s.node_packed[:, 7].view(np.int32)
        # always-descend walk == preorder: must visit 0..m-1 in order
        node, seen = 0, 0
        while node < m:
            assert node == seen
            seen += 1
            node = node + 1 if leafw[node] == 0 else int(esc[node])
        assert seen == m
        # always-miss walk from the root exits immediately
        assert esc[0] == m

    def test_native_tree_roundtrip(self):
        """to_stackless must handle the native SAH builder's node order."""
        from zdr_tpu.accel.bvh import build_bvh, to_stackless
        from zdr_tpu.accel.native import build_bvh_native

        geom = sphere_geom(n_lat=16, n_lon=24)
        tris = np.asarray(geom.triangles)
        pos = np.asarray(geom.positions)
        v0, v1, v2 = pos[tris[:, 0]], pos[tris[:, 1]], pos[tris[:, 2]]
        b = build_bvh_native(v0, v1, v2, 8)
        if b is None:
            b = build_bvh(v0, v1, v2)
        s = to_stackless(b)
        m = s.node_packed.shape[0]
        esc = s.node_packed[:, 6].view(np.int32)
        leafw = s.node_packed[:, 7].view(np.int32)
        node, seen = 0, 0
        while node < m:
            assert node == seen
            seen += 1
            node = node + 1 if leafw[node] == 0 else int(esc[node])
        assert seen == m

    def test_occlusion_matches_bruteforce(self):
        geom = sphere_geom(n_lat=24, n_lon=48)
        brute = build_accel(geom, method="bruteforce")
        bvh = build_accel(geom, method="bvh")
        assert bvh.node_packed is not None
        o, d = random_rays(1024, key=9)
        a1 = np.asarray(trace_any(brute, o, d, t_min=1e-4, t_max=2.5))
        a2 = np.asarray(trace_any(bvh, o, d, t_min=1e-4, t_max=2.5))
        np.testing.assert_array_equal(a1, a2)

    @pytest.mark.parametrize("n_tiers", [2, 4])
    def test_tiered_compaction_matches_plain(self, n_tiers):
        """Stream-compacted tiered traversal (sort-by-node + shrinking
        static widths) must be hit-for-hit identical to the plain
        stackless loop (it reorders lanes, never changes math). n_tiers=2
        is the in-render default (Accel.traversal='auto'); higher tier
        counts have no public knob since round 4 but the code path stays
        gated."""
        from zdr_tpu.accel.trace import _bvh_stackless, _bvh_stackless_tiered

        geom = sphere_geom(n_lat=16, n_lon=24)
        a = build_accel(geom, method="bvh")
        o, d = random_rays(4096, key=11)
        bt1, p1, u1, v1 = _bvh_stackless_tiered(
            a, o, d, 0.0, 1e30, True, n_tiers=n_tiers
        )
        bt2, p2, u2, v2 = _bvh_stackless(a, o, d, 0.0, 1e30, True)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(bt1), np.asarray(bt2))
        occ1 = _bvh_stackless_tiered(a, o, d, 1e-4, 2.5, False, n_tiers=n_tiers)
        occ2 = _bvh_stackless(a, o, d, 1e-4, 2.5, False)
        np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))

    def test_traversal_dispatch_hit_for_hit(self):
        """Accel.traversal (static field, replaces the round-2 mutable
        module global — ADVICE r2) routes to identical results."""
        import dataclasses

        import zdr_tpu.accel.trace as trace_mod

        geom = sphere_geom(n_lat=16, n_lon=24)
        a = build_accel(geom, method="bvh")
        o, d = random_rays(512, key=13)
        h0 = trace_closest(dataclasses.replace(a, traversal="stackless"), o, d)
        old = trace_mod.TIERED_MIN_RAYS
        trace_mod.TIERED_MIN_RAYS = 1  # force the tiered-2 route
        try:
            h1 = trace_closest(dataclasses.replace(a, traversal="auto"), o, d)
        finally:
            trace_mod.TIERED_MIN_RAYS = old
        for h in (h1,):
            np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(h0.prim))
            np.testing.assert_allclose(np.asarray(h.t), np.asarray(h0.t), atol=1e-6)
        # retired knobs fail loudly instead of silently falling back
        with pytest.raises(ValueError):
            trace_closest(dataclasses.replace(a, traversal="tiered4"), o, d)
