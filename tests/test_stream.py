"""HBM-streamed MXU trace (pallas_stream): parity with the VMEM-resident
fused kernel-1 and with the unfused accel trace, plus end-to-end renders
on a mesh forced through the streamed path.

The streamed sweep is the big-mesh (> FUSED_MAX_TRIS) trace; CI forces
tiny chunk/tile sizes so a small sphere exercises the multi-chunk grid,
the cross-chunk argmin merge, and the occlusion early-exit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdr_tpu import Camera, Scene, float3
from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere
from zdr_tpu.integrators import pallas_bounce as pb
from zdr_tpu.integrators import pallas_stream as ps
from zdr_tpu.integrators.pallas_bounce import (
    LANES,
    build_fused_const,
    build_woop_pack,
    fused_trace_interact,
    pad_to_planes,
    planes_rows,
)


@pytest.fixture(scope="module")
def sphere_scene():
    scene = Scene(
        [
            (make_uv_sphere(0.5, 16, 32), None, None),
            (make_quad(size=1.0, y=-2.0), None, 40.0),
        ],
        integrator="direct",
    )
    scene.camera = Camera(
        fov=0.8, origin=float3(1.5, 0.3, 0.0), target=float3(0.0, 0.0, 0.0)
    )
    return scene


def _ray_planes(n=2048, seed=3):
    rs = np.random.RandomState(seed)
    rows = planes_rows(n)
    d = rs.randn(rows * LANES, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = rs.randn(rows * LANES, 3).astype(np.float32) * 0.8
    op = tuple(jnp.asarray(o[:, k].reshape(rows, LANES)) for k in range(3))
    dp = tuple(jnp.asarray(d[:, k].reshape(rows, LANES)) for k in range(3))
    act = jnp.ones((rows, LANES), jnp.int32)
    return op, dp, act, rows


def test_stream_closest_matches_vmem_kernel(sphere_scene):
    """Streamed multi-chunk closest == the VMEM woop kernel, hit for hit
    (same winning triangle after the Morton permutation, same t/u/v)."""
    data = sphere_scene._data
    meta = data.fused_meta
    scene_pack, _ = build_fused_const(data, meta)
    woop = build_woop_pack(scene_pack)
    # force 4 chunks x 2 tiles at the sphere's ~1k triangles
    pack = ps.build_stream_pack(scene_pack, chunk=256, tile=128)
    assert pack[2] // pack[4] >= 2, "test must span multiple chunks"

    op, dp, act, rows = _ray_planes()
    big = jnp.full((rows, LANES), 1e30, jnp.float32)
    ref = fused_trace_interact(
        scene_pack, meta.num_tris, (*op, *dp, big, act),
        interpret=True, woop=woop,
    )
    out = ps.stream_trace_interact(
        pack, (*op, *dp, big, act), interpret=True
    )
    # plane order: p3, uv2, ns3, ng3, shade, add_emit3, miss
    for k, name in ((0, "px"), (3, "u"), (5, "nsx"), (12, "aer")):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )
    np.testing.assert_array_equal(np.asarray(out[11]), np.asarray(ref[11]))
    np.testing.assert_array_equal(np.asarray(out[15]), np.asarray(ref[15]))


def test_stream_any_matches_vmem_kernel(sphere_scene):
    """Streamed occlusion == the in-kernel MXU shadow sweep semantics
    (t_min=1e-4, t_max=t_hi), including the all-occluded early exit."""
    data = sphere_scene._data
    meta = data.fused_meta
    scene_pack, _ = build_fused_const(data, meta)
    pack = ps.build_stream_pack(scene_pack, chunk=256, tile=128)

    op, dp, act, rows = _ray_planes(seed=11)
    thi = jnp.full((rows, LANES), 3.0, jnp.float32)
    occ = ps.stream_any(pack, (*op, *dp, thi, act), interpret=True)

    # reference: unfused brute-force any-hit over the same triangles
    from zdr_tpu.accel.trace import trace_any
    o_flat = jnp.stack([p.reshape(-1) for p in op], axis=-1)
    d_flat = jnp.stack([p.reshape(-1) for p in dp], axis=-1)
    ref = trace_any(data.accel, o_flat, d_flat, t_min=1e-4, t_max=3.0)
    got = np.asarray(occ).reshape(-1) != 0
    np.testing.assert_array_equal(got, np.asarray(ref))


@pytest.mark.parametrize("chunks", ["one", "multi"])
def test_stream_render_matches_unfused(sphere_scene, chunks):
    """End-to-end: the fused pipeline with the streamed trace (forced via
    a tiny stream threshold) matches the unfused render at the fused
    pipeline's documented 2e-3 tolerance, and gradients flow. 'multi'
    additionally forces several chunks so the chunk-ordered worklist path
    (and the direct integrator's emissive-first bounce lookup across
    chunk boundaries) is exercised in-render."""
    scene = sphere_scene
    mat = jnp.full((32, 32, 4), 0.5, jnp.float32)
    scene.fused = "off"
    ref = scene.render(mat, res=(32, 32), spp=4, seed=0)

    scene.fused = "force"
    old = pb.FUSED_MAX_TRIS
    old_one, old_chunk = ps.STREAM_ONECHUNK_TRIS, ps.STREAM_CHUNK
    pb.FUSED_MAX_TRIS = 64  # sphere (~1k tris) must take the streamed path
    if chunks == "multi":
        ps.STREAM_ONECHUNK_TRIS = 0
        ps.STREAM_CHUNK = 256
    try:
        img = scene.render(mat, res=(32, 32), spp=4, seed=0)
        g = jax.grad(
            lambda m: jnp.sum(
                scene.render(m, res=(32, 32), spp=2, seed=0)[..., :3]
            )
        )(mat)
    finally:
        pb.FUSED_MAX_TRIS = old
        ps.STREAM_ONECHUNK_TRIS, ps.STREAM_CHUNK = old_one, old_chunk
    assert bool(jnp.isfinite(img).all())
    assert float(jnp.abs(g).sum()) > 0
    md = float(jnp.abs(img[..., :3] - ref[..., :3]).mean())
    assert md < 2e-3, md


class TestAccelStream:
    """accel.method == 'stream': the standalone trace API routed through
    the streamed MXU sweep (the big-mesh default on accelerators)."""

    @pytest.fixture(scope="class")
    def accels(self):
        from zdr_tpu.accel.build import build_accel
        from zdr_tpu.geometry.mesh import build_geometry

        geom = build_geometry([(make_uv_sphere(0.5, 16, 32), None)])
        return (
            build_accel(geom, method="stream"),
            build_accel(geom, method="bruteforce"),
        )

    def _rays(self, n=4096, seed=5):
        rs = np.random.RandomState(seed)
        d = rs.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = rs.randn(n, 3).astype(np.float32) * 0.8
        return jnp.asarray(o), jnp.asarray(d)

    def test_closest_matches_bruteforce(self, accels):
        from zdr_tpu.accel.trace import trace_closest

        acc_s, acc_b = accels
        o, d = self._rays()
        hs = trace_closest(acc_s, o, d)
        hb = trace_closest(acc_b, o, d)
        np.testing.assert_array_equal(np.asarray(hs.miss), np.asarray(hb.miss))
        hit = ~np.asarray(hb.miss)
        np.testing.assert_array_equal(
            np.asarray(hs.prim)[hit], np.asarray(hb.prim)[hit]
        )
        np.testing.assert_allclose(
            np.asarray(hs.t)[hit], np.asarray(hb.t)[hit], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(hs.bary_u)[hit], np.asarray(hb.bary_u)[hit],
            rtol=1e-4, atol=1e-5,
        )

    def test_any_matches_bruteforce(self, accels):
        from zdr_tpu.accel.trace import trace_any

        acc_s, acc_b = accels
        o, d = self._rays(seed=9)
        tmax = jnp.asarray(
            np.random.RandomState(1).uniform(0.5, 3.0, o.shape[0]),
            jnp.float32,
        )
        os_ = trace_any(acc_s, o, d, t_min=1e-4, t_max=tmax)
        ob = trace_any(acc_b, o, d, t_min=1e-4, t_max=tmax)
        np.testing.assert_array_equal(np.asarray(os_), np.asarray(ob))

    def test_collocated_render_via_stream_accel(self):
        """End-to-end: an unfused integrator (collocated) rendering through
        a stream-method accel matches the bruteforce accel exactly (same
        estimator; the trace is hit-identical)."""
        from zdr_tpu import Camera, Scene, float3

        mat = jnp.full((16, 16, 4), 0.5, jnp.float32)
        imgs = []
        for method in ("stream", "bruteforce"):
            s = Scene(
                [(make_uv_sphere(0.5, 16, 32), None, None)],
                integrator="collocated",
                accel=method,
            )
            s.camera = Camera(
                fov=0.8, origin=float3(1.5, 0.3, 0.0),
                target=float3(0.0, 0.0, 0.0),
            )
            imgs.append(np.asarray(s.render(mat, res=(24, 24), spp=2, seed=0)))
        np.testing.assert_allclose(imgs[0], imgs[1], rtol=1e-5, atol=1e-6)
