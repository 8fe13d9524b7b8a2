"""Geometry tests: OBJ loading, normal recompute, instance flattening."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from zdr_tpu.geometry.load_obj import read_obj
from zdr_tpu.geometry.mesh import build_geometry
from zdr_tpu.geometry.normals import recompute_normals
from zdr_tpu.geometry.procedural import (
    make_cornell_box,
    make_cornell_light,
    make_quad,
    make_uv_sphere,
)

REF_ASSETS = "/root/reference/assets"


class TestProcedural:
    def test_sphere_normals_radial(self):
        m = make_uv_sphere(radius=2.0)
        r = np.linalg.norm(m.positions, axis=-1)
        np.testing.assert_allclose(r, 2.0, atol=1e-5)
        n_expected = m.positions / r[:, None]
        np.testing.assert_allclose(m.normals, n_expected, atol=1e-5)
        assert m.triangles.max() < len(m.positions)

    def test_cornell_box_closed_and_inward(self):
        m = make_cornell_box()
        # geometric normals should point toward the box interior
        center = (m.positions.min(0) + m.positions.max(0)) / 2
        p0 = m.positions[m.triangles[:, 0]]
        p1 = m.positions[m.triangles[:, 1]]
        p2 = m.positions[m.triangles[:, 2]]
        ng = np.cross(p1 - p0, p2 - p0)
        to_center = center[None] - (p0 + p1 + p2) / 3
        assert np.all(np.sum(ng * to_center, axis=-1) > 0)

    def test_light_below_ceiling(self):
        box = make_cornell_box()
        light = make_cornell_light()
        assert light.positions[:, 1].max() < box.positions[:, 1].max()


class TestRecomputeNormals:
    def test_flat_quad(self):
        m = make_quad()
        n = recompute_normals(m.positions, m.triangles)
        np.testing.assert_allclose(n, np.tile([[0, 1, 0]], (4, 1)), atol=1e-6)

    def test_sphere_close_to_exact(self):
        m = make_uv_sphere(radius=1.0, n_lat=32, n_lon=64)
        n = recompute_normals(m.positions, m.triangles)
        exact = m.normals
        # poles are degenerate; check the bulk
        mask = np.abs(m.positions[:, 1]) < 0.95
        cos = np.sum(n[mask] * exact[mask], axis=-1)
        assert cos.min() > 0.99


class TestBuildGeometry:
    def test_flatten_two_instances(self):
        geom = build_geometry([(make_cornell_box(), None), (make_cornell_light(), None)])
        assert geom.num_instances == 2
        assert int(geom.inst_tri_offset[1]) == int(geom.inst_tri_count[0])
        assert geom.num_triangles == int(geom.inst_tri_count.sum())
        # tri_inst labels
        ti = np.asarray(geom.tri_inst)
        assert (ti[: int(geom.inst_tri_count[0])] == 0).all()
        assert (ti[int(geom.inst_tri_count[0]):] == 1).all()

    def test_transform_applied(self):
        t = np.eye(4)
        t[:3, 3] = [1.0, 2.0, 3.0]
        g0 = build_geometry([(make_quad(), None)])
        g1 = build_geometry([(make_quad(), t)])
        np.testing.assert_allclose(
            np.asarray(g1.positions), np.asarray(g0.positions) + np.array([1, 2, 3]), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(g1.normals), np.asarray(g0.normals), atol=1e-6)

    def test_rotation_transforms_normals(self):
        th = 0.5
        rot = np.eye(4)
        rot[:3, :3] = [
            [np.cos(th), 0, np.sin(th)],
            [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)],
        ]
        g = build_geometry([(make_quad(), rot)])
        # quad normal (0,1,0) is invariant under y-rotation
        np.testing.assert_allclose(np.asarray(g.normals), np.tile([[0, 1, 0]], (4, 1)), atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS), reason="reference assets unavailable")
class TestReadObjReferenceAssets:
    def test_quad(self):
        m = read_obj(os.path.join(REF_ASSETS, "quad.obj"))
        assert len(m.positions) == 0 or m.triangles.shape[1] == 3

    def test_cbox(self):
        m = read_obj(os.path.join(REF_ASSETS, "cboxuv.obj"))
        assert len(m.positions) > 0
        assert m.triangles.max() < len(m.positions)
        assert np.isfinite(m.positions).all()
        # cboxuv has vt
        assert (np.abs(m.uvs).sum() > 0)

    def test_sphere_has_normals(self):
        m = read_obj("/root/reference/sphere.obj")
        assert np.isfinite(m.normals).all()
        r = np.linalg.norm(m.normals, axis=-1)
        np.testing.assert_allclose(r, 1.0, atol=1e-2)
