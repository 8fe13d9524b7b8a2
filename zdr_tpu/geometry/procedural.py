"""Procedurally generated test geometry.

The reference ships OBJ assets (sphere.obj, assets/cbox*.obj, quad.obj) plus
several assets its scripts need but that are absent from the snapshot
(bunnyuv.obj, lightstage/*.obj — see SURVEY.md). These generators produce
equivalent geometry so the repo is fully standalone: a UV sphere, a unit
quad, and a Cornell-box-like room with UVs, matching the reference scenes'
scale conventions (cbox spans ~[-3,2.5]x[0,5.3]x[-5.8,-0.2] with a ceiling
light; camera at (-0.2,2.6,6.0) looking down -z).
"""

from __future__ import annotations

import math

import numpy as np

from .load_obj import ObjMesh


def make_quad(size: float = 1.0, y: float = 0.0) -> ObjMesh:
    """XZ-plane quad centered at origin, +y normal (like assets/quad.obj)."""
    s = size
    pos = np.array(
        [[-s, y, s], [s, y, s], [s, y, -s], [-s, y, -s]], dtype=np.float32
    )
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float32)
    nrm = np.tile(np.array([[0, 1, 0]], dtype=np.float32), (4, 1))
    tri = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    return ObjMesh(pos, uv, nrm, tri)


def make_uv_sphere(
    radius: float = 0.5, n_lat: int = 16, n_lon: int = 32
) -> ObjMesh:
    """UV sphere with texture coordinates and exact normals."""
    verts, uvs, nrms = [], [], []
    for i in range(n_lat + 1):
        theta = math.pi * i / n_lat
        for j in range(n_lon + 1):
            phi = 2 * math.pi * j / n_lon
            x = math.sin(theta) * math.cos(phi)
            y = math.cos(theta)
            z = math.sin(theta) * math.sin(phi)
            verts.append((radius * x, radius * y, radius * z))
            nrms.append((x, y, z))
            uvs.append((j / n_lon, 1.0 - i / n_lat))
    tris = []
    stride = n_lon + 1
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * stride + j
            b = a + 1
            c = a + stride
            d = c + 1
            if i != 0:
                tris.append((a, b, c))
            if i != n_lat - 1:
                tris.append((b, d, c))
    return ObjMesh(
        np.array(verts, dtype=np.float32),
        np.array(uvs, dtype=np.float32),
        np.array(nrms, dtype=np.float32),
        np.array(tris, dtype=np.int32),
    )


def _wall(p00, p10, p11, p01, uv_rect=((0, 0), (1, 1))):
    """Quad from 4 corners (CCW seen from the interior), with a uv window."""
    (u0, v0), (u1, v1) = uv_rect
    pos = np.array([p00, p10, p11, p01], dtype=np.float32)
    uv = np.array(
        [[u0, v0], [u1, v0], [u1, v1], [u0, v1]], dtype=np.float32
    )
    e1 = pos[1] - pos[0]
    e2 = pos[3] - pos[0]
    n = np.cross(e2, e1)
    n = n / np.linalg.norm(n)
    nrm = np.tile(n[None, :], (4, 1)).astype(np.float32)
    tri = np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int32)
    return pos, uv, nrm, tri


def make_cornell_box() -> ObjMesh:
    """Cornell-box-like room (floor/ceiling/back/left/right), interior-facing.

    Spans x in [-3, 2.5], y in [0, 5.3], z in [-5.8, -0.2]; each wall gets a
    distinct tile of the unit UV square so a texture is spatially varying
    across the room (the role of assets/cboxuv.obj).
    """
    x0, x1 = -3.0, 2.5
    y0, y1 = 0.0, 5.3
    z0, z1 = -5.8, -0.2
    walls = [
        # floor (+y normal): u,v in [0, .5]x[0, .5]
        _wall((x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1), ((0.0, 0.0), (0.5, 0.5))),
        # ceiling (-y normal)
        _wall((x0, y1, z1), (x1, y1, z1), (x1, y1, z0), (x0, y1, z0), ((0.5, 0.0), (1.0, 0.5))),
        # back wall (+z normal)
        _wall((x0, y0, z0), (x0, y1, z0), (x1, y1, z0), (x1, y0, z0), ((0.0, 0.5), (0.5, 1.0))),
        # left wall (+x normal)
        _wall((x0, y0, z1), (x0, y1, z1), (x0, y1, z0), (x0, y0, z0), ((0.5, 0.5), (0.75, 0.75))),
        # right wall (-x normal)
        _wall((x1, y0, z0), (x1, y1, z0), (x1, y1, z1), (x1, y0, z1), ((0.75, 0.5), (1.0, 0.75))),
    ]
    pos = np.concatenate([w[0] for w in walls])
    uv = np.concatenate([w[1] for w in walls])
    nrm = np.concatenate([w[2] for w in walls])
    tri = np.concatenate(
        [w[3] + 4 * i for i, w in enumerate(walls)]
    ).astype(np.int32)
    return ObjMesh(pos, uv, nrm, tri)


def make_cornell_light() -> ObjMesh:
    """Ceiling area light panel (the role of assets/cbox-light.obj)."""
    y = 5.29
    x0, x1 = -0.9, 0.4
    z0, z1 = -3.6, -2.5
    pos = np.array(
        [[x0, y, z0], [x0, y, z1], [x1, y, z1], [x1, y, z0]], dtype=np.float32
    )
    uv = np.zeros((4, 2), dtype=np.float32)
    nrm = np.tile(np.array([[0.0, -1.0, 0.0]], dtype=np.float32), (4, 1))
    # winding chosen so the geometric normal faces down into the room
    tri = np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int32)
    return ObjMesh(pos, uv, nrm, tri)
