"""Wavefront OBJ loading → numpy arrays.

Behavior parity with /root/reference/load_obj.py: vertices are re-indexed by
the unique (position, uv, normal) triple; a missing uv becomes (0, 0); a
missing normal becomes NaN (sentinel that triggers normal recomputation,
render.py:101-103); polygons are fan-triangulated (load_obj.py:63-68).

Returns struct-of-arrays instead of the reference's list-of-tuples: that is
the layout the device wants.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ObjMesh(NamedTuple):
    positions: np.ndarray  # (V, 3) float32
    uvs: np.ndarray  # (V, 2) float32
    normals: np.ndarray  # (V, 3) float32 (NaN if the file had none)
    triangles: np.ndarray  # (T, 3) int32


def read_obj(file_path: str) -> ObjMesh:
    positions = []
    tex_coords = []
    normals = []
    faces = []
    vertices = []  # list of (pos, uv, normal) tuples
    vertex_indices = {}

    with open(file_path, "r") as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                positions.append(tuple(map(float, parts[1:4])))
            elif tag == "vt":
                tex_coords.append(tuple(map(float, parts[1:3])))
            elif tag == "vn":
                normals.append(tuple(map(float, parts[1:4])))
            elif tag == "f":
                face = []
                for part in parts[1:]:
                    idx = part.split("/")
                    pos_i = int(idx[0]) - 1
                    tex_i = int(idx[1]) - 1 if len(idx) > 1 and idx[1] else None
                    nrm_i = int(idx[2]) - 1 if len(idx) > 2 and idx[2] else None
                    key = (
                        positions[pos_i],
                        tex_coords[tex_i] if tex_i is not None else (0.0, 0.0),
                        normals[nrm_i] if nrm_i is not None else (float("nan"),) * 3,
                    )
                    if key not in vertex_indices:
                        vertex_indices[key] = len(vertices)
                        vertices.append(key)
                    face.append(vertex_indices[key])
                faces.append(face)

    tris = []
    for f in faces:
        for i in range(2, len(f)):
            tris.append((f[0], f[i - 1], f[i]))

    pos = np.array([v[0] for v in vertices], dtype=np.float32)
    uv = np.array([v[1] for v in vertices], dtype=np.float32)
    nrm = np.array([v[2] for v in vertices], dtype=np.float32)
    tri = np.array(tris, dtype=np.int32).reshape(-1, 3)
    return ObjMesh(pos, uv, nrm, tri)
