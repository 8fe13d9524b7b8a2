"""Wavefront OBJ loading → numpy struct-of-arrays.

Behavior parity with /root/reference/load_obj.py: every face corner is
re-indexed by the value of its (position, uv, normal) triple — corners
citing different v/vt/vn slots that hold identical values share one output
vertex; a missing uv becomes (0, 0); a missing normal becomes NaN (the
sentinel that triggers normal recomputation downstream, render.py:101-103);
polygons are fan-triangulated (load_obj.py:63-68).

Unlike the reference's per-corner dict loop, parsing is two-phase: a text
scan collects the raw v/vt/vn rows and per-corner slot references, then the
dedup, vertex numbering and fan triangulation run as vectorized numpy passes
(np.unique over the gathered corner rows — bitwise row comparison, with
-0.0 normalized and all NaN sentinels sharing one bit pattern, reproduces
the reference's value-equality dedup; first-appearance renumbering keeps
the output vertex order identical).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ObjMesh(NamedTuple):
    positions: np.ndarray  # (V, 3) float32
    uvs: np.ndarray  # (V, 2) float32
    normals: np.ndarray  # (V, 3) float32 (NaN if the file had none)
    triangles: np.ndarray  # (T, 3) int32


def _scan(file_path: str):
    """Text pass: raw attribute rows + per-corner (v, vt, vn) slot refs
    (-1 = the corner omits that slot) + per-face corner counts."""
    pos_rows: list = []
    uv_rows: list = []
    nrm_rows: list = []
    corner_refs: list = []
    face_sizes: list = []
    with open(file_path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                pos_rows.append(parts[1:4])
            elif tag == "vt":
                uv_rows.append(parts[1:3])
            elif tag == "vn":
                nrm_rows.append(parts[1:4])
            elif tag == "f":
                for corner in parts[1:]:
                    s = corner.split("/")
                    corner_refs.append(
                        (
                            int(s[0]) - 1,
                            int(s[1]) - 1 if len(s) > 1 and s[1] else -1,
                            int(s[2]) - 1 if len(s) > 2 and s[2] else -1,
                        )
                    )
                face_sizes.append(len(parts) - 1)
    return pos_rows, uv_rows, nrm_rows, corner_refs, face_sizes


def _rows_to_array(rows, width: int) -> np.ndarray:
    if not rows:
        return np.zeros((0, width), np.float64)
    return np.asarray(rows, np.float64).reshape(-1, width)


def _gather_defaulted(table: np.ndarray, refs: np.ndarray, default: float):
    """Per-corner attribute rows; refs of -1 (or an empty table) take the
    default value."""
    has = refs >= 0
    if table.shape[0] == 0:
        has = np.zeros_like(has)
    safe = np.where(has, refs, 0) % max(table.shape[0], 1)
    rows = table[safe] if table.shape[0] else np.zeros(
        (refs.shape[0], table.shape[1]), np.float64
    )
    return np.where(has[:, None], rows, default)


def read_obj(file_path: str) -> ObjMesh:
    pos_rows, uv_rows, nrm_rows, corner_refs, face_sizes = _scan(file_path)
    refs = np.asarray(corner_refs, np.int64).reshape(-1, 3)
    n_corners = refs.shape[0]

    cp = _gather_defaulted(_rows_to_array(pos_rows, 3), refs[:, 0], 0.0)
    cu = _gather_defaulted(_rows_to_array(uv_rows, 2), refs[:, 1], 0.0)
    cn = _gather_defaulted(_rows_to_array(nrm_rows, 3), refs[:, 2], np.nan)

    # value-keyed dedup: unique over the 8-float corner rows. np.unique's
    # axis mode compares rows bitwise, so normalize -0.0 -> +0.0 first (the
    # one value pair that is ==-equal but bitwise distinct; the NaN
    # sentinels already share one bit pattern).
    key = np.concatenate([cp, cu, cn], axis=1) + 0.0
    if n_corners:
        _, first, inverse = np.unique(
            key, axis=0, return_index=True, return_inverse=True
        )
        inverse = inverse.reshape(-1)
        # renumber unique ids into first-appearance order (matches the
        # reference's insertion-ordered dict numbering bit for bit)
        appearance = np.argsort(first, kind="stable")
        rank = np.empty_like(appearance)
        rank[appearance] = np.arange(appearance.shape[0])
        vert_of_corner = rank[inverse]
        src_corner = first[appearance]  # corner supplying each vertex's data
    else:
        vert_of_corner = np.zeros((0,), np.int64)
        src_corner = np.zeros((0,), np.int64)

    # fan triangulation: face of size s -> (c0, c_{i-1}, c_i), i in [2, s)
    sizes = np.asarray(face_sizes, np.int64)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    tris_per_face = np.maximum(sizes - 2, 0)
    face_of_tri = np.repeat(np.arange(sizes.shape[0]), tris_per_face)
    tri_starts = np.concatenate([[0], np.cumsum(tris_per_face)[:-1]]).astype(
        np.int64
    )
    ordinal = np.arange(face_of_tri.shape[0]) - np.repeat(
        tri_starts, tris_per_face
    )
    base = starts[face_of_tri]
    tri = np.stack(
        [
            vert_of_corner[base],
            vert_of_corner[base + ordinal + 1],
            vert_of_corner[base + ordinal + 2],
        ],
        axis=-1,
    ).astype(np.int32)

    return ObjMesh(
        cp[src_corner].astype(np.float32),
        cu[src_corner].astype(np.float32),
        cn[src_corner].astype(np.float32),
        tri.reshape(-1, 3),
    )
