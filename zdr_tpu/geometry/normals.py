"""Vertex normal recomputation.

The reference does this on GPU with raw atomic float adds
(/root/reference/recompute_normal.py:11-31). On TPU the same accumulation is
a deterministic `segment_sum` over the face→vertex index map — no atomics,
no nondeterminism.
"""

from __future__ import annotations

import numpy as np


def recompute_normals(positions: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals from faces (host-side, runs once a scene).

    Args:
        positions: (V, 3) float32.
        triangles: (T, 3) int32.
    Returns:
        (V, 3) float32 unit normals.
    """
    p0 = positions[triangles[:, 0]]
    p1 = positions[triangles[:, 1]]
    p2 = positions[triangles[:, 2]]
    face_n = np.cross(p1 - p0, p2 - p0)  # un-normalized: area weighting
    out = np.zeros_like(positions)
    for k in range(3):
        np.add.at(out, triangles[:, k], face_n)
    norm = np.linalg.norm(out, axis=-1, keepdims=True)
    return (out / np.maximum(norm, 1e-20)).astype(np.float32)
