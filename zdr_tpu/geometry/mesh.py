"""Scene geometry assembly: flat, world-space, device-ready arrays.

TPU-first inversion of the reference's bindless-heap design
(/root/reference/render.py:73-128): instead of per-instance buffers reached
through a bindless slot convention plus in-kernel instance transforms
(interaction.py:18-21), all instances are concatenated into single flat
arrays and vertices are pre-transformed to world space at build time. Kernels
then index with plain gathers and never touch a transform. (`update_lights`
only rewrites emission metadata, never transforms, so this is lossless —
render.py:130-148.)

Per-instance triangle offset/count tables replace the bindless slots 23334/5.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .load_obj import ObjMesh, read_obj
from .normals import recompute_normals


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Geometry:
    """Flat world-space triangle soup with per-instance index ranges."""

    positions: jnp.ndarray  # (V, 3) float32, world space
    uvs: jnp.ndarray  # (V, 2) float32
    normals: jnp.ndarray  # (V, 3) float32, world space, unit
    triangles: jnp.ndarray  # (T, 3) int32 into the flat vertex arrays
    tri_inst: jnp.ndarray  # (T,) int32 instance id per triangle
    inst_tri_offset: jnp.ndarray  # (I,) int32 first triangle of instance
    inst_tri_count: jnp.ndarray  # (I,) int32

    @property
    def num_triangles(self) -> int:
        return self.triangles.shape[0]

    @property
    def num_instances(self) -> int:
        return self.inst_tri_offset.shape[0]


def _as_mesh(source: Union[str, ObjMesh]) -> ObjMesh:
    if isinstance(source, ObjMesh):
        return source
    return read_obj(source)


def build_geometry(
    models: Sequence[Tuple[Union[str, ObjMesh], Optional[np.ndarray]]],
) -> Geometry:
    """Assemble instances into one flat world-space Geometry.

    Args:
        models: sequence of (obj_path_or_mesh, transform_4x4_or_None).
    """
    mesh_cache = {}
    all_pos, all_uv, all_nrm, all_tri, all_inst = [], [], [], [], []
    offsets, counts = [], []
    v_base = 0
    t_base = 0
    for idx, (source, transform) in enumerate(models):
        if isinstance(source, str):
            if source not in mesh_cache:
                mesh_cache[source] = _as_mesh(source)
            mesh = mesh_cache[source]
        else:
            mesh = source
        pos, uv, nrm, tri = mesh
        if math.isnan(float(nrm[0, 0])):
            nrm = recompute_normals(pos, tri)
        if transform is not None:
            m = np.asarray(transform, dtype=np.float64)
            pos = (pos @ m[:3, :3].T + m[:3, 3]).astype(np.float32)
            nit = np.linalg.inv(m[:3, :3]).T
            nrm = nrm @ nit.T
            nrm = (nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)).astype(np.float32)
        all_pos.append(pos)
        all_uv.append(uv)
        all_nrm.append(nrm)
        all_tri.append(tri + v_base)
        all_inst.append(np.full((tri.shape[0],), idx, dtype=np.int32))
        offsets.append(t_base)
        counts.append(tri.shape[0])
        v_base += pos.shape[0]
        t_base += tri.shape[0]

    return Geometry(
        positions=jnp.asarray(np.concatenate(all_pos, axis=0)),
        uvs=jnp.asarray(np.concatenate(all_uv, axis=0)),
        normals=jnp.asarray(np.concatenate(all_nrm, axis=0)),
        triangles=jnp.asarray(np.concatenate(all_tri, axis=0)),
        tri_inst=jnp.asarray(np.concatenate(all_inst, axis=0)),
        inst_tri_offset=jnp.asarray(np.array(offsets, dtype=np.int32)),
        inst_tri_count=jnp.asarray(np.array(counts, dtype=np.int32)),
    )
