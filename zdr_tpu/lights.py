"""Light sampling: uniform pick among envmap + point + mesh area lights, and
the matching pdf for MIS (reference: /root/reference/light.py).

Point lights exist in the reference only as a stubbed, count-0 module array
(light.py:5-7, with a sampling branch at :32-44); here the stub is completed
as real SceneData state (Scene.add_point_light).

Batched with masked branches: every lane draws the same, fixed set of sampler
dimensions regardless of which light type it picks (u_select, u_prim, u2) —
this keeps the sample stream replayable for PRB, and is the natural shape of
branchless SIMD code on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .envmap import sample_envmap
from .scenedata import SceneData
from .vecmath import cross, dot, length, length_squared, normalize


class LightSample(NamedTuple):
    wi: jnp.ndarray  # (N, 3)
    dist: jnp.ndarray  # (N,)
    pdf: jnp.ndarray  # (N,)
    eval: jnp.ndarray  # (N, 3) radiance


def _n_lights(data: SceneData) -> jnp.ndarray:
    return jnp.maximum(
        data.env_count + data.point_count + data.light_count, 1
    ).astype(jnp.float32)


def light_selection_pdf(data: SceneData) -> jnp.ndarray:
    """Probability of picking any one light source (1/(env+point+mesh), see
    the deviation note in sample_light_pdf). Multiply env_sampled_light_pdf
    by this at the miss-MIS sites."""
    return 1.0 / _n_lights(data)


def sample_uniform_triangle(u: jnp.ndarray) -> jnp.ndarray:
    """Low-distortion uniform barycentrics (light.py:16-20)."""
    ux, uy = u[..., 0], u[..., 1]
    a = jnp.where(ux < uy, 0.5 * ux, ux - 0.5 * uy)
    b = jnp.where(ux < uy, uy - 0.5 * ux, 0.5 * uy)
    return jnp.stack([a, b, 1.0 - a - b], axis=-1)


def _mesh_light_geometry(data: SceneData, prim: jnp.ndarray):
    """Fetch world-space vertices of global triangle ids (N,)."""
    from .interaction import gather_rows

    tri = gather_rows(data.geom.triangles, prim)
    p0 = gather_rows(data.geom.positions, tri[..., 0])
    p1 = gather_rows(data.geom.positions, tri[..., 1])
    p2 = gather_rows(data.geom.positions, tri[..., 2])
    return p0, p1, p2


def sample_light(
    data: SceneData, origin: jnp.ndarray, sampler
) -> Tuple[LightSample, object]:
    """Draw one light sample per lane (light.py:23-81). Returns (sample, sampler)."""
    u_sel, sampler = sampler.next1()
    u_prim, sampler = sampler.next1()
    u2, sampler = sampler.next2()

    n_i = data.env_count + data.point_count + data.light_count
    n = jnp.maximum(n_i, 1).astype(jnp.float32)
    idx = jnp.clip((u_sel * n).astype(jnp.int32), 0, jnp.maximum(n_i - 1, 0))

    # ---- point light branch (reference stub completed, light.py:32-44)
    p_idx = jnp.clip(idx - data.env_count, 0, data.point_pos.shape[0] - 1)
    from .interaction import gather_rows as _gr
    pp = _gr(data.point_pos, p_idx)
    p_delta = pp - origin
    p_sqr = length_squared(p_delta)
    p_wi = normalize(p_delta)
    p_pdf = p_sqr / n
    p_dist = 0.9999 * jnp.sqrt(p_sqr)
    p_eval = _gr(data.point_intensity, p_idx)

    # ---- mesh area light branch
    mesh_idx = jnp.clip(
        idx - data.env_count - data.point_count, 0, data.light_insts.shape[0] - 1
    )
    inst = data.light_insts[mesh_idx]
    tc = data.geom.inst_tri_count[inst]
    prim_local = jnp.clip((u_prim * tc).astype(jnp.int32), 0, jnp.maximum(tc - 1, 0))
    prim = data.geom.inst_tri_offset[inst] + prim_local
    p0, p1, p2 = _mesh_light_geometry(data, prim)
    abc = sample_uniform_triangle(u2)
    p_light = abc[..., 0:1] * p0 + abc[..., 1:2] * p1 + abc[..., 2:3] * p2
    emission = _gr(data.emission, inst)
    c = cross(p1 - p0, p2 - p0)
    light_normal = normalize(c)
    wi = normalize(p_light - origin)
    cos_light = -dot(light_normal, wi)
    sqr_dist = length_squared(p_light - origin)
    area = length(c) / 2.0
    pdf_mesh = sqr_dist / jnp.maximum(
        n * tc.astype(jnp.float32) * area * cos_light, 1e-12
    )
    eval_mesh = jnp.where((cos_light > 1e-4)[..., None], emission, 0.0)
    dist_mesh = 0.9999 * jnp.sqrt(sqr_dist)

    is_point = (idx >= data.env_count) & (idx < data.env_count + data.point_count)
    wi = jnp.where(is_point[..., None], p_wi, wi)
    dist_mesh = jnp.where(is_point, p_dist, dist_mesh)
    pdf_mesh = jnp.where(is_point, p_pdf, pdf_mesh)
    eval_mesh = jnp.where(is_point[..., None], p_eval, eval_mesh)

    if data.has_env:
        env_wi, env_dist, env_pdf, env_rad = sample_envmap(data.env, u2)
        is_env = (idx < data.env_count)[..., None]
        return (
            LightSample(
                wi=jnp.where(is_env, env_wi, wi),
                dist=jnp.where(is_env[..., 0], env_dist, dist_mesh),
                # env draw picks among n lights too: scale pdf by 1/n
                pdf=jnp.where(is_env[..., 0], env_pdf * (1.0 / n), pdf_mesh),
                eval=jnp.where(is_env, env_rad, eval_mesh),
            ),
            sampler,
        )
    return LightSample(wi=wi, dist=dist_mesh, pdf=pdf_mesh, eval=eval_mesh), sampler


def sample_light_pdf(
    data: SceneData,
    origin: jnp.ndarray,
    inst: jnp.ndarray,
    prim: jnp.ndarray,
    p: jnp.ndarray,
) -> jnp.ndarray:
    """pdf of `sample_light` having produced the point p on (inst, prim)
    (light.py:84-111). The env's own pdf is env_sampled_light_pdf at the miss
    branch (light.py:89 comment, direct.py:71).

    Deviation from the reference, documented: the reference divides by
    n = mesh_count here but by n = env+mesh in sample_light (light.py:26,89),
    and never scales the env pdf by the selection probability — inconsistent
    when env and mesh lights coexist (its test scenes never mix them). Here
    selection is uniformly 1/(env+point+mesh) everywhere."""
    n = _n_lights(data)
    tc = data.geom.inst_tri_count[jnp.maximum(inst, 0)]
    p0, p1, p2 = _mesh_light_geometry(data, jnp.maximum(prim, 0))
    wi = normalize(p - origin)
    c = cross(p1 - p0, p2 - p0)
    light_normal = normalize(c)
    cos_light = -dot(light_normal, wi)
    sqr_dist = length_squared(p - origin)
    area = length(c) / 2.0
    return sqr_dist / jnp.maximum(n * tc.astype(jnp.float32) * area * cos_light, 1e-12)
