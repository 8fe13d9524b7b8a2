"""SceneData: the device-side scene pytree.

Replaces the reference's bindless-heap slot convention (render.py:110-126:
slots 23330-23335) with a typed pytree of flat arrays. Everything here flows
through jit; `light_count`/`env_count` are traced scalars so that
`update_lights` (light-stage switching) never recompiles.

`has_env` is static: it selects whether env-lighting code is emitted at all.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .accel.types import Accel
from .envmap import EnvMap
from .geometry.mesh import Geometry


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneData:
    geom: Geometry
    accel: Accel
    emission: jnp.ndarray  # (I, 3) float32, per-instance radiance
    light_insts: jnp.ndarray  # (I,) int32, first light_count entries valid
    light_count: jnp.ndarray  # () int32
    env_count: jnp.ndarray  # () int32 (0 or 1)
    env: EnvMap
    # point lights — completed from the reference's stub (light.py:5-7 has a
    # module array with point_light_count = 0); (P, 3) arrays, P >= 1 with a
    # traced count so adding/removing lights never recompiles
    point_pos: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((1, 3), jnp.float32)
    )
    point_intensity: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((1, 3), jnp.float32)
    )
    point_count: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )
    has_env: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # static light-structure metadata for the fused Pallas bounce kernels
    # (integrators/pallas_bounce.FusedMeta); None disables the fused path.
    # Rebuilt by Scene.update_lights / add_envmap / add_point_light (the
    # host knows the light structure; value-only emission changes keep the
    # same meta and never recompile).
    fused_meta: object = dataclasses.field(metadata=dict(static=True), default=None)
