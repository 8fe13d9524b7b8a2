"""Scene: the user-facing API, drop-in shaped like the reference's
(/root/reference/render.py:55-257) with JAX arrays in place of torch tensors.

    scene = Scene([(obj_file, transform_or_None, emission_or_None), ...],
                  integrator='direct')
    scene.camera = Camera(fov=..., origin=..., target=..., up=...)
    image = scene.render(material, res=(W, H), spp=64, seed=0)   # (H, W, 4)
    # differentiable w.r.t. material through jax.grad / optax

Differences by design (TPU-first):
  * `render` returns a jnp array and is differentiable through JAX AD; the
    custom_vjp inside reproduces the reference's torch.autograd.Function
    semantics (decorrelated backward at seed+1, render.py:196).
  * Scene state mutations (camera moves, update_lights) between forward and
    backward are safe the same way the reference's snapshot/restore dance is
    (render.py:206-222): the SceneData/Camera pytrees are captured by value
    as VJP residuals at call time.
  * Geometry is pre-transformed to world space at load; instance transforms
    are applied on host (geometry/mesh.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import dataclasses

import jax.numpy as jnp
import numpy as np

from .accel import build_accel
from .dtypes import Camera, default_camera, float3
from .envmap import EnvMap, build_envmap
from .geometry.load_obj import ObjMesh
from .geometry.mesh import build_geometry
from .integrators import RenderConfig, build_render
from .scenedata import SceneData

MAX_INSTANCES = 10000  # reference render.py:114-115


def _build_fused_meta(geom, light_insts, n_env: int = 0, n_point: int = 0):
    """Static light structure for the fused Pallas bounce path
    (integrators/pallas_bounce.FusedMeta); None when the scene is out of
    the fused kernels' scope (past even the HBM-streamed trace's cap)."""
    from .integrators.pallas_bounce import FusedMeta
    from .integrators.pallas_stream import STREAM_MAX_TRIS

    n_tris = int(geom.num_triangles)
    if n_tris > STREAM_MAX_TRIS:
        return None
    offs = np.asarray(geom.inst_tri_offset)
    cnts = np.asarray(geom.inst_tri_count)
    # emissive triangles become static metadata (glue light tables); a
    # giant emissive mesh would blow up compile — decline the fused path
    if light_insts and int(cnts[list(light_insts)].sum()) > 16384:
        return None
    tri_ids = []
    offsets = []
    tcs = []
    for inst in light_insts:
        offsets.append(len(tri_ids))
        tcs.append(int(cnts[inst]))
        tri_ids.extend(range(int(offs[inst]), int(offs[inst]) + int(cnts[inst])))
    return FusedMeta(
        n_lights=len(light_insts),
        light_tri_ids=tuple(tri_ids),
        light_offsets=tuple(offsets),
        light_tcs=tuple(tcs),
        num_tris=n_tris,
        n_env=int(n_env),
        n_point=int(n_point),
    )


def _normalize_emission(e) -> np.ndarray:
    if e is None:
        return np.zeros(3, np.float32)
    if np.ndim(e) == 0:
        return np.full(3, float(e), np.float32)
    return np.asarray(e, dtype=np.float32).reshape(3)


class Scene:
    """A 3D scene for differentiable rendering (reference render.py:30-71).

    Args:
        models: list of (obj_file_or_ObjMesh, transform_4x4_or_None,
            emission_or_None) tuples. Emission > 0 marks an instance as an
            area light.
        integrator: 'collocated' | 'direct' | 'path'.
        accel: 'auto' | 'bruteforce' | 'bvh'.
        sampler: 'pmj02bn' (default, reference parity) | 'corrmj' | 'lcg'.
    """

    def __init__(
        self,
        models: Sequence[Tuple[Union[str, ObjMesh], Optional[np.ndarray], object]],
        integrator: str = "direct",
        accel: str = "auto",
        sampler: str = "pmj02bn",
    ):
        if len(models) > MAX_INSTANCES:
            raise RuntimeError("exceeding maximum number of mesh instances")
        geom = build_geometry([(src, t) for (src, t, _e) in models])
        emissions = [_normalize_emission(e) for (_s, _t, e) in models]
        accel_data = build_accel(geom, method=accel)
        n_inst = geom.num_instances
        light_insts = [i for i, e in enumerate(emissions) if (e > 0).any()]
        fused_meta = _build_fused_meta(geom, light_insts)
        self._data = SceneData(
            fused_meta=fused_meta,
            geom=geom,
            accel=accel_data,
            emission=jnp.asarray(np.stack(emissions)),
            light_insts=jnp.asarray(
                np.array(
                    light_insts + [0] * (n_inst - len(light_insts)), dtype=np.int32
                )
            ),
            light_count=jnp.asarray(len(light_insts), jnp.int32),
            env_count=jnp.asarray(0, jnp.int32),
            env=EnvMap.dummy(),
            has_env=False,
        )
        self.camera = default_camera()
        self.integrator = integrator
        self.sampler = sampler
        self.use_tent_filter = True
        # render knobs (the reference's module-level flags, now per-scene and
        # compile-cache-keyed through RenderConfig — flipping any of these
        # takes effect on the next render, no process restart):
        self.use_mis = True  # ref direct.py:14
        self.max_depth = 16  # ref prb.py:15
        self.rr_depth = 2  # ref prb.py:16
        self.bilinear = True  # ref interaction.py:33
        # PRB backward: pack gradient channel pairs as bf16 in the splat
        # flush (2x fewer scatter updates; ~0.3% relative gradient noise on
        # top of the estimator's own). Set False for bit-exact splats.
        self.packed_splat = True
        # PRB backward: reservoir-merge groups of this many bounce taps into
        # one splat entry (texture.reservoir_merge_taps; unbiased). Divides
        # the splat-flush volume — the dominant backward cost — by the same
        # factor. 1 = off. Default 4: merge noise measured 5x below the
        # estimator's own seed-to-seed noise (see RenderConfig.splat_merge).
        self.splat_merge = 4
        # fused Pallas bounce megakernels for the path/direct integrators:
        # "auto" (default) = on real accelerators when the scene is in
        # scope; "force" = everywhere (CPU interpret too); False = off
        self.fused = "auto"
        # bf16 texture-fetch table (faster gathers, <=0.4% fetch quantization)
        self.texture_bf16 = False
        # fused lane order: "morton" packs each 512-lane sweep row into a
        # compact screen tile (miss/dead rows then skip whole sweeps);
        # "linear" keeps raster order (see RenderConfig.lane_order)
        self.lane_order = "morton"
        self.emissions = emissions  # user-visible record (render.py:120)

    # ------------------------------------------------------------- lights

    def update_lights(self, emissions) -> None:
        """Rewrite per-instance emission (light-stage switching,
        render.py:130-148). Array-only update: only recompiles if WHICH
        instances are emissive changes (the fused kernels' light structure
        is static)."""
        n_inst = self._data.geom.num_instances
        assert len(emissions) == n_inst
        em = [_normalize_emission(e) for e in emissions]
        self.emissions = em
        light_insts = [i for i, e in enumerate(em) if (e > 0).any()]
        self._data = dataclasses.replace(
            self._data,
            fused_meta=_build_fused_meta(
                self._data.geom,
                light_insts,
                n_env=1 if self._data.has_env else 0,
                n_point=int(self._data.point_count),
            ),
            emission=jnp.asarray(np.stack(em)),
            light_insts=jnp.asarray(
                np.array(
                    light_insts + [0] * (n_inst - len(light_insts)), dtype=np.int32
                )
            ),
            light_count=jnp.asarray(len(light_insts), jnp.int32),
        )

    def add_point_light(self, position, intensity) -> None:
        """Add a point light (completes the reference's stub, light.py:5-7).

        Args:
            position: world-space (3,).
            intensity: radiant intensity (3,) or scalar.
        """
        pos = np.asarray(position, np.float32).reshape(1, 3)
        inten = _normalize_emission(intensity).reshape(1, 3)
        count = int(self._data.point_count)
        if count == 0:
            new_pos, new_int = pos, inten
        else:
            new_pos = np.concatenate([np.asarray(self._data.point_pos)[:count], pos])
            new_int = np.concatenate(
                [np.asarray(self._data.point_intensity)[:count], inten]
            )
        light_insts = [i for i, e in enumerate(self.emissions) if (e > 0).any()]
        self._data = dataclasses.replace(
            self._data,
            point_pos=jnp.asarray(new_pos),
            point_intensity=jnp.asarray(new_int),
            point_count=jnp.asarray(count + 1, jnp.int32),
            fused_meta=_build_fused_meta(
                self._data.geom,
                light_insts,
                n_env=1 if self._data.has_env else 0,
                n_point=count + 1,
            ),
        )

    def add_envmap(self, img, compensate_mis: bool = True) -> None:
        """Attach an equirect environment light (render.py:150-156).

        Args:
            img: (H, W, 3 or 4) float array, or a path readable by imageio.
        """
        if isinstance(img, str):
            import imageio.v2 as imageio

            img = np.asarray(imageio.imread(img))
        img = np.asarray(img, dtype=np.float32)
        if img.ndim == 3 and img.shape[2] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        env = build_envmap(img, compensate_mis=compensate_mis)
        light_insts = [i for i, e in enumerate(self.emissions) if (e > 0).any()]
        self._data = dataclasses.replace(
            self._data,
            env=env,
            env_count=jnp.asarray(1, jnp.int32),
            has_env=True,
            fused_meta=_build_fused_meta(
                self._data.geom,
                light_insts,
                n_env=1,
                n_point=int(self._data.point_count),
            ),
        )

    # ------------------------------------------------------------- render

    # Largest sample window per device call. The remote-TPU worker kills
    # executions that run for more than ~1 minute, so big-spp renders are
    # sliced into several identical-sampling windows (same global spp key;
    # absolute sample indices) and combined linearly — bitwise-identical
    # estimator, bounded per-call runtime.
    max_spp_per_call = 64

    def _config(self, res, spp, it_count=0) -> RenderConfig:
        return RenderConfig(
            res=tuple(res),
            spp=int(spp),
            integrator=self.integrator,
            sampler=self.sampler,
            use_tent_filter=self.use_tent_filter,
            use_mis=bool(self.use_mis),
            max_depth=int(self.max_depth),
            rr_depth=int(self.rr_depth),
            bilinear=bool(self.bilinear),
            packed_splat=bool(self.packed_splat),
            splat_merge=int(self.splat_merge),
            fused=self.fused,
            texture_bf16=bool(self.texture_bf16),
            lane_order=str(self.lane_order),
            it_count=int(it_count),
        )

    def render(self, material, *, res, spp, seed=0):
        """Render -> (H, W, 4) image; differentiable w.r.t. material.

        Args:
            material: (H_tex, W_tex, 4) array: diffuse RGB + roughness A.
            res: (width, height).
            spp: samples per pixel.
            seed: RNG seed; the backward pass uses seed+1.
        """
        material = jnp.asarray(material)
        assert material.ndim == 3 and material.shape[2] == 4
        spp = int(spp)
        seed = jnp.asarray(seed, jnp.int32)
        chunk = self.max_spp_per_call
        if spp <= chunk:
            fn = build_render(self._config(res, spp))
            return fn(material, self._data, self.camera, seed)
        # all equal-size windows share ONE compiled program (it_start is a
        # traced argument); only a trailing remainder window compiles again
        img = None
        start = 0
        while start < spp:
            count = min(chunk, spp - start)
            fn = build_render(self._config(res, spp, it_count=count))
            part = fn(material, self._data, self.camera, seed, start) * (count / spp)
            img = part if img is None else img + part
            start += count
        return img

    def render_duvdxy(self, material, *, res, spp, seed=0):
        """Screen-space-to-texture-space Jacobian AOV (render.py:243-257).

        Returns (H, W, 4) storing (du/dx, dv/dx, du/dy, dv/dy). Not
        differentiable."""
        from .integrators.uvgrad import render_uvgrad

        material = jnp.asarray(material)
        cfg = self._config(res, spp)
        return render_uvgrad(self._data, self.camera, jnp.asarray(seed, jnp.int32), cfg)
