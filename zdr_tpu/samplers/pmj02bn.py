"""Progressive multi-jittered (0,2) blue-noise sampler.

Reference behavior: /root/reference/pmj02bn.py (pbrt-v4 style). Per draw:
  * 1D: Kensler permutation of the sample index within spp (keyed by
    xxhash32(pixel, dimension, seed)), stratified value + per-pixel
    blue-noise Cranley-Patterson offset (pixel xor seed picks the offset).
  * 2D: a point from a precomputed (0,2) table (re-permuted past the table
    set count), plus a 2D blue-noise offset, fract-wrapped.

Tables are regenerated (the reference's table files are absent from its
snapshot): sample sets are Owen-scrambled Sobol' (0,2) points and blue noise
is void-and-cluster — see tools/gen_sampler_tables.py. The reference's
blue-noise index arithmetic (pmj02bn.py:23) mis-parenthesizes the texture
stride; the correct pbrt layout is used here (SURVEY.md §2.9).

All state is per-lane and shape-generic: (N,) for the flat unfused walks,
(rows, 128) planes for the fused pipeline (which runs the draws as XLA glue
between the Pallas kernels). The pixel coordinate is stored as two separate
arrays (px, py) — an (N, 2) field would tile its minor axis to 128 lanes in
TPU loop carries. Internally every table lives flat (1-D) so gathers work on
arbitrarily shaped index arrays without minor-axis padding.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from .hashes import (
    ONE_MINUS_EPSILON,
    U32,
    next_pow2_mask,
    permutation_element,
    u32,
    xxhash32_4,
)

_TABLES = None


def _tables():
    """Cached HOST-side tables. Cached as numpy (never jnp): a jnp array
    created during a jit trace is a staged constant (a tracer) and caching
    it would leak across traces. Use sites convert with jnp.asarray, which
    XLA folds into one constant per executable."""
    global _TABLES
    if _TABLES is None:
        path = os.path.join(os.path.dirname(__file__), "tables.npz")
        raw = np.load(path)
        _TABLES = (
            np.asarray(raw["pmj02"], np.float32),  # (S, M, 2)
            np.asarray(raw["bluenoise"], np.float32),  # (T, R, R)
        )
    return _TABLES


def _blue_noise(dim: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Blue-noise value for dimension `dim` at pixel (px, py). Flat gather:
    shape-generic (works on (N,) lanes and (rows, 128) planes alike)."""
    _, bn_np = _tables()
    n_tex, res, _ = bn_np.shape
    bn = jnp.asarray(bn_np.reshape(-1))
    tex = (dim % n_tex).astype(jnp.int32)
    x = jnp.abs(px) % res
    y = jnp.abs(py) % res
    return bn[(tex * res + y) * res + x]


class PMJ02BNSampler(NamedTuple):
    px: jnp.ndarray  # int32 pixel x
    py: jnp.ndarray  # int32 pixel y
    sample_index: jnp.ndarray  # uint32
    dimension: jnp.ndarray  # uint32
    seed: jnp.ndarray  # uint32
    spp: jnp.ndarray  # uint32
    w: jnp.ndarray  # uint32 next-pow2(spp)-1 mask

    def _bn_pixel(self):
        # xor seed so the per-pixel blue-noise offset changes with seed
        bx = (self.px.astype(jnp.uint32) ^ self.seed).astype(jnp.int32)
        by = (self.py.astype(jnp.uint32) ^ self.seed).astype(jnp.int32)
        return bx, by

    def salt(self) -> jnp.ndarray:
        """Per-lane, per-bounce uint32 side-channel (see LCGSampler.salt)."""
        return xxhash32_4(
            self.px ^ U32(0x5F356495),
            self.py,
            self.dimension,
            self.seed ^ self.sample_index,
        )

    def next1(self) -> Tuple[jnp.ndarray, "PMJ02BNSampler"]:
        h = xxhash32_4(self.px, self.py, self.dimension, self.seed)
        index = permutation_element(self.sample_index, self.spp, self.w, h)
        bx, by = self._bn_pixel()
        delta = _blue_noise(self.dimension, bx, by)
        u = (index.astype(jnp.float32) + delta) / self.spp.astype(jnp.float32)
        u = jnp.clip(u, 0.0, ONE_MINUS_EPSILON)
        return u, self._replace(dimension=self.dimension + U32(1))

    def _next2_xy(self):
        """2D draw as two separate component arrays (plane-layout friendly)."""
        pmj_np, _ = _tables()
        n_sets, n_samples, _ = pmj_np.shape
        pmj_x = jnp.asarray(pmj_np[..., 0].reshape(-1))
        pmj_y = jnp.asarray(pmj_np[..., 1].reshape(-1))
        instance = self.dimension // U32(2)
        h = xxhash32_4(self.px, self.py, self.dimension, self.seed)
        permuted = permutation_element(self.sample_index, self.spp, self.w, h)
        index = jnp.where(instance >= n_sets, permuted, self.sample_index)
        index = (index % U32(n_samples)).astype(jnp.int32)
        flat = (instance % U32(n_sets)).astype(jnp.int32) * n_samples + index
        ptx = pmj_x[flat]
        pty = pmj_y[flat]
        bx, by = self._bn_pixel()
        ux = ptx + _blue_noise(self.dimension, bx, by)
        uy = pty + _blue_noise(self.dimension + U32(1), bx, by)
        ux = ux - jnp.floor(ux)
        uy = uy - jnp.floor(uy)
        return (ux, uy), self._replace(dimension=self.dimension + U32(2))

    def next2(self) -> Tuple[jnp.ndarray, "PMJ02BNSampler"]:
        (ux, uy), smp = self._next2_xy()
        return jnp.stack([ux, uy], axis=-1), smp


def make_pmj02bn_sampler_xy(px, py, seed, spp: int, sample_index) -> PMJ02BNSampler:
    """px/py: int arrays of any shape; seed/sample_index scalars or like px."""
    shape = px.shape
    w = next_pow2_mask(int(spp)) if isinstance(spp, int) else None
    spp_a = jnp.broadcast_to(u32(spp), shape)
    if w is None:
        ww = spp_a - U32(1)
        for s in (1, 2, 4, 8, 16):
            ww = ww | (ww >> U32(s))
        w_a = ww
    else:
        w_a = jnp.full(shape, w, jnp.uint32)
    return PMJ02BNSampler(
        px=px.astype(jnp.int32),
        py=py.astype(jnp.int32),
        sample_index=jnp.broadcast_to(u32(sample_index), shape),
        dimension=jnp.zeros(shape, jnp.uint32),
        seed=jnp.broadcast_to(u32(seed), shape),
        spp=spp_a,
        w=w_a,
    )


def make_pmj02bn_sampler(pixel, seed, spp: int, sample_index) -> PMJ02BNSampler:
    """pixel (N,2) int32; seed/sample_index scalars or (N,)."""
    return make_pmj02bn_sampler_xy(
        pixel[..., 0], pixel[..., 1], seed, spp, sample_index
    )
