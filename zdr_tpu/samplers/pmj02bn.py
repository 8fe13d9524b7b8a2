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

All state is per-lane (N,) so the sampler threads through persistent-lane
loops and restarts.
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


def _blue_noise(dim: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Blue-noise value for dimension `dim` at pixel p (N,2)."""
    _, bn_np = _tables()
    n_tex, res, _ = bn_np.shape
    bn = jnp.asarray(bn_np)
    tex = (dim % n_tex).astype(jnp.int32)
    x = jnp.abs(p[..., 0]) % res
    y = jnp.abs(p[..., 1]) % res
    return bn[tex, y, x]


class PMJ02BNSampler(NamedTuple):
    pixel: jnp.ndarray  # (N, 2) int32
    sample_index: jnp.ndarray  # (N,) uint32
    dimension: jnp.ndarray  # (N,) uint32
    seed: jnp.ndarray  # (N,) uint32
    spp: jnp.ndarray  # (N,) uint32
    w: jnp.ndarray  # (N,) uint32 next-pow2(spp)-1 mask

    def _bn_pixel(self) -> jnp.ndarray:
        # xor seed so the per-pixel blue-noise offset changes with seed
        return (self.pixel.astype(jnp.uint32) ^ self.seed[..., None]).astype(
            jnp.int32
        )

    def salt(self) -> jnp.ndarray:
        """Per-lane, per-bounce uint32 side-channel (see LCGSampler.salt)."""
        return xxhash32_4(
            self.pixel[..., 0] ^ U32(0x5F356495),
            self.pixel[..., 1],
            self.dimension,
            self.seed ^ self.sample_index,
        )

    def next1(self) -> Tuple[jnp.ndarray, "PMJ02BNSampler"]:
        h = xxhash32_4(
            self.pixel[..., 0], self.pixel[..., 1], self.dimension, self.seed
        )
        index = permutation_element(self.sample_index, self.spp, self.w, h)
        delta = _blue_noise(self.dimension, self._bn_pixel())
        u = (index.astype(jnp.float32) + delta) / self.spp.astype(jnp.float32)
        u = jnp.clip(u, 0.0, ONE_MINUS_EPSILON)
        return u, self._replace(dimension=self.dimension + U32(1))

    def next2(self) -> Tuple[jnp.ndarray, "PMJ02BNSampler"]:
        pmj_np, _ = _tables()
        n_sets, n_samples, _ = pmj_np.shape
        pmj = jnp.asarray(pmj_np)
        instance = self.dimension // U32(2)
        h = xxhash32_4(
            self.pixel[..., 0], self.pixel[..., 1], self.dimension, self.seed
        )
        permuted = permutation_element(self.sample_index, self.spp, self.w, h)
        index = jnp.where(instance >= n_sets, permuted, self.sample_index)
        index = (index % U32(n_samples)).astype(jnp.int32)
        pt = pmj[(instance % U32(n_sets)).astype(jnp.int32), index]
        bp = self._bn_pixel()
        delta = jnp.stack(
            [
                _blue_noise(self.dimension, bp),
                _blue_noise(self.dimension + U32(1), bp),
            ],
            axis=-1,
        )
        u = pt + delta
        u = u - jnp.floor(u)
        return u, self._replace(dimension=self.dimension + U32(2))


def make_pmj02bn_sampler(pixel, seed, spp: int, sample_index) -> PMJ02BNSampler:
    """pixel (N,2) int32; seed/sample_index scalars or (N,)."""
    n = pixel.shape[0]
    w = next_pow2_mask(int(spp)) if isinstance(spp, int) else None
    spp_a = jnp.broadcast_to(u32(spp), (n,))
    if w is None:
        ww = spp_a - U32(1)
        for s in (1, 2, 4, 8, 16):
            ww = ww | (ww >> U32(s))
        w_a = ww
    else:
        w_a = jnp.full((n,), w, jnp.uint32)
    return PMJ02BNSampler(
        pixel=pixel,
        sample_index=jnp.broadcast_to(u32(sample_index), (n,)),
        dimension=jnp.zeros((n,), jnp.uint32),
        seed=jnp.broadcast_to(u32(seed), (n,)),
        spp=spp_a,
        w=w_a,
    )
