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
    permutation_element_pow2,
    u32,
    u32_to_f32,
    xxhash32_4,
)

_TABLES = None


def _tables():
    """Cached HOST-side tables. Cached as numpy (never jnp): a jnp array
    created during a jit trace is a staged constant (a tracer) and caching
    it would leak across traces. Use sites convert with jnp.asarray, which
    XLA folds into one constant per executable.

    Returns (pmj_packed, bn_rows):
      pmj_packed: (S*M,) uint32 — each (x, y) point packed as two 16-bit
        fixed-point halves (x in the high bits). ONE row-gather per 2D draw
        instead of two; the 1/65536 quantization is far below the tables'
        stratification resolution and identical on every path (fused and
        unfused decode the same packed value).
      bn_rows: (R*R, T) float32 — all T blue-noise textures' values at one
        pixel in one row, so a sampler build fetches the pixel's whole
        blue-noise column with ONE gather (the per-draw texture choice is
        then a static select over T planes; gathers cost per-lane on TPU,
        and the draw sites run 8+ times per bounce)."""
    global _TABLES
    if _TABLES is None:
        path = os.path.join(os.path.dirname(__file__), "tables.npz")
        raw = np.load(path)
        pmj = np.asarray(raw["pmj02"], np.float32)  # (S, M, 2)
        qx = np.minimum(np.floor(pmj[..., 0] * 65536.0), 65535.0).astype(np.uint32)
        qy = np.minimum(np.floor(pmj[..., 1] * 65536.0), 65535.0).astype(np.uint32)
        pmj_packed = ((qx << 16) | qy).reshape(-1)
        bn = np.asarray(raw["bluenoise"], np.float32)  # (T, R, R)
        bn_rows = np.ascontiguousarray(bn.transpose(1, 2, 0).reshape(-1, bn.shape[0]))
        _TABLES = (
            pmj_packed,
            bn_rows,
            pmj.shape[0],  # n_sets
            pmj.shape[1],  # n_samples
            bn.shape[0],  # n_tex
            bn.shape[1],  # res
        )
    return _TABLES


# ---------------------------------------------------- procedural (0,2) sets
# The sample sets are Owen-scrambled Sobol' (0,2) points (exactly the
# construction in tools/gen_sampler_tables.py, same per-set seeds from
# RandomState(1234)), so the 2D draw can be computed in ~150 uint32 ALU ops
# instead of a per-lane table gather: a TPU gather costs ~10 ns/lane while
# the whole persistent-loop bounce is ~1.5 ms for 65k lanes — two gathers
# per bounce made pmj02bn ~1.9x lcg, procedural is ~1.1x. The table file
# stays for validation (tests assert procedural == table).

_PMJ_SET_SEEDS = (
    (822569775, 2137449171),
    (524453158, 1365105717),
    (1880026316, 481516916),
    (1225605784, 1165481977),
    (1202486927, 1549064881),
)
_SOBOL2_DIRS = (
    2147483648, 3221225472, 2684354560, 4026531840, 2281701376, 3422552064,
    2852126720, 4278190080, 2155872256, 3233808384, 2694840320, 4042260480,
    2290614272, 3435921408, 2863267840, 4294901760, 2147516416, 3221274624,
    2684395520, 4026593280, 2281736192, 3422604288, 2852170240, 4278255360,
    2155905152, 3233857728, 2694881440, 4042322160, 2290649224, 3435973836,
    2863311530, 4294967295,
)


def _vdc_u32(v: jnp.ndarray) -> jnp.ndarray:
    """Base-2 radical inverse (bit reversal) on uint32."""
    v = ((v >> U32(16)) | (v << U32(16)))
    v = ((v & U32(0x00FF00FF)) << U32(8)) | ((v & U32(0xFF00FF00)) >> U32(8))
    v = ((v & U32(0x0F0F0F0F)) << U32(4)) | ((v & U32(0xF0F0F0F0)) >> U32(4))
    v = ((v & U32(0x33333333)) << U32(2)) | ((v & U32(0xCCCCCCCC)) >> U32(2))
    v = ((v & U32(0x55555555)) << U32(1)) | ((v & U32(0xAAAAAAAA)) >> U32(1))
    return v


def _sobol2_u32(idx: jnp.ndarray, n_bits: int = 32) -> jnp.ndarray:
    """Second Sobol' dimension, unrolled conditional xors. Callers whose
    index is bounded below 2**n_bits can drop the dead high-bit terms
    (bitwise identical: those bits are always zero)."""
    out = jnp.zeros_like(idx)
    for k, d in enumerate(_SOBOL2_DIRS[:n_bits]):
        bit = (idx >> U32(k)) & U32(1)
        out = out ^ (U32(d) * bit)
    return out


def _owen_rev_u32(v: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Laine-Karras scramble body for an ALREADY bit-reversed input:
    _owen_u32(x) == _owen_rev_u32(_vdc_u32(x)). The x-dimension draw calls
    this with the raw index (vdc is an involution, so the vdc(vdc(index))
    round trip is dead work)."""
    v = v + seed
    v = v ^ (v * U32(0x6C50B47C))
    v = v ^ (v * U32(0xB82F1E52))
    v = v ^ (v * U32(0xC7AFE638))
    v = v ^ (v * U32(0x8D22F6E6))
    return _vdc_u32(v)


def _owen_u32(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Laine-Karras nested uniform scramble on reversed bits (seed may be a
    per-lane array)."""
    return _owen_rev_u32(_vdc_u32(x), seed)


def _pmj_point(set_idx: jnp.ndarray, index: jnp.ndarray):
    """(x, y) of sample `index` in set `set_idx` (both per-lane arrays).
    Bitwise-identical to the table build in tools/gen_sampler_tables.py."""
    sx = jnp.zeros_like(index) + U32(_PMJ_SET_SEEDS[0][0])
    sy = jnp.zeros_like(index) + U32(_PMJ_SET_SEEDS[0][1])
    for s in range(1, len(_PMJ_SET_SEEDS)):
        m = set_idx == s
        sx = jnp.where(m, U32(_PMJ_SET_SEEDS[s][0]), sx)
        sy = jnp.where(m, U32(_PMJ_SET_SEEDS[s][1]), sy)
    # index < 65536 always (callers mod by the set size): the x dimension's
    # vdc(vdc(index)) cancels and the Sobol' xors above bit 15 are dead
    xu = _owen_rev_u32(index, sx)
    yu = _owen_u32(_sobol2_u32(index, n_bits=16), sy)
    x = u32_to_f32(xu) * jnp.float32(2.0 ** -32)
    y = u32_to_f32(yu) * jnp.float32(2.0 ** -32)
    return x, y


def _bn_select(cache: jnp.ndarray, dim: jnp.ndarray) -> jnp.ndarray:
    """Blue-noise value for `dim` from the per-lane cache (n_tex, ...):
    a static where-chain — pure VPU work, no gather in the draw path."""
    n_tex = cache.shape[0]
    tex = (dim % n_tex).astype(jnp.int32)
    out = cache[0]
    for t in range(1, n_tex):
        out = jnp.where(tex == t, cache[t], out)
    return out


def _build_bn_cache(px, py, seed) -> jnp.ndarray:
    """(n_tex, *lane_shape) blue-noise values at each lane's (pixel ^ seed):
    one row-gather per sampler build. Loop-invariant given (px, py, seed),
    so XLA hoists it out of persistent-lane loops."""
    _, bn_rows, _, _, n_tex, res = _tables()
    bn = jnp.asarray(bn_rows)
    bx = (px.astype(jnp.uint32) ^ seed).astype(jnp.int32)
    by = (py.astype(jnp.uint32) ^ seed).astype(jnp.int32)
    x = jnp.abs(bx) % res
    y = jnp.abs(by) % res
    rows = bn[y * res + x]  # (..., n_tex)
    return jnp.moveaxis(rows, -1, 0)


class PMJ02BNSampler(NamedTuple):
    px: jnp.ndarray  # int32 pixel x
    py: jnp.ndarray  # int32 pixel y
    sample_index: jnp.ndarray  # uint32
    dimension: jnp.ndarray  # uint32
    seed: jnp.ndarray  # uint32
    spp: jnp.ndarray  # uint32
    w: jnp.ndarray  # uint32 next-pow2(spp)-1 mask
    bn_cache: jnp.ndarray  # (n_tex, *lane_shape) f32 per-lane blue noise

    # fields a same-(px, py, seed) restart actually changes; the rest are
    # recomputed bit-identically (see samplers.select_on_restart)
    _RESTART_VARYING = ("sample_index", "dimension")

    # Kensler permutation within spp: the generic rejection-loop form.
    # PMJ02BNSamplerP2 (power-of-two spp, the common case) overrides it
    # with the loop-free bit-identical fast path.
    @staticmethod
    def _perm(i, l, w, p):
        return permutation_element(i, l, w, p)

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
        index = self._perm(self.sample_index, self.spp, self.w, h)
        delta = _bn_select(self.bn_cache, self.dimension)
        u = (u32_to_f32(index) + delta) / u32_to_f32(self.spp)
        u = jnp.clip(u, 0.0, ONE_MINUS_EPSILON)
        return u, self._replace(dimension=self.dimension + U32(1))

    def _next2_xy(self):
        """2D draw as two separate component arrays (plane-layout friendly).
        The (0,2) point is computed procedurally (no gather) + two cached
        blue-noise selects."""
        n_sets = len(_PMJ_SET_SEEDS)
        n_samples = 65536
        instance = self.dimension // U32(2)
        h = xxhash32_4(self.px, self.py, self.dimension, self.seed)
        permuted = self._perm(self.sample_index, self.spp, self.w, h)
        index = jnp.where(instance >= n_sets, permuted, self.sample_index)
        index = index % U32(n_samples)
        set_idx = (instance % U32(n_sets)).astype(jnp.int32)
        ptx, pty = _pmj_point(set_idx, index)
        ux = ptx + _bn_select(self.bn_cache, self.dimension)
        uy = pty + _bn_select(self.bn_cache, self.dimension + U32(1))
        ux = ux - jnp.floor(ux)
        uy = uy - jnp.floor(uy)
        return (ux, uy), self._replace(dimension=self.dimension + U32(2))

    def next2(self) -> Tuple[jnp.ndarray, "PMJ02BNSampler"]:
        (ux, uy), smp = self._next2_xy()
        return jnp.stack([ux, uy], axis=-1), smp


class PMJ02BNSamplerP2(PMJ02BNSampler):
    """Power-of-two-spp variant: the Kensler permutation's rejection loop
    never rejects (candidates are already in [0, spp)), so the while_loop
    — and the full-plane any() reduce its cond pays on EVERY draw inside a
    persistent bounce loop — is replaced by the loop-free bit-identical
    form. Chosen statically by the factory; a distinct pytree type, so jit
    caches it separately from the generic class."""

    @staticmethod
    def _perm(i, l, w, p):
        return permutation_element_pow2(i, w, p)


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
    seed_a = jnp.broadcast_to(u32(seed), shape)
    cls = (
        PMJ02BNSamplerP2
        if isinstance(spp, int) and spp > 0 and (spp & (spp - 1)) == 0
        else PMJ02BNSampler
    )
    return cls(
        px=px.astype(jnp.int32),
        py=py.astype(jnp.int32),
        sample_index=jnp.broadcast_to(u32(sample_index), shape),
        dimension=jnp.zeros(shape, jnp.uint32),
        seed=seed_a,
        spp=spp_a,
        w=w_a,
        bn_cache=_build_bn_cache(px, py, seed_a),
    )


def make_pmj02bn_sampler(pixel, seed, spp: int, sample_index) -> PMJ02BNSampler:
    """pixel (N,2) int32; seed/sample_index scalars or (N,)."""
    return make_pmj02bn_sampler_xy(
        pixel[..., 0], pixel[..., 1], seed, spp, sample_index
    )
