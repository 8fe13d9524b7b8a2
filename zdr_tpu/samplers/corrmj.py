"""Correlated multi-jitter sampler (Kensler CMJ).

Reference behavior: /root/reference/corrmj.py. 1D draws are permuted
stratified values + LCG jitter; 2D draws are multi-jittered points on an
r x r grid (r = floor(sqrt(spp + 0.4))) with shuffled row/column strata.
All uint32, per-lane state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .hashes import (
    ONE_MINUS_EPSILON,
    U32,
    lcg_step,
    lcg_to_unit_float,
    permutation_element,
    u32_to_f32,
    permutation_element_pow2,
    u32,
    xxhash32_4,
)


def _pow2_mask(x: jnp.ndarray) -> jnp.ndarray:
    m = x - U32(1)
    for s in (1, 2, 4, 8, 16):
        m = m | (m >> U32(s))
    return m


class CorrMJSampler(NamedTuple):
    sample_index: jnp.ndarray  # (N,) uint32
    dimension: jnp.ndarray  # (N,) uint32
    permutation_seed: jnp.ndarray  # (N,) uint32
    state: jnp.ndarray  # (N,) uint32 LCG jitter stream
    spp: jnp.ndarray  # (N,) uint32
    w: jnp.ndarray  # (N,) uint32
    res: jnp.ndarray  # (N,) uint32 grid side
    resw: jnp.ndarray  # (N,) uint32

    # permutation_seed/spp/w/res/resw are restart-invariant (same px/py/seed)
    _RESTART_VARYING = ("sample_index", "dimension", "state")

    # Kensler permutation: generic rejection-loop form; CorrMJSamplerP2
    # (spp AND grid side both powers of two) overrides with the loop-free
    # bit-identical fast path (see hashes.permutation_element_pow2).
    @staticmethod
    def _perm(i, l, w, p):
        return permutation_element(i, l, w, p)

    def salt(self) -> jnp.ndarray:
        """Per-lane, per-bounce uint32 side-channel (see LCGSampler.salt)."""
        return self.state ^ (self.dimension * U32(0x9E3779B9)) ^ U32(0x5F356495)

    def next1(self) -> Tuple[jnp.ndarray, "CorrMJSampler"]:
        ps = self.permutation_seed + self.dimension
        index = self._perm(
            self.sample_index,
            self.spp,
            self.w,
            (ps * U32(0x45FBE943)) & U32(0x70FFFFFF),
        )
        state = lcg_step(self.state)
        delta = lcg_to_unit_float(state)
        u = (u32_to_f32(index) + delta) / u32_to_f32(self.spp)
        u = jnp.clip(u, 0.0, ONE_MINUS_EPSILON)
        return u, self._replace(dimension=self.dimension + U32(1), state=state)

    def _next2_xy(self):
        """2D draw as two separate component arrays (plane-layout friendly)."""
        ps = self.permutation_seed + self.dimension
        index = self._perm(
            self.sample_index,
            self.spp,
            self.w,
            (ps * U32(0x51633E2D)) & U32(0x70FFFFFF),
        )
        res = self.res
        y = index // res
        x = index % res
        sx = self._perm(
            x, res, self.resw, (ps * U32(0x68BC21EB)) & U32(0x70FFFFFF)
        )
        sy = self._perm(
            y, res, self.resw, (ps * U32(0x02E5BE93)) & U32(0x70FFFFFF)
        )
        s1 = lcg_step(self.state)
        dx = lcg_to_unit_float(s1)
        s2 = lcg_step(s1)
        dy = lcg_to_unit_float(s2)
        resf = u32_to_f32(res)
        ux = (u32_to_f32(x) + (u32_to_f32(sy) + dx) / resf) / resf
        uy = (u32_to_f32(y) + (u32_to_f32(sx) + dy) / resf) / resf
        ux = jnp.clip(ux, 0.0, ONE_MINUS_EPSILON)
        uy = jnp.clip(uy, 0.0, ONE_MINUS_EPSILON)
        return (ux, uy), self._replace(dimension=self.dimension + U32(2), state=s2)

    def next2(self) -> Tuple[jnp.ndarray, "CorrMJSampler"]:
        (ux, uy), smp = self._next2_xy()
        return jnp.stack([ux, uy], axis=-1), smp


class CorrMJSamplerP2(CorrMJSampler):
    """Variant for spp AND the MJ grid side both powers of two: the
    permutation rejection loops never reject, so every draw drops its
    while_loop + full-plane any() reduce (bit-identical results)."""

    @staticmethod
    def _perm(i, l, w, p):
        return permutation_element_pow2(i, w, p)


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def make_corrmj_sampler_xy(px, py, seed, spp: int, sample_index) -> CorrMJSampler:
    """px/py: int arrays of any shape; seed/sample_index scalars or like px."""
    shape = px.shape
    spp_a = jnp.broadcast_to(u32(spp), shape)
    w = _pow2_mask(spp_a)
    res = jnp.sqrt(spp_a.astype(jnp.float32) + 0.4).astype(jnp.uint32)
    res = jnp.maximum(res, U32(1))
    resw = _pow2_mask(res)
    seed_a = jnp.broadcast_to(u32(seed), shape)
    si = jnp.broadcast_to(u32(sample_index), shape)
    if isinstance(spp, int) and _is_pow2(spp) and _is_pow2(
        max(1, int((float(spp) + 0.4) ** 0.5))
    ):
        cls = CorrMJSamplerP2
    else:
        cls = CorrMJSampler
    return cls(
        sample_index=si,
        dimension=jnp.zeros(shape, jnp.uint32),
        permutation_seed=xxhash32_4(px, py, seed_a, U32(0)),
        state=xxhash32_4(px, py, seed_a, si),
        spp=spp_a,
        w=w,
        res=res,
        resw=resw,
    )


def make_corrmj_sampler(pixel, seed, spp: int, sample_index) -> CorrMJSampler:
    return make_corrmj_sampler_xy(
        pixel[..., 0], pixel[..., 1], seed, spp, sample_index
    )
