"""Stateless-seeded LCG sampler (the reference's swappable third option,
integrator.py:18: luisa.util.make_random_sampler3d(int3(coord, seed^(it*...)))).

State is a uint32 array of shape (N,) for a batch of N lanes; `next1`/`next2`
return (value, new_sampler) so the sampler threads functionally through
integrators and lax.scan carries.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .hashes import U32, lcg_step, lcg_to_unit_float, xxhash32_4


class LCGSampler(NamedTuple):
    state: jnp.ndarray  # uint32 (N,)

    _RESTART_VARYING = ("state",)

    def next1(self) -> Tuple[jnp.ndarray, "LCGSampler"]:
        s = lcg_step(self.state)
        return lcg_to_unit_float(s), LCGSampler(s)

    def salt(self) -> jnp.ndarray:
        """Per-lane uint32 that varies each bounce; for side-channel draws
        (e.g. stochastic gradient splatting) that must not advance or
        correlate with the replayable main stream."""
        return self.state ^ U32(0x5F356495)

    def _next2_xy(self):
        """2D draw as two separate component arrays (plane-layout friendly)."""
        s1 = lcg_step(self.state)
        s2 = lcg_step(s1)
        return (lcg_to_unit_float(s1), lcg_to_unit_float(s2)), LCGSampler(s2)

    def next2(self) -> Tuple[jnp.ndarray, "LCGSampler"]:
        (ux, uy), smp = self._next2_xy()
        return jnp.stack([ux, uy], axis=-1), smp


def make_lcg_sampler_xy(px, py, seed, spp: int, sample_index) -> LCGSampler:
    """px/py: int arrays of any shape; seed/sample_index scalars or like px."""
    mixed_seed = jnp.asarray(seed).astype(jnp.uint32) ^ (
        jnp.asarray(sample_index).astype(jnp.uint32) * U32(987654347)
    )
    state = xxhash32_4(px, py, mixed_seed, jnp.uint32(0x9E3779B9))
    return LCGSampler(jnp.broadcast_to(state, px.shape))


def make_lcg_sampler(
    pixel: jnp.ndarray, seed, spp: int, sample_index
) -> LCGSampler:
    """pixel: (N, 2) int32; seed/sample_index: scalars or (N,)."""
    return make_lcg_sampler_xy(pixel[..., 0], pixel[..., 1], seed, spp, sample_index)
