"""Samplers: per-(pixel, seed, spp, sample_index) deterministic sample streams.

All samplers are functional pytrees: `u, sampler = sampler.next1()` /
`sampler.next2()`. Determinism given the key tuple is what makes Path Replay
Backpropagation possible without storing paths (the backward pass replays the
identical stream — reference prb.py:96-98).

Available kinds (reference integrator.py:16-18):
  * "pmj02bn" — progressive multi-jittered (0,2) blue-noise (default, as in
    the reference).
  * "corrmj"  — correlated multi-jitter.
  * "lcg"     — plain hash-seeded LCG.
"""

import jax
import jax.numpy as jnp

from .hashes import ONE_MINUS_EPSILON
from .lcg import LCGSampler, make_lcg_sampler


def select_on_restart(restart, new_smp, smp):
    """where(restart, new_smp, smp) over ONLY the sampler's restart-varying
    leaves (class attr `_RESTART_VARYING`). The invariant leaves — pixel,
    seed, spp masks, pmj02bn's (n_tex, *lanes) bn_cache — are recomputed
    bit-identically by every restart (same px/py/seed), so passing the
    CARRIED leaf through unchanged is exact, and the identity carry lets
    XLA's while-loop simplifier hoist those planes out of the loop state
    instead of burning n_tex dead selects per bounce. The mask broadcasts
    against TRAILING dims (leaves may carry leading table axes)."""

    def sel(a, b):
        r = restart.reshape((1,) * (a.ndim - restart.ndim) + restart.shape)
        return jnp.where(r, a, b)

    varying = getattr(type(smp), "_RESTART_VARYING", None)
    if varying is None:
        return jax.tree.map(sel, new_smp, smp)
    return smp._replace(
        **{f: sel(getattr(new_smp, f), getattr(smp, f)) for f in varying}
    )


def make_sampler_xy(kind: str, px, py, seed, spp: int, sample_index):
    """Shape-generic factory: px/py are int arrays of any shape ((N,) lanes
    or (rows, 128) planes); all sampler state leaves get that shape."""
    if kind == "lcg":
        from .lcg import make_lcg_sampler_xy

        return make_lcg_sampler_xy(px, py, seed, spp, sample_index)
    if kind == "pmj02bn":
        from .pmj02bn import make_pmj02bn_sampler_xy

        return make_pmj02bn_sampler_xy(px, py, seed, spp, sample_index)
    if kind == "corrmj":
        from .corrmj import make_corrmj_sampler_xy

        return make_corrmj_sampler_xy(px, py, seed, spp, sample_index)
    raise ValueError(f"unknown sampler kind: {kind!r}")


def make_sampler(kind: str, pixel, seed, spp: int, sample_index):
    return make_sampler_xy(
        kind, pixel[..., 0], pixel[..., 1], seed, spp, sample_index
    )


__all__ = [
    "select_on_restart",
    "make_sampler",
    "make_lcg_sampler",
    "LCGSampler",
    "ONE_MINUS_EPSILON",
]
