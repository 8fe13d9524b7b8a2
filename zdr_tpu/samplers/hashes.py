"""uint32 hashing / permutation primitives shared by the samplers.

Reference: /root/reference/pmj02bn.py:33-74 and corrmj.py:5-44 (which needed
signed-int workarounds in the CUDA DSL). Here everything is jnp.uint32 so
wrap-around multiply/shift semantics are native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
# a PYTHON float (not a jnp scalar): jnp constants captured in closures
# become pallas "captured constants" errors inside kernels; a weak-typed
# python float clips/compares to the identical f32 value
ONE_MINUS_EPSILON = float.fromhex("0x1.fffffep-1")


def u32(x) -> jnp.ndarray:
    return jnp.asarray(x).astype(U32)


def u32_to_f32(v: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 value cast, Mosaic-compatible.

    Mosaic has no u32->f32 lowering, so split into exact 16-bit halves and
    recombine: hi * 65536 is exact in f32 and the single rounding of the
    add equals the direct cast's rounding of the same integer — bitwise
    identical to `v.astype(float32)` under round-to-nearest-even (gated by
    tests/test_samplers.py), and XLA folds it to ~4 vector ops."""
    v = u32(v)
    hi = (v >> U32(16)).astype(jnp.int32).astype(jnp.float32)
    lo = (v & U32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def xxhash32_4(x, y, z, w) -> jnp.ndarray:
    """xxhash32 of four 32-bit words (pmj02bn.py:59-74). Batched."""
    p2 = U32(2246822519)
    p3 = U32(3266489917)
    p4 = U32(668265263)
    p5 = U32(374761393)
    x, y, z, w = u32(x), u32(y), u32(z), u32(w)
    h = w + p5 + x * p3
    h = p4 * ((h << 17) | (h >> 15))
    h = h + y * p3
    h = p4 * ((h << 17) | (h >> 15))
    h = h + z * p3
    h = p4 * ((h << 17) | (h >> 15))
    h = p2 * (h ^ (h >> 15))
    h = p3 * (h ^ (h >> 13))
    return h ^ (h >> 16)


def _permute_round(i: jnp.ndarray, w: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """One round of the Kensler in-place permutation network."""
    i = i ^ p
    i = i * U32(0xE170893D)
    i = i ^ (p >> 16)
    i = i ^ ((i & w) >> 4)
    i = i ^ (p >> 8)
    i = i * U32(0x0929EB3F)
    i = i ^ (p >> 23)
    i = i ^ ((i & w) >> 1)
    i = i * (U32(1) | (p >> 27))
    i = i * U32(0x6935FA69)
    i = i ^ ((i & w) >> 11)
    i = i * U32(0x74DCB303)
    i = i ^ ((i & w) >> 2)
    i = i * U32(0x9E501CC3)
    i = i ^ ((i & w) >> 2)
    i = i * U32(0xC860A3DF)
    i = i & w
    i = i ^ (i >> 5)
    return i


def permutation_element(
    i: jnp.ndarray, l: jnp.ndarray, w: jnp.ndarray, p: jnp.ndarray
) -> jnp.ndarray:
    """Kensler-style correlated permutation (pmj02bn.py:33-57), batched.

    The rejection loop re-hashes lanes whose candidate >= l; since w+1 is the
    next power of two above l, each round accepts with probability > 1/2, so
    a batched while_loop converges in a couple of iterations.
    """
    i = u32(i)
    l = u32(l)
    w = u32(w)
    p = u32(p)

    cand = _permute_round(i, w, p)

    def cond(state):
        c, _ = state
        return jnp.any(c >= l)

    def body(state):
        c, done = state
        nxt = _permute_round(c, w, p)
        newly_done = c < l
        c = jnp.where(done | newly_done, c, nxt)
        return c, done | newly_done

    cand, _ = jax.lax.while_loop(cond, body, (cand, cand < l))
    return (cand + p) % l


def permutation_element_pow2(
    i: jnp.ndarray, w: jnp.ndarray, p: jnp.ndarray
) -> jnp.ndarray:
    """permutation_element for the static case l == w + 1 (power-of-two
    list length): the first-round candidate is always in [0, w] < l, so the
    rejection loop — and its full-plane any() reduce, paid per draw inside
    persistent bounce loops — vanishes, and (cand + p) % l == (cand + p) & w.
    Bit-identical to permutation_element whenever l == w + 1 (gated by
    tests/test_samplers.py)."""
    cand = _permute_round(u32(i), u32(w), u32(p))
    return (cand + u32(p)) & u32(w)


def lcg_step(state: jnp.ndarray) -> jnp.ndarray:
    return u32(state) * U32(1664525) + U32(1013904223)


def _finalize(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3-style avalanche: decorrelates raw LCG state bits."""
    h = u32(h)
    h = h ^ (h >> 16)
    h = h * U32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * U32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def lcg_to_unit_float(state: jnp.ndarray) -> jnp.ndarray:
    """Map LCG state to [0,1) via an avalanche finalizer + top 24 bits.

    The raw LCG (corrmj.py:87-92 uses it directly) has visibly correlated
    low bits; the finalizer fixes stratification-test failures without
    changing the functional sampler interface."""
    return u32_to_f32(_finalize(state) >> U32(8)) * jnp.float32(
        1.0 / 0x01000000
    )


def next_pow2_mask(spp: int) -> int:
    """w = next_pow2(spp) - 1 (pmj02bn.py:88-96). Host-side, spp is static."""
    w = spp - 1
    w |= w >> 1
    w |= w >> 2
    w |= w >> 4
    w |= w >> 8
    w |= w >> 16
    return w
