"""Material texture fetch + gradient scatter.

Reference: /root/reference/interaction.py:33-89. The texture is an (H, W, 4)
array holding diffuse RGB + roughness A. Addressing matches the reference:
CLAMP mode, v-flip (u, 1-v), texel grid scaled by res-1, bilinear filtering.

On TPU the bilinear *gather* is plain jnp indexing, and its transpose under
JAX AD is exactly the bilinear scatter-add the reference hand-wrote with
atomic_fetch_add — so `jax.grad` through `read_bsdf` replaces both
write_bsdf_grad and the atomics (the README.md:21 perf cliff). A hand-rolled
`write_bsdf_grad` is still provided for the PRB backward walk, implemented
with index_add (XLA combines duplicate indices deterministically).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

BILINEAR = True  # module flag, like reference interaction.py:33


def _texel_coords(uv: jnp.ndarray, h: int, w: int):
    """uv (N,2) -> (x0, y0, fx, fy) with CLAMP addressing and v-flip."""
    x = uv[..., 0] * (w - 1)
    y = (1.0 - uv[..., 1]) * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    return x0.astype(jnp.int32), y0.astype(jnp.int32), fx, fy


def _clamp_xy(x, y, h, w):
    return jnp.clip(x, 0, w - 1), jnp.clip(y, 0, h - 1)


def read_bsdf(uv: jnp.ndarray, material: jnp.ndarray) -> jnp.ndarray:
    """Sample the material texture at uv. material: (H, W, 4) -> (N, 4)."""
    h, w = material.shape[0], material.shape[1]
    if not BILINEAR:
        x = jnp.clip((uv[..., 0] * (w - 1) + 0.4999).astype(jnp.int32), 0, w - 1)
        y = jnp.clip(((1.0 - uv[..., 1]) * (h - 1) + 0.4999).astype(jnp.int32), 0, h - 1)
        return material[y, x]
    x0, y0, fx, fy = _texel_coords(uv, h, w)
    xa, ya = _clamp_xy(x0, y0, h, w)
    xb, yb = _clamp_xy(x0 + 1, y0 + 1, h, w)
    c00 = material[ya, xa]
    c01 = material[yb, xa]
    c10 = material[ya, xb]
    c11 = material[yb, xb]
    fx = fx[..., None]
    fy = fy[..., None]
    top = c00 + (c01 - c00) * fy
    bot = c10 + (c11 - c10) * fy
    return top + (bot - top) * fx


def write_bsdf_grad(
    uv: jnp.ndarray, dmat: jnp.ndarray, d_material: jnp.ndarray
) -> jnp.ndarray:
    """Scatter-add per-sample gradients into the texture gradient.

    Returns the updated d_material (functional). uv: (N,2), dmat: (N,4),
    d_material: (H,W,4). Weights are the same bilinear corner weights the
    gather uses, i.e. this is exactly the VJP of read_bsdf w.r.t. material.
    """
    h, w = d_material.shape[0], d_material.shape[1]
    x0, y0, fx, fy = _texel_coords(uv, h, w)
    xa, ya = _clamp_xy(x0, y0, h, w)
    xb, yb = _clamp_xy(x0 + 1, y0 + 1, h, w)
    k00 = ((1 - fx) * (1 - fy))[..., None]
    k01 = ((1 - fx) * fy)[..., None]
    k10 = (fx * (1 - fy))[..., None]
    k11 = (fx * fy)[..., None]
    d_material = d_material.at[ya, xa].add(k00 * dmat)
    d_material = d_material.at[yb, xa].add(k01 * dmat)
    d_material = d_material.at[ya, xb].add(k10 * dmat)
    d_material = d_material.at[yb, xb].add(k11 * dmat)
    return d_material
