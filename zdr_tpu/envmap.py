"""Environment map lighting: host-side alias-table build + device sampling.

Reference: /root/reference/envmap.py. Functional parity:
  * equirect RGBA texture, 1:2 (or 1:1 stretched) aspect;
  * a 512x256 gaussian-filtered, sin(theta)-weighted luminance "sample map"
    (envmap.py:136-159) — built here with vectorized numpy instead of a GPU
    kernel;
  * optional "practical MIS compensation" (subtract the sin-weighted average,
    clamp at 0 — envmap.py:167-175);
  * per-row conditional + marginal alias tables in one concatenated buffer
    (marginal first, envmap.py:177-194,225-227), built O(n) vectorized (the
    reference flags its Python build as slow, envmap.py:181,196);
  * device sampling: two alias draws -> uv -> direction, pdf in solid angle
    (envmap.py:223-248).

Device-side texture fetch is manual bilinear (wrap-x, clamp-y) — no hardware
samplers on TPU.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PI = math.pi

SAMPLE_MAP_W = 512
SAMPLE_MAP_H = 256


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EnvMap:
    """Device-ready envmap data. A dummy (1x1, zero) instance stands in when
    the scene has no envmap so pytree structure stays stable."""

    texture: jnp.ndarray  # (H, W, 4) float32 equirect radiance
    alias_prob: jnp.ndarray  # (HM + HM*WM,) float32: [marginal | rows]
    alias_idx: jnp.ndarray  # (HM + HM*WM,) int32
    pdf: jnp.ndarray  # (HM * WM,) float32 discrete pdf * pixel_count

    @staticmethod
    def dummy() -> "EnvMap":
        return EnvMap(
            texture=jnp.zeros((1, 1, 4), jnp.float32),
            alias_prob=jnp.ones((1 + 1,), jnp.float32),
            alias_idx=jnp.zeros((1 + 1,), jnp.int32),
            pdf=jnp.ones((1,), jnp.float32),
        )


# --------------------------------------------------------------- host build


def create_alias_table(values: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Alias table for one discrete distribution (envmap.py:17-57).

    Returns (prob, alias, pdf) arrays of len(values).
    """
    values = np.abs(np.asarray(values, dtype=np.float64))
    n = len(values)
    total = values.sum()
    if total == 0.0:
        pdf = np.full(n, 1.0 / n)
        return np.ones(n, np.float32), np.arange(n, dtype=np.int32), pdf.astype(np.float32)
    pdf = values / total
    prob = (values * (n / total)).astype(np.float64)
    alias = np.arange(n, dtype=np.int32)
    over = [i for i in range(n) if prob[i] > 1.0]
    under = [i for i in range(n) if prob[i] < 1.0]
    while over and under:
        o = over.pop()
        u = under.pop()
        prob[o] -= 1.0 - prob[u]
        alias[u] = o
        if prob[o] > 1.0:
            over.append(o)
        elif prob[o] < 1.0:
            under.append(o)
    for i in over + under:
        prob[i] = 1.0
        alias[i] = i
    return prob.astype(np.float32), alias, pdf.astype(np.float32)


def _bilinear_wrap(img: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Bilinear sample img (H,W,C) at texel-space uv in [0,1); wrap-x clamp-y."""
    h, w = img.shape[:2]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xa = x0 % w
    xb = (x0 + 1) % w
    ya = np.clip(y0, 0, h - 1)
    yb = np.clip(y0 + 1, 0, h - 1)
    top = img[ya, xa] * (1 - fx) + img[ya, xb] * fx
    bot = img[yb, xa] * (1 - fx) + img[yb, xb] * fx
    return top * (1 - fy) + bot * fy


def build_envmap(img: np.ndarray, compensate_mis: bool = True) -> EnvMap:
    """Build device-ready envmap data from an RGBA image (H,W,4)."""
    img = np.asarray(img, dtype=np.float32)
    assert img.ndim == 3 and img.shape[2] == 4, "envmap must be (H, W, 4)"
    if img.shape[0] != img.shape[1]:
        if img.shape[1] == img.shape[0] * 2:
            pass  # 1:2 equirect, native
        else:
            raise RuntimeError("envmap must be strictly 1:2 or 1:1")
    # (1:1 images are implicitly stretched, like the reference's repeat)

    wm, hm = SAMPLE_MAP_W, SAMPLE_MAP_H
    # filtered luminance sample map (envmap.py:136-159)
    px = (np.arange(wm) + 0.5) / wm
    py = (np.arange(hm) + 0.5) / hm
    uu, vv = np.meshgrid(px, py)  # (hm, wm)
    lum_w = np.array([0.212671, 0.715160, 0.072169], dtype=np.float32)
    filter_radius, filter_step = 1.0, 0.125
    n = int(math.ceil(filter_radius / filter_step))
    sum_w = 0.0
    sum_scale = np.zeros((hm, wm), dtype=np.float64)
    offs = np.arange(-n, n + 1) * filter_step
    for dy in offs:
        for dx in offs:
            ou = uu + dx / wm
            ov = vv + dy / hm
            rgb = _bilinear_wrap(img[..., :3], ou, np.clip(ov, 0.0, 1.0 - 1e-7))
            scale = rgb @ lum_w
            sin_theta = np.sin(ov * _PI)
            # gaussian weight over the offset in sample-map pixel units
            weight = math.exp(-4.0 * (dx * dx + dy * dy))
            sum_w += weight
            sum_scale += weight * np.minimum(scale * sin_theta, 1e8)
    scale_map = (sum_scale / sum_w).astype(np.float64)  # (hm, wm)

    if compensate_mis:
        row_w = np.sin((np.arange(hm) + 0.5) / hm * _PI)
        avg = scale_map.mean()
        scale_map = scale_map - avg * (row_w / row_w.mean())[:, None]
        scale_map = np.maximum(scale_map, 0.0)

    # per-row conditional tables + marginal table, concatenated marginal-first
    probs = np.empty((hm, wm), np.float32)
    aliases = np.empty((hm, wm), np.int32)
    pdfs = np.empty((hm, wm), np.float32)
    row_avg = scale_map.mean(axis=1)
    for y in range(hm):
        p, a, d = create_alias_table(scale_map[y])
        probs[y], aliases[y], pdfs[y] = p, a, d
    mp, ma, mpdf = create_alias_table(row_avg)
    pdf_full = pdfs * mpdf[:, None] * (wm * hm)  # density on the unit square
    return EnvMap(
        texture=jnp.asarray(img),
        alias_prob=jnp.asarray(np.concatenate([mp, probs.reshape(-1)])),
        alias_idx=jnp.asarray(np.concatenate([ma, aliases.reshape(-1)])),
        pdf=jnp.asarray(pdf_full.reshape(-1)),
    )


def make_test_envmap(h: int = 64, w: int = 128) -> np.ndarray:
    """Procedural HDR sky: gradient + bright sun blob (stands in for the
    missing assets/empty_workshop_4k.exr)."""
    v, u = np.mgrid[0:h, 0:w].astype(np.float64)
    u = (u + 0.5) / w
    v = (v + 0.5) / h
    sky_t = np.cos(v * _PI) * 0.5 + 0.5
    r = 0.25 + 0.75 * sky_t
    g = 0.35 + 0.55 * sky_t
    b = 0.5 + 0.5 * sky_t
    # sun at (u,v) = (0.3, 0.3)
    d2 = ((u - 0.3) * 2 * _PI) ** 2 + ((v - 0.3) * _PI) ** 2
    sun = 50.0 * np.exp(-d2 / 0.01)
    img = np.stack([r + sun, g + sun * 0.9, b + sun * 0.7, np.ones_like(r)], -1)
    return img.astype(np.float32)


# --------------------------------------------------------------- device side


def uv_to_direction(uv: jnp.ndarray) -> jnp.ndarray:
    """(envmap.py:206-213): y-up, phi wraps with 1-u."""
    phi = 2.0 * _PI * (1.0 - uv[..., 0])
    theta = _PI * uv[..., 1]
    y = jnp.cos(theta)
    st = jnp.sin(theta)
    x = jnp.sin(phi) * st
    z = jnp.cos(phi) * st
    return jnp.stack([x, y, z], axis=-1)


def direction_to_uv(d: jnp.ndarray) -> jnp.ndarray:
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 0], d[..., 2])
    u = 1.0 - phi / (2.0 * _PI)
    # wrap into [0,1): the reference leaves u in [0.5, 1.5) and *clamps* it
    # in env_sampled_light_pdf (envmap.py:242), which breaks MIS pdfs on
    # half the sphere; its texture fetch only worked via hardware repeat.
    u = u - jnp.floor(u)
    return jnp.stack([u, theta / _PI], axis=-1)


def texture_sample(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear equirect fetch, wrap-x clamp-y. tex (H,W,4), uv (N,2) -> (N,4)."""
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    xa = jnp.mod(x0, w)
    xb = jnp.mod(x0 + 1, w)
    ya = jnp.clip(y0, 0, h - 1)
    yb = jnp.clip(y0 + 1, 0, h - 1)
    top = tex[ya, xa] * (1 - fx) + tex[ya, xb] * fx
    bot = tex[yb, xa] * (1 - fx) + tex[yb, xb] * fx
    return top * (1 - fy) + bot * fy


def _sample_alias(env: EnvMap, n: int, u_in: jnp.ndarray, offset) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One alias-table draw with sample reuse (envmap.py:86-106).

    Returns (index, remapped u)."""
    u = u_in * n
    i = jnp.clip(u.astype(jnp.int32), 0, n - 1)
    ur = u - jnp.floor(u)
    prob = env.alias_prob[i + offset]
    alias = env.alias_idx[i + offset]
    take_self = ur < prob
    index = jnp.where(take_self, i, alias)
    uu = jnp.where(
        take_self,
        ur / jnp.maximum(prob, 1e-12),
        (ur - prob) / jnp.maximum(1.0 - prob, 1e-12),
    )
    return index, jnp.clip(uu, 0.0, 1.0 - 1e-7)


def sample_envmap(env: EnvMap, u2: jnp.ndarray):
    """Importance-sample a direction (envmap.py:223-238).

    Returns (wi, dist, pdf, radiance) batched."""
    hm, wm = SAMPLE_MAP_H, SAMPLE_MAP_W
    sy_i, sy_u = _sample_alias(env, hm, u2[..., 1], 0)
    offset = hm + sy_i * wm
    sx_i, sx_u = _sample_alias(env, wm, u2[..., 0], offset)
    uv = jnp.stack(
        [(sx_i + sx_u) / wm, (sy_i + sy_u) / hm], axis=-1
    )
    idx = sy_i * wm + sx_i
    pdf_tab = env.pdf[idx]
    s = jnp.sin(_PI * uv[..., 1])
    inv_s = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-12), 0.0)
    pdf = pdf_tab * inv_s / (2.0 * _PI * _PI)
    wi = uv_to_direction(uv)
    radiance = texture_sample(env.texture, uv)[..., :3]
    dist = jnp.full(uv.shape[:-1], 1e30, jnp.float32)
    return wi, dist, pdf, radiance


def env_sampled_light_pdf(env: EnvMap, d: jnp.ndarray) -> jnp.ndarray:
    """pdf that sample_envmap would have produced direction d (envmap.py:240-248)."""
    hm, wm = SAMPLE_MAP_H, SAMPLE_MAP_W
    uv = direction_to_uv(d)
    iy = jnp.clip((uv[..., 1] * hm).astype(jnp.int32), 0, hm - 1)
    ix = jnp.clip((uv[..., 0] * wm).astype(jnp.int32), 0, wm - 1)
    pdf_tab = env.pdf[iy * wm + ix]
    s = jnp.sin(_PI * uv[..., 1])
    inv_s = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-12), 0.0)
    return pdf_tab * inv_s / (2.0 * _PI * _PI)


def env_radiance(env: EnvMap, d: jnp.ndarray) -> jnp.ndarray:
    """Radiance looking along direction d (the miss shader's env lookup)."""
    return texture_sample(env.texture, direction_to_uv(d))[..., :3]
