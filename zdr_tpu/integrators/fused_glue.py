"""XLA plane glue for the fused Pallas bounce pipeline.

Everything in the fused per-bounce loop that is *divergence-free but
gather-heavy* runs here, between the two Pallas kernels, on (rows, 128)
SoA planes:

  * the sampler draws (any registered sampler — lcg / pmj02bn / corrmj —
    via the shape-generic samplers package; table-based draws are XLA
    gathers from HBM);
  * NEE light selection among envmap + point + mesh area lights
    (lights.sample_light parity, componentized);
  * envmap machinery: alias-table draws, equirect pdf / radiance fetches
    (envmap.py parity; the texture is fetched from a wrap-augmented
    quad-packed table, one row-gather per bilinear tap).

The kernels (pallas_bounce.py) only ever see per-lane planes, which is what
makes environment maps, point lights and blue-noise samplers fused-capable
without growing kernel VMEM.

Reference parity notes: light selection follows /root/reference/light.py:23-81
with the documented 1/(env+point+mesh) selection deviation (lights.py);
envmap sampling follows /root/reference/envmap.py:86-106,223-248.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..samplers import make_sampler_xy
from ..scenedata import SceneData

_PI = math.pi


# ------------------------------------------------------------- table build


class GlueTables(NamedTuple):
    """Traced gather tables for the glue (loop-invariant: XLA hoists their
    construction out of the bounce loop). Entries for absent light kinds are
    minimal dummies so the pytree structure is stable."""

    light_pack: jnp.ndarray  # (L_pad, 25) per light-TRIANGLE rows (cols
    # 0:16 = v0/e1/e2/em/ng/inv_pdf for NEE; 16:25 = n0/dn1/dn2 for the
    # emissive-first bounce lookup's shading-normal test)
    light_inst: jnp.ndarray  # (max(n_lights,1), 2) f32 [tri_offset, tri_count]
    point_pack: jnp.ndarray  # (max(n_point,1), 8) f32 [pos3, intensity3, 0, 0]
    env_alias: jnp.ndarray  # (hm + hm*wm, 2) f32 [prob, alias_idx as VALUE]
    env_pdf: jnp.ndarray  # (hm * wm,) f32 (density on the unit square)
    env_quads: jnp.ndarray  # ((H-1) * (W+1), 16) wrap-augmented RGBA quads


def pack_env_quads(tex: jnp.ndarray) -> jnp.ndarray:
    """Quad-pack an equirect (H, W, 4) texture with wrap-x / clamp-y
    addressing: one row-gather per bilinear tap (texture.pack_quads analog
    for envmap.texture_sample semantics). Augments x with one wrapped column
    on each side so every quad is contiguous."""
    aug = jnp.concatenate([tex[:, -1:], tex, tex[:, :1]], axis=1)  # (H, W+2, 4)
    c00 = aug[:-1, :-1]
    c01 = aug[1:, :-1]
    c10 = aug[:-1, 1:]
    c11 = aug[1:, 1:]
    h1, w1 = c00.shape[0], c00.shape[1]  # (H-1, W+1)
    return jnp.concatenate([c00, c01, c10, c11], axis=-1).reshape(h1 * w1, 16)


def build_glue_tables(data: SceneData, meta, light_pack) -> GlueTables:
    """Assemble gather tables from SceneData (+ the light_pack that
    build_fused_const already produces)."""
    if meta.n_lights > 0:
        import numpy as np

        offs = np.asarray(meta.light_offsets, np.float32)
        tcs = np.asarray(meta.light_tcs, np.float32)
        light_inst = jnp.asarray(np.stack([offs, tcs], axis=1))
    else:
        light_inst = jnp.zeros((1, 2), jnp.float32)
    if meta.n_point > 0:
        pp = data.point_pos[: meta.n_point].astype(jnp.float32)
        pi = data.point_intensity[: meta.n_point].astype(jnp.float32)
        point_pack = jnp.concatenate(
            [pp, pi, jnp.zeros((meta.n_point, 2), jnp.float32)], axis=1
        )
    else:
        point_pack = jnp.zeros((1, 8), jnp.float32)
    if meta.n_env > 0:
        env = data.env
        # the alias index rides as a float VALUE (exact below 2^24), NOT a
        # bitcast: small int32 bit patterns are f32 DENORMALS, and TPU
        # gathers from tiny-minor-dim tables lower through arithmetic that
        # flushes denormals to zero — measured: every gathered alias index
        # read back 0 on v5e, silently collapsing env NEE onto texel row 0
        # (round-5 fix; the unfused path keeps separate prob/idx arrays)
        env_alias = jnp.stack(
            [env.alias_prob, env.alias_idx.astype(jnp.float32)],
            axis=-1,
        )
        env_pdf = env.pdf
        env_quads = pack_env_quads(env.texture)
    else:
        env_alias = jnp.zeros((2, 2), jnp.float32)
        env_pdf = jnp.ones((1,), jnp.float32)
        env_quads = jnp.zeros((1, 16), jnp.float32)
    return GlueTables(
        light_pack=light_pack,
        light_inst=light_inst,
        point_pack=point_pack,
        env_alias=env_alias,
        env_pdf=env_pdf,
        env_quads=env_quads,
    )


# --------------------------------------------------------- primary samples


def start_sample_planes(kind, pxp, pyp, camera, seed, sample_idx, spp, res,
                        use_tent):
    """Fresh sampler + primary ray planes for (pixel, seed, spp, sample):
    the plane version of path_persistent._start_sample, sampler-generic.
    Returns (sampler, (ox, oy, oz), (dx, dy, dz))."""
    w, h = res
    smp = make_sampler_xy(kind, pxp, pyp, seed, spp, sample_idx)
    (u0, u1), smp = smp._next2_xy()
    if use_tent:
        # camera.tent_warp componentized
        def tw(u):
            lo = jnp.sqrt(2.0 * u) - 1.0
            hi = 1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * u, 0.0))
            return jnp.where(u < 0.5, lo, hi)

        ox = tw(u0) + 0.5
        oy = tw(u1) + 0.5
    else:
        ox, oy = u0, u1
    px_ndc = 2.0 / w * (pxp.astype(jnp.float32) + ox) - 1.0
    py_ndc = (2.0 / h * (pyp.astype(jnp.float32) + oy) - 1.0) * (h / w)

    # camera.generate_ray componentized (camera pytree scalars broadcast)
    def norm3(x, y, z):
        inv = 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-20)
        return x * inv, y * inv, z * inv

    fx, fy, fz = norm3(
        camera.target[0] - camera.origin[0],
        camera.target[1] - camera.origin[1],
        camera.target[2] - camera.origin[2],
    )
    ux_, uy_, uz_ = camera.up[0], camera.up[1], camera.up[2]
    rx, ry, rz = norm3(
        fy * uz_ - fz * uy_, fz * ux_ - fx * uz_, fx * uy_ - fy * ux_
    )
    upx = ry * fz - rz * fy
    upy = rz * fx - rx * fz
    upz = rx * fy - ry * fx
    scale = jnp.tan(0.5 * camera.fov)
    sx = px_ndc * scale
    sy = py_ndc * scale
    dx = sx * rx - sy * upx + fx
    dy = sx * ry - sy * upy + fy
    dz = sx * rz - sy * upz + fz
    dx, dy, dz = norm3(dx, dy, dz)
    ox3 = jnp.broadcast_to(camera.origin[0], dx.shape)
    oy3 = jnp.broadcast_to(camera.origin[1], dx.shape)
    oz3 = jnp.broadcast_to(camera.origin[2], dx.shape)
    return smp, (ox3, oy3, oz3), (dx, dy, dz)


# ------------------------------------------------------------ env sampling

from ..envmap import SAMPLE_MAP_H, SAMPLE_MAP_W


def _env_direction_to_uv(d):
    """envmap.direction_to_uv componentized (wrap-to-[0,1) deviation noted
    there)."""
    theta = jnp.arccos(jnp.clip(d[1], -1.0, 1.0))
    phi = jnp.arctan2(d[0], d[2])
    u = 1.0 - phi / (2.0 * _PI)
    u = u - jnp.floor(u)
    return u, theta / _PI


def _env_uv_to_direction(u, v):
    phi = 2.0 * _PI * (1.0 - u)
    theta = _PI * v
    y = jnp.cos(theta)
    st = jnp.sin(theta)
    return (jnp.sin(phi) * st, y, jnp.cos(phi) * st)


def env_fetch_planes(env_quads, env_hw, u, v):
    """Bilinear equirect radiance fetch (envmap.texture_sample parity:
    wrap-x, clamp-y) from the quad-packed table -> (r, g, b) planes."""
    h, w = env_hw
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)  # in [-1, w-1]
    y0 = jnp.clip(jnp.floor(y), 0, h - 2)
    fx = x - x0
    fy = jnp.clip(y - y0, 0.0, 1.0)
    qx = (x0 + 1.0).astype(jnp.int32)  # augmented anchor in [0, w]
    qy = y0.astype(jnp.int32)
    rows = env_quads[qy * (w + 1) + qx]
    w00 = (1 - fx) * (1 - fy)
    w01 = (1 - fx) * fy
    w10 = fx * (1 - fy)
    w11 = fx * fy
    out = []
    for c in range(3):
        out.append(
            rows[..., c] * w00
            + rows[..., 4 + c] * w01
            + rows[..., 8 + c] * w10
            + rows[..., 12 + c] * w11
        )
    return out


def env_pdf_planes(env_pdf, u, v):
    """envmap.env_sampled_light_pdf componentized (WITHOUT the 1/n light
    selection factor)."""
    hm, wm = SAMPLE_MAP_H, SAMPLE_MAP_W
    iy = jnp.clip((v * hm).astype(jnp.int32), 0, hm - 1)
    ix = jnp.clip((u * wm).astype(jnp.int32), 0, wm - 1)
    pdf_tab = env_pdf[iy * wm + ix]
    s = jnp.sin(_PI * v)
    inv_s = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-12), 0.0)
    return pdf_tab * inv_s / (2.0 * _PI * _PI)


def env_miss_add_planes(meta, tables: GlueTables, env_hw, d, pdf_prev, miss):
    """Envmap contribution of miss lanes, MIS-weighted against the carried
    BSDF pdf (path.py:101-107 parity). Returns (r, g, b) addends."""
    u, v = _env_direction_to_uv(d)
    pdf_env = env_pdf_planes(tables.env_pdf, u, v) * (1.0 / meta.n_total)
    mis = pdf_prev / jnp.maximum(pdf_prev + pdf_env, 1e-4)
    rad = env_fetch_planes(tables.env_quads, env_hw, u, v)
    on = miss
    return tuple(jnp.where(on, mis * rad[c], 0.0) for c in range(3))


def _sample_alias_planes(env_alias, n, u_in, offset):
    """envmap._sample_alias componentized: one packed gather per draw."""
    u = u_in * n
    i = jnp.clip(u.astype(jnp.int32), 0, n - 1)
    ur = u - jnp.floor(u)
    rows = env_alias[i + offset]
    prob = rows[..., 0]
    alias = rows[..., 1].astype(jnp.int32)  # float-VALUE-encoded index
    take_self = ur < prob
    index = jnp.where(take_self, i, alias)
    uu = jnp.where(
        take_self,
        ur / jnp.maximum(prob, 1e-12),
        (ur - prob) / jnp.maximum(1.0 - prob, 1e-12),
    )
    return index, jnp.clip(uu, 0.0, 1.0 - 1e-7)


# -------------------------------------------------------------- NEE glue


# Below this many rows, per-lane "gathers" from the tiny light tables are
# done as static where-chains (one fused elementwise kernel, zero gathers):
# a TPU gather costs per-LANE (~0.7 ms per 262k lanes even on a 2-row
# table), while 16 selects/row over planes are nearly free VPU work.
SMALL_TABLE_ROWS = 32


def _select_rows(table, idx, n_rows: int, n_cols: int):
    """Per-lane row fetch from a small traced table: where-chain when the
    static row count is small, one gather otherwise. Returns a list of
    n_cols planes."""
    if n_rows <= SMALL_TABLE_ROWS:
        cols = [jnp.zeros_like(idx, jnp.float32) for _ in range(n_cols)]
        for r in range(n_rows):
            m = idx == r
            cols = [jnp.where(m, table[r, c], cols[c]) for c in range(n_cols)]
        return cols
    rows = table[idx]
    return [rows[..., c] for c in range(n_cols)]


def sample_light_planes(meta, tables: GlueTables, env_hw, p, smp):
    """Plane version of lights.sample_light: same draws, same selection
    arithmetic, same pdfs. p: (px, py, pz) planes. Returns
    ((wi3, dist, pdf, eval3), smp)."""
    u_sel, smp = smp.next1()
    u_prim, smp = smp.next1()
    (u2a, u2b), smp = smp._next2_xy()

    n_env, n_point, n_mesh = meta.n_env, meta.n_point, meta.n_lights
    n_i = n_env + n_point + n_mesh
    n = float(max(n_i, 1))
    idx = jnp.clip((u_sel * n).astype(jnp.int32), 0, max(n_i - 1, 0))

    zero = jnp.zeros_like(u_sel)
    wi = (zero, zero, zero + 1.0)
    dist = zero
    pdf = zero + 1.0
    ev = (zero, zero, zero)

    if n_mesh > 0:
        mesh_idx = jnp.clip(idx - n_env - n_point, 0, max(n_mesh - 1, 0))
        off, tc = _select_rows(tables.light_inst, mesh_idx, n_mesh, 2)
        prim_local = jnp.clip(u_prim * tc, 0.0, jnp.maximum(tc - 1.0, 0.0))
        l_sel = (off + jnp.floor(prim_local)).astype(jnp.int32)
        lt = _select_rows(
            tables.light_pack, l_sel, len(meta.light_tri_ids), 16
        )
        lv0 = (lt[0], lt[1], lt[2])
        le1 = (lt[3], lt[4], lt[5])
        le2 = (lt[6], lt[7], lt[8])
        lem = (lt[9], lt[10], lt[11])
        l_ng = (lt[12], lt[13], lt[14])
        l_inv_pdf = lt[15]
        # sample_uniform_triangle (lights.py:45-50)
        a_bc = jnp.where(u2a < u2b, 0.5 * u2a, u2a - 0.5 * u2b)
        b_bc = jnp.where(u2a < u2b, u2b - 0.5 * u2a, 0.5 * u2b)
        c_bc = 1.0 - a_bc - b_bc
        # p_light = a*p0 + b*p1 + c*p2 = p0 + b*e1 + c*e2
        plx = lv0[0] + b_bc * le1[0] + c_bc * le2[0]
        ply = lv0[1] + b_bc * le1[1] + c_bc * le2[1]
        plz = lv0[2] + b_bc * le1[2] + c_bc * le2[2]
        dx = plx - p[0]
        dy = ply - p[1]
        dz = plz - p[2]
        sqr = dx * dx + dy * dy + dz * dz
        inv_len = 1.0 / jnp.maximum(jnp.sqrt(sqr), 1e-20)
        m_wi = (dx * inv_len, dy * inv_len, dz * inv_len)
        cos_l = -(l_ng[0] * m_wi[0] + l_ng[1] * m_wi[1] + l_ng[2] * m_wi[2])
        m_pdf = sqr / jnp.maximum(l_inv_pdf * cos_l, 1e-12)
        ok = cos_l > 1e-4
        m_ev = tuple(jnp.where(ok, lem[c], 0.0) for c in range(3))
        m_dist = 0.9999 * jnp.sqrt(sqr)
        wi, dist, pdf, ev = m_wi, m_dist, m_pdf, m_ev

    if n_point > 0:
        p_idx = jnp.clip(idx - n_env, 0, max(n_point - 1, 0))
        pt = _select_rows(tables.point_pack, p_idx, n_point, 6)
        dx = pt[0] - p[0]
        dy = pt[1] - p[1]
        dz = pt[2] - p[2]
        sqr = dx * dx + dy * dy + dz * dz
        inv_len = 1.0 / jnp.maximum(jnp.sqrt(sqr), 1e-20)
        p_wi = (dx * inv_len, dy * inv_len, dz * inv_len)
        p_pdf = sqr / n
        p_dist = 0.9999 * jnp.sqrt(sqr)
        p_ev = (pt[3], pt[4], pt[5])
        is_point = (idx >= n_env) & (idx < n_env + n_point)
        wi = tuple(jnp.where(is_point, p_wi[c], wi[c]) for c in range(3))
        dist = jnp.where(is_point, p_dist, dist)
        pdf = jnp.where(is_point, p_pdf, pdf)
        ev = tuple(jnp.where(is_point, p_ev[c], ev[c]) for c in range(3))

    if n_env > 0:
        hm, wm = SAMPLE_MAP_H, SAMPLE_MAP_W
        sy_i, sy_u = _sample_alias_planes(tables.env_alias, hm, u2b, 0)
        offset = hm + sy_i * wm
        sx_i, sx_u = _sample_alias_planes(tables.env_alias, wm, u2a, offset)
        eu = (sx_i.astype(jnp.float32) + sx_u) / wm
        ev_ = (sy_i.astype(jnp.float32) + sy_u) / hm
        pdf_tab = tables.env_pdf[sy_i * wm + sx_i]
        s = jnp.sin(_PI * ev_)
        inv_s = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-12), 0.0)
        # env draw picks among n lights too: scale pdf by 1/n (lights.py:125)
        e_pdf = pdf_tab * inv_s / (2.0 * _PI * _PI) * (1.0 / n)
        e_wi = _env_uv_to_direction(eu, ev_)
        e_rad = env_fetch_planes(tables.env_quads, env_hw, eu, ev_)
        is_env = idx < n_env
        wi = tuple(jnp.where(is_env, e_wi[c], wi[c]) for c in range(3))
        dist = jnp.where(is_env, 1e30, dist)
        pdf = jnp.where(is_env, e_pdf, pdf)
        ev = tuple(jnp.where(is_env, e_rad[c], ev[c]) for c in range(3))

    return (wi, dist, pdf, ev), smp


def light_hit_planes(meta, tables: GlueTables, d_planes, o_planes, pdf_prev,
                     active_i):
    """Closest hit over the LIGHT triangles only, with the emitter-hit MIS
    epilogue (pallas_bounce._emitter_epilogue parity, reference
    direct.py:58-83's BSDF-branch emitter weighting).

    The streamed direct integrator's bounce emitter lookup uses this tiny
    per-light-triangle sweep (L is a handful of triangles) plus ONE
    t-capped occlusion sweep instead of a full-scene closest trace: a
    bounce ray contributes iff its closest EMISSIVE hit is unoccluded, and
    lanes that reach no light at all drop out of the occlusion sweep's
    active set entirely (on big meshes most bounce rays miss the lights,
    so the expensive incoherent closest sweep collapses to a cheap
    mostly-inactive any sweep).

    Returns (t_e, (er, eg, eb), has_i32): the radiance assumes the path to
    the light is CLEAR — callers mask it with an occlusion sweep capped at
    0.9999 * t_e (the NEE shadow epsilon, lights.py parity).
    """
    L = len(meta.light_tri_ids)
    o, d = o_planes, d_planes
    act = active_i != 0
    big = jnp.float32(1e30)
    zero = jnp.zeros_like(o[0])
    if L == 0:
        zi = jnp.zeros_like(active_i)
        return zero + big, (zero, zero, zero), zi
    lp = tables.light_pack

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    best_t = zero + big
    best_j = jnp.zeros_like(active_i)
    bu = zero
    bv = zero
    for j in range(L):
        p0 = (lp[j, 0], lp[j, 1], lp[j, 2])
        e1 = (lp[j, 3], lp[j, 4], lp[j, 5])
        e2 = (lp[j, 6], lp[j, 7], lp[j, 8])
        h = cross(d, e2)
        a = dot(e1, h)
        f = jnp.where(jnp.abs(a) > 1e-12,
                      1.0 / jnp.where(a == 0, 1.0, a), 0.0)
        s = (o[0] - p0[0], o[1] - p0[1], o[2] - p0[2])
        u = f * dot(s, h)
        q = cross(s, e1)
        v = f * dot(d, q)
        t = f * dot(e2, q)
        ok = (
            (jnp.abs(a) > 1e-12)
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > 0.0) & (t < best_t)
        )
        best_t = jnp.where(ok, t, best_t)
        best_j = jnp.where(ok, j, best_j)
        bu = jnp.where(ok, u, bu)
        bv = jnp.where(ok, v, bv)
    has = act & (best_t < big)

    cols = _select_rows(lp, best_j, L, 25)
    ng = (cols[12], cols[13], cols[14])
    em = (cols[9], cols[10], cols[11])
    inv_pdfc = cols[15]
    nsx = cols[16] + bu * cols[19] + bv * cols[22]
    nsy = cols[17] + bu * cols[20] + bv * cols[23]
    nsz = cols[18] + bu * cols[21] + bv * cols[24]
    inv = 1.0 / jnp.maximum(
        jnp.sqrt(nsx * nsx + nsy * nsy + nsz * nsz), 1e-20
    )
    ns = (nsx * inv, nsy * inv, nsz * inv)
    cos_light = -dot(ng, d)
    frontfacing = (cos_light >= 1e-4) & (-dot(ns, d) >= 1e-4)
    emissive = (em[0] > 0.0) | (em[1] > 0.0) | (em[2] > 0.0)
    pdf_hit = best_t * best_t / jnp.maximum(inv_pdfc * cos_light, 1e-12)
    mis = pdf_prev / jnp.maximum(pdf_prev + pdf_hit, 1e-4)
    on = has & frontfacing & emissive
    add = tuple(jnp.where(on, mis * em[c], 0.0) for c in range(3))
    return best_t, add, has.astype(jnp.int32)


def bounce_draws(smp, want_rr: bool):
    """The BSDF-sample and Russian-roulette draws of one bounce, in the
    unfused integrators' order (path.py:150-162 / direct.py:104-106).
    Returns ((u_lobe, u0, u1, u_rr), smp)."""
    u_lobe, smp = smp.next1()
    (u0, u1), smp = smp._next2_xy()
    if want_rr:
        u_rr, smp = smp.next1()
    else:
        u_rr = jnp.zeros_like(u_lobe)
    return (u_lobe, u0, u1, u_rr), smp
