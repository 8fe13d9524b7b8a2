"""Fused Pallas bounce megakernels for the path/direct integrators.

The TPU answer to the reference's one-megakernel-per-frame architecture
(/root/reference/integrator.py:8-30): instead of a chain of XLA ops with
relayout/fusion barriers at every (N, 3) intermediate, one path bounce is

    kernel1 (trace_closest + surface_interact + emitter MIS)   [pallas]
      -> glue: quad-packed material gather, envmap miss MIS,
         sampler draws, NEE light selection (mesh/point/env)   [XLA planes]
    kernel2 (shadow trace + GGX shade/sample + Russian
             roulette; optional PRB gradient taps)             [pallas]

with every per-lane quantity living as (rows, 128) f32/i32/u32 *planes*
(struct-of-arrays) — never as an (N, 3) array whose minor axis pads to 128
lanes. The triangle scene is VMEM-resident per grid step as a column-packed
(T_pad, 32) table, swept with fori_loops exactly like accel/pallas_trace.py.
Everything *divergence-free but gather-heavy* (sampler tables, light tables,
alias tables, the envmap texture) lives in the XLA glue between the kernels
(integrators/fused_glue.py), which is what makes environment maps, point
lights and the table-based samplers (pmj02bn / corrmj) fused-capable: the
kernels only ever see per-lane planes.

Scope (the wrapper falls back to the unfused walk otherwise):
  * dense scenes (T <= FUSED_MAX_TRIS)
  * path or direct integrator

Math parity: every formula is the same jnp expression as the unfused path
(path.py / lights.py / microfacet.py / onb.py / texture.py), consuming the
identical sampler stream, so fused and unfused renders agree to float
tolerance (tests/test_fused.py); they are not bitwise equal because Mosaic
schedules transcendentals differently than XLA.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..samplers.hashes import U32
from .path import SPECULAR

# 512-wide ray rows: the MXU sweeps' per-tile dots are K=4 latency-bound,
# so widening the rhs from (4, 256) to (4, 1024) amortizes matmul issue and
# loop overhead at identical flops. Measured (v5e-1, 962 tris, 262k rays):
# closest 9.99 -> 7.85 ms, shadow 9.81 -> 8.06 ms vs the 128-lane rows;
# 1024-wide fails to compile (tile x lane intermediates past the vreg
# budget) — tools/profile_wide.py holds the sweep.
LANES = 512
# 32 rows x 512 lanes per grid step (same 16k-ray block as the previous
# 128x128): the backward shade kernel carries ~57 ray planes; at 2x this
# block their double-buffered VMEM footprint sits at the 16 MB edge
# (observed compile OOM by 0.9 MB on a variant build)
BLOCK_ROWS = 32
# Scene-table VMEM budget: the column-packed table is 128 B/triangle
# ((T_pad, 32) f32), so 16k triangles = 2 MB alongside ~4 MB of
# double-buffered ray planes in the backward shade kernel. Matches
# accel.build.AUTO_BVH_THRESHOLD, so every dense-sweep-routed scene is
# also fused-capable (round-2 left a 2048..20480 gap where mesh-light
# scenes got neither fused bounces nor a BVH — VERDICT r2 item 5).
FUSED_MAX_TRIS = 16384
_PI = math.pi


class FusedMeta(NamedTuple):
    """Static light-structure metadata (python ints/tuples: part of the jit
    cache key). Built by Scene from host-side emission data; update_lights /
    add_envmap / add_point_light that change the light STRUCTURE rebuild it
    (recompile); pure emission-value changes do not."""

    n_lights: int  # number of mesh light instances
    light_tri_ids: Tuple[int, ...]  # global tri ids of all light triangles
    light_offsets: Tuple[int, ...]  # per light instance: first index above
    light_tcs: Tuple[int, ...]  # per light instance: triangle count
    num_tris: int
    n_env: int = 0  # 0 or 1 environment lights
    n_point: int = 0  # point light count

    @property
    def n_total(self) -> int:
        """Light-selection denominator (lights._n_lights parity)."""
        return max(self.n_env + self.n_point + self.n_lights, 1)


# ----------------------------------------------------------- vec3 helpers
# component-tuple math on (B, 128) arrays inside kernels


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _vnormalize(a, eps=1e-20):
    inv = 1.0 / jnp.maximum(jnp.sqrt(_vdot(a, a)), eps)
    return _vscale(a, inv)


def _vwhere(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


# ------------------------------------------------------------------- GGX
# identical formulas to microfacet.py, componentized; directions are local
# frames (z = normal)


def _ggx_distribution(hz, alpha):
    a2 = alpha * alpha
    nh = jnp.maximum(1e-5, hz)
    denom = nh * nh * (a2 - 1.0) + 1.0
    return a2 / (_PI * denom * denom)


def _smith_geometry(vz, alpha):
    a2 = alpha * alpha
    nv = jnp.maximum(1e-5, vz)
    nv2 = nv * nv
    return 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * (1.0 - nv2) / nv2))


def _ggx_brdf(wo, wi, dif, roughness):
    """brdf * cos(wi) -> rgb tuple (microfacet.py:43-59)."""
    alpha = roughness * roughness
    h = _vnormalize(_vadd(wi, wo))
    d = _ggx_distribution(h[2], alpha)
    cos_wh = jnp.clip(_vdot(wo, h), 1e-5, 1.0)
    one_m = 1.0 - cos_wh
    f = SPECULAR + (1.0 - SPECULAR) * (one_m * one_m * one_m * one_m * one_m)
    g = _smith_geometry(wi[2], alpha) * _smith_geometry(wo[2], alpha)
    wiz = jnp.maximum(1e-5, wi[2])
    woz = jnp.maximum(1e-5, wo[2])
    spec = (d * f * g) / (4.0 * wiz * woz)
    return (
        (spec + dif[0] / _PI) * wi[2],
        (spec + dif[1] / _PI) * wi[2],
        (spec + dif[2] / _PI) * wi[2],
    )


def _sample_wm(w, alpha, u0, u1):
    """pbrt-v4 VNDF (microfacet.py:75-102), componentized."""
    wh = _vnormalize((alpha * w[0], alpha * w[1], w[2]))
    neg = wh[2] < 0.0
    wh = _vwhere(neg, _vscale(wh, -1.0), wh)
    zero = jnp.zeros_like(wh[0])
    t1g = _vnormalize((-wh[1], wh[0], zero))
    t1 = _vwhere(wh[2] < 0.99999, t1g, (zero + 1.0, zero, zero))
    t2 = _vcross(wh, t1)
    r = jnp.sqrt(u0)
    theta = 2.0 * _PI * u1
    px = r * jnp.cos(theta)
    py = r * jnp.sin(theta)
    h = jnp.sqrt(jnp.maximum(1.0 - px * px, 0.0))
    py = h + (py - h) * ((1.0 + wh[2]) / 2.0)
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - px * px - py * py))
    nh = _vadd(_vadd(_vscale(t1, px), _vscale(t2, py)), _vscale(wh, pz))
    return _vnormalize((alpha * nh[0], alpha * nh[1], jnp.maximum(1e-6, nh[2])))


def _pdf_wm(w, wm, alpha):
    return (
        _smith_geometry(w[2], alpha)
        / jnp.maximum(jnp.abs(w[2]), 1e-9)
        * _ggx_distribution(wm[2], alpha)
        * jnp.abs(_vdot(w, wm))
    )


def _ggx_sample(wo, roughness, u_lobe, u0, u1):
    """50/50 cosine + VNDF mixture (microfacet.py:114-130)."""
    r = jnp.sqrt(u0)
    phi = 2.0 * _PI * u1
    dif_wi = (r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(1.0 - u0, 0.0)))
    alpha = roughness * roughness
    wm = _sample_wm(wo, alpha, u0, u1)
    neg_wo = _vscale(wo, -1.0)
    glossy_wi = _vsub(neg_wo, _vscale(wm, 2.0 * _vdot(neg_wo, wm)))
    return _vwhere(u_lobe < 0.5, dif_wi, glossy_wi)


def _ggx_sample_pdf(wo, wi, roughness):
    alpha = roughness * roughness
    wm = _vnormalize(_vadd(wi, wo))
    diffuse_pdf = wi[2] / _PI
    glossy_pdf = _pdf_wm(wo, wm, alpha) / (
        4.0 * jnp.maximum(jnp.abs(_vdot(wo, wm)), 1e-9)
    )
    return 0.5 * diffuse_pdf + 0.5 * glossy_pdf


def _make_onb(n):
    """onb.py:36-47 componentized -> (tangent, binormal) tuples."""
    cond = jnp.abs(n[0]) > jnp.abs(n[2])
    zero = jnp.zeros_like(n[0])
    b = _vwhere(cond, (-n[1], n[0], zero), (zero, -n[2], n[1]))
    b = _vnormalize(b)
    t = _vnormalize(_vcross(b, n))
    return t, b


def _to_local(t, b, n, v):
    return (_vdot(v, t), _vdot(v, b), _vdot(v, n))


def _to_world(t, b, n, v):
    return (
        v[0] * t[0] + v[1] * b[0] + v[2] * n[0],
        v[0] * t[1] + v[1] * b[1] + v[2] * n[1],
        v[0] * t[2] + v[1] * b[2] + v[2] * n[2],
    )


# --------------------------------------------------- scene plane building


def build_fused_const(data, meta: FusedMeta):
    """Per-triangle / per-light-tri plane arrays from traced SceneData.

    All outputs are loop-invariant functions of scene arrays, so XLA hoists
    their construction out of the bounce while_loop."""
    g = data.geom
    tri = g.triangles  # (T, 3)
    i0, i1, i2 = tri[:, 0], tri[:, 1], tri[:, 2]
    p0 = g.positions[i0]
    p1 = g.positions[i1]
    p2 = g.positions[i2]
    e1 = p1 - p0
    e2 = p2 - p0
    uv0 = g.uvs[i0]
    du1 = g.uvs[i1] - uv0
    du2 = g.uvs[i2] - uv0
    n0 = g.normals[i0]
    dn1 = g.normals[i1] - n0
    dn2 = g.normals[i2] - n0
    c = jnp.cross(e1, e2)
    ng = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-20)
    area = 0.5 * jnp.linalg.norm(c, axis=-1)
    inst = g.tri_inst
    em = data.emission[inst]  # (T, 3)
    emissive = jnp.any(em > 0.0, axis=-1).astype(jnp.float32)
    tc = g.inst_tri_count[inst].astype(jnp.float32)
    # selection count n = env + point + mesh (lights._n_lights parity)
    n_total = jnp.float32(meta.n_total)
    # denominator of sample_light_pdf (lights.py:158): n * tc * area
    inv_pdf_const = n_total * tc * area

    del emissive  # kernel derives the flag from the emission columns
    # ONE (T_pad, 32) column-packed scene table: cols 0-8 tri (p0/e1/e2),
    # 9-14 uv (uv0/du1/du2), 15-23 normals (n0/dn1/dn2), 24-26 ng, 27-29
    # emission, 30 pdf const. Per-component (T, 1) planes tile their
    # single-lane axis up to 128 VMEM lanes (4.6 KB/tri — kernel1 OOMed at
    # ~950 triangles); column packing is 128 B/tri, with the dynamic scalar
    # index on the sublane axis as Mosaic requires.
    packed = jnp.concatenate(
        [
            a.astype(jnp.float32)
            for a in (p0, e1, e2, uv0, du1, du2, n0, dn1, dn2, ng, em,
                      inv_pdf_const[:, None])
        ],
        axis=1,
    )  # (T, 31)
    t_n = packed.shape[0]
    t_pad = -(-t_n // 8) * 8
    scene_pack = jnp.pad(packed, ((0, t_pad - t_n), (0, 32 - packed.shape[1])))

    # light-triangle table, in meta order (gathered per-lane by the glue's
    # NEE selection — no longer a kernel operand)
    if len(meta.light_tri_ids) == 0:
        return scene_pack, jnp.zeros((8, 25), jnp.float32)
    lids = jnp.asarray(meta.light_tri_ids, jnp.int32)
    lv0 = p0[lids]
    le1 = e1[lids]
    le2 = e2[lids]
    lem = data.emission[inst[lids]]
    lc = jnp.cross(le1, le2)
    l_ng = lc / jnp.maximum(jnp.linalg.norm(lc, axis=-1, keepdims=True), 1e-20)
    l_area = 0.5 * jnp.linalg.norm(lc, axis=-1)
    l_tc = g.inst_tri_count[inst[lids]].astype(jnp.float32)
    l_inv_pdf = n_total * l_tc * l_area  # lights.py:105-107 denominator
    lcols = jnp.concatenate(
        [lv0, le1, le2, lem, l_ng, l_inv_pdf[:, None],
         # cols 16:25 — light-tri vertex normals (n0/dn1/dn2): the
         # streamed direct integrator's emissive-first bounce lookup
         # interpolates the shading normal for the frontfacing test
         # (emitter-epilogue parity); NEE glue reads cols 0:16 only
         n0[lids], dn1[lids], dn2[lids]], axis=1
    ).astype(jnp.float32)  # (L, 25)
    l_n = lcols.shape[0]
    l_pad = -(-l_n // 8) * 8
    light_pack = jnp.pad(lcols, ((0, l_pad - l_n), (0, 0)))
    return scene_pack, light_pack


# ----------------------------------------------- MXU (Woop) trace tables

# triangles per MXU sweep tile. At 512-wide ray rows, 128 measured best
# (tools/profile_wide.py, 962 tris/262k rays: closest 7.85 ms at tile 128
# vs 10.00 at tile 512) — finer tiles cull more and their (tile, lanes)
# transform transients stay at 256 KB; the wide rhs already amortizes the
# per-dot latency that used to favor coarse tiles.
MXU_TILE = 128
# dense sweeps at or above this triangle count route to the MXU kernel;
# below it the per-triangle fori_loop wins (measured: the Woop matmul
# formulation pays ~fixed per-row-group matmul latency that tiny scenes
# don't amortize)
MXU_MIN_TRIS = 256


def _gat_rows():
    # 12 woop rows + 4 pad + 32-row gather block (8-aligned at row 16):
    #   16:25 p0/e1/e2, 25:32 [ng3 em3 inv_pdfc], 32:47 [uv0 du1 du2 n0
    #   dn1 dn2], 47:48 pad. Emitter attrs lead so the lite (bounce
    #   emitter-lookup) gather stops at row 32.
    return 48


GAT_GATHER_LO = 16  # gather-block start row (8-aligned sublane slice)


def build_woop_pack(scene_pack, tile=None):
    """Woop-transform tables for the MXU dense sweep.

    The ray-triangle test is an affine change of basis: with M = inv([e1 e2
    n]) (rows ru/rv/rw), o' = M o - M p0 and d' = M d give t = -o'_w / d'_w,
    u = o'_u + t d'_u, v = o'_v + t d'_v — i.e. for ALL triangles at once,
    o' and d' are ONE matmul of the ray against a (4, 3T) table. That turns
    the per-triangle scalar-broadcast fori sweep (~67 VPU ops/pair incl.
    the attribute select sweep) into MXU work + a ~17 op/pair epilogue.

    Returns (gat, boxes, t_pad, tile):
      gat: (48, t_pad) f32 — rows 0:4/4:8/8:12 = the u/v/w woop rows
           [M_r | -M_r p0] stored TRANSPOSED (the sweep contracts them
           with (4, L) ray vectors via transposed dots — a dense layout;
           a (3T, 4) minor-axis-4 table would pad to 128 lanes in VMEM,
           32x bloat and certain OOM past ~4k tris); rows 16:48 = the
           winner-gather block (_gat_rows layout: tri verts, then
           emitter attrs, then interaction attrs), fetched per-ray by a
           one-hot bf16x2 matmul; the winner's t/u/v are re-derived by
           exact f32 Möller-Trumbore on the VPU from the gathered
           p0/e1/e2 (subtraction before products — no cancellation).
      boxes: (max(n_tiles, 8), 8) f32 — per-tile AABB [lo3 | hi3 | 0 0]
           over the tile's non-degenerate triangles (sublane-axis layout
           for in-kernel scalar reads). The sweep slab-tests each tile
           and lax.cond-skips tiles no active lane can hit.
    All outputs are loop-invariant functions of the scene arrays, so XLA
    hoists their construction out of bounce loops."""
    t_n = scene_pack.shape[0]
    p0 = scene_pack[:, 0:3]
    e1 = scene_pack[:, 3:6]
    e2 = scene_pack[:, 6:9]
    n = jnp.cross(e1, e2)
    det = jnp.sum(n * n, axis=-1)  # det([e1 e2 n]) = |n|^2
    inv_det = jnp.where(det > 1e-24, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    ru = jnp.cross(e2, n) * inv_det[:, None]
    rv = jnp.cross(n, e1) * inv_det[:, None]
    rw = n * inv_det[:, None]

    def aug(r):  # (T, 3) row -> (T, 4) [r | -r.p0]
        return jnp.concatenate([r, -jnp.sum(r * p0, axis=-1, keepdims=True)], axis=1)

    bu_, bv_, bw_ = aug(ru), aug(rv), aug(rw)
    if tile is None:
        # quantize to 128 (the VMEM lane width for the gat table's minor
        # axis), independent of the ray-row LANES width
        tile = min(MXU_TILE, -(-t_n // 128) * 128)
    t_pad = -(-t_n // tile) * tile
    pad = ((0, t_pad - t_n), (0, 0))
    bu_, bv_, bw_ = (jnp.pad(a, pad) for a in (bu_, bv_, bw_))
    verts = jnp.pad(scene_pack[:, 0:9], pad).T  # (9, t_pad) p0/e1/e2
    emit = jnp.pad(scene_pack[:, 24:31], pad).T  # (7, t_pad) ng/em/pdfc
    attr = jnp.pad(scene_pack[:, 9:24], pad).T  # (15, t_pad) uv/normals
    gat = jnp.concatenate(
        [
            jnp.concatenate([a.T for a in (bu_, bv_, bw_)], axis=0),  # (12, t_pad)
            jnp.zeros((GAT_GATHER_LO - 12, t_pad), jnp.float32),
            verts,
            emit,
            attr,
            jnp.zeros((_gat_rows() - GAT_GATHER_LO - 31, t_pad), jnp.float32),
        ],
        axis=0,
    )
    # per-tile AABBs; degenerate rows (zero-padded / zero-area) must not
    # contribute (their p0=0 corner would wrongly grow a tile's box)
    valid = det > 1e-24
    corners = jnp.stack([p0, p0 + e1, p0 + e2], axis=1)  # (T, 3, 3)
    lo = jnp.where(valid[:, None], corners.min(axis=1), 1e30)
    hi = jnp.where(valid[:, None], corners.max(axis=1), -1e30)
    lo = jnp.pad(lo, pad, constant_values=1e30)
    hi = jnp.pad(hi, pad, constant_values=-1e30)
    n_tiles = t_pad // tile
    boxes = jnp.zeros((max(n_tiles, 8), 8), jnp.float32)
    boxes = boxes.at[:n_tiles, 0:3].set(lo.reshape(n_tiles, tile, 3).min(1))
    boxes = boxes.at[:n_tiles, 3:6].set(hi.reshape(n_tiles, tile, 3).max(1))
    if n_tiles < 8:  # pad tiles: empty boxes, slab test always misses
        boxes = boxes.at[n_tiles:, 0:3].set(1e30)
        boxes = boxes.at[n_tiles:, 3:6].set(-1e30)
    return gat, boxes, t_pad, tile


# ------------------------------------------------------------- kernel 1


def _interact_epilogue(o, d, pdf_prev, active, best_t, bu, bv, miss, av):
    """Shared hit -> interaction/emitter-MIS math (any plane shape).
    av: the 22 attribute values (scene table cols 9..30). Returns the 16
    kernel-1 outputs in order."""
    (uv0x, uv0y, du1x, du1y, du2x, du2y,
     n0x, n0y, n0z, dn1x, dn1y, dn1z, dn2x, dn2y, dn2z,
     ngx, ngy, ngz, emr, emg, emb, inv_pdfc) = av

    # keep p finite on miss lanes (everything downstream is masked, but an
    # inf position would breed NaNs that jnp.where cannot mask in products)
    t_eff = jnp.where(miss, 1.0, best_t)
    p = _vadd(o, _vscale(d, t_eff))
    ux = uv0x + bu * du1x + bv * du2x
    uy = uv0y + bu * du1y + bv * du2y
    ns = _vnormalize((n0x + bu * dn1x + bv * dn2x,
                      n0y + bu * dn1y + bv * dn2y,
                      n0z + bu * dn1z + bv * dn2z))
    ng = (ngx, ngy, ngz)
    wo = _vscale(d, -1.0)
    frontfacing = (_vdot(wo, ng) >= 1e-4) & (_vdot(wo, ns) >= 1e-4)
    emissive = (emr > 0.0) | (emg > 0.0) | (emb > 0.0)

    # emitter-hit MIS vs carried bsdf pdf (path.py:107-110)
    cos_light = -_vdot(ng, d)
    sqr_dist = best_t * best_t
    pdf_hit = sqr_dist / jnp.maximum(inv_pdfc * cos_light, 1e-12)
    mis_hit = pdf_prev / jnp.maximum(pdf_prev + pdf_hit, 1e-4)
    emit_on = active & ~miss & frontfacing & emissive
    aer = jnp.where(emit_on, mis_hit * emr, 0.0)
    aeg = jnp.where(emit_on, mis_hit * emg, 0.0)
    aeb = jnp.where(emit_on, mis_hit * emb, 0.0)

    shade = active & ~miss & frontfacing & ~emissive
    return (
        p[0], p[1], p[2], ux, uy, ns[0], ns[1], ns[2], ng[0], ng[1], ng[2],
        shade.astype(jnp.int32), aer, aeg, aeb,
        (active & miss).astype(jnp.int32),
    )


def _trace_interact_kernel(n_tris: int, refs):
    scene_r = refs[0]  # (T_pad, 32) column-packed scene table
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, pdfp_r, act_r) = refs[1:9]
    outs = refs[9:]
    (px_o, py_o, pz_o, ux_o, uy_o, nsx_o, nsy_o, nsz_o, ngx_o, ngy_o, ngz_o,
     shade_o, aer_o, aeg_o, aeb_o, miss_o) = outs

    o = (ox_r[:], oy_r[:], oz_r[:])
    d = (dx_r[:], dy_r[:], dz_r[:])
    pdf_prev = pdfp_r[:]
    active = act_r[:] != 0

    # trace_closest uses t_min=0.0 (bounce rays start from an offset origin)
    t_min = jnp.zeros_like(o[0])

    def mt_body(ti, carry):
        best_t, best_u, best_v, best_prim = carry
        p0 = (scene_r[ti, 0], scene_r[ti, 1], scene_r[ti, 2])
        e1 = (scene_r[ti, 3], scene_r[ti, 4], scene_r[ti, 5])
        e2 = (scene_r[ti, 6], scene_r[ti, 7], scene_r[ti, 8])
        h = _vcross(d, e2)
        a = _vdot(e1, h)
        f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
        s = _vsub(o, p0)
        u = f * _vdot(s, h)
        q = _vcross(s, e1)
        v = f * _vdot(d, q)
        t = f * _vdot(e2, q)
        ok = (
            (jnp.abs(a) > 1e-12)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min) & (t < best_t)
        )
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
        best_prim = jnp.where(ok, ti, best_prim)
        best_t = jnp.where(ok, t, best_t)
        return best_t, best_u, best_v, best_prim

    init = (
        jnp.full_like(o[0], 1e30),
        jnp.zeros_like(o[0]),
        jnp.zeros_like(o[0]),
        jnp.full(o[0].shape, -1, jnp.int32),
    )
    best_t, bu, bv, prim = jax.lax.fori_loop(0, n_tris, mt_body, init)
    miss = prim < 0

    # second sweep: select the winning triangle's shading attributes
    def attr_body(ti, carry):
        m = prim == ti
        vals = [jnp.where(m, scene_r[ti, 9 + k], carry[k]) for k in range(22)]
        return tuple(vals)

    a0 = tuple(jnp.zeros_like(o[0]) for _ in range(22))
    av = jax.lax.fori_loop(0, n_tris, attr_body, a0)

    vals = _interact_epilogue(o, d, pdf_prev, active, best_t, bu, bv, miss, av)
    for ref, val in zip(outs, vals):
        ref[:] = val


# ---------------------------------------------------- kernel 1, MXU sweep


# f32 passes (value pass-through); see MXU_PRECISION for the sweep.

# Precision of the Woop sweep matmuls (o', d' tile products). The sweep
# only SELECTS the winning triangle / occlusion bit — the winner's t/u/v
# are re-derived exactly on the VPU from its woop rows — but secondary
# rays originate ON the surface (origin offset / t_min = 1e-4), where
# o'_w is a catastrophic cancellation of O(1) terms: 1-pass bf16
# (DEFAULT) noise ~4e-3 swamps the epsilon and self-occludes (measured
# image meandiff 0.18 — unusable). Mosaic lowers only DEFAULT and
# HIGHEST (6-pass f32), no HIGH; "comp" is a hand-rolled bf16x3: split
# both operands into exact-bf16 hi + residual lo and sum three DEFAULT
# passes (hi*hi + hi*lo + lo*hi), rel error ~3e-5 — inside the 1e-4
# epsilons with margin. Measured full-kernel times
# (tools/profile_mxu_variants.py, 962 tris x 262k rays, v5e): HIGHEST
# 19.0 ms / comp 14.8 / gat-backed transposed comp (this code) 14.1 /
# DEFAULT 9.7 vs fori 23.5 ms; render-level parity gated by
# tools/profile_mxu_accuracy.py. The env override exists for that
# tool's per-process sweeps, not for users.
MXU_PRECISION = os.environ.get("ZDR_MXU_PRECISION", "comp")


def _sweep_dot(b, aug, prec=None):
    """(4, tile) transposed woop rows x (4, L) aug vectors -> (tile, L)
    at precision `prec` (None = MXU_PRECISION). Interpret-mode callers
    force "highest" — CPU dots are f32-exact anyway, so CI stays
    bit-meaningful while the TPU path pays only for comp."""
    prec = MXU_PRECISION if prec is None else prec
    dims = (((0,), (0,)), ((), ()))
    f32 = jnp.float32
    if prec == "comp":
        bh = b.astype(jnp.bfloat16).astype(f32)
        ah = aug.astype(jnp.bfloat16).astype(f32)
        bl, al = b - bh, aug - ah

        def dd(x, y):
            return jax.lax.dot_general(
                x, y, dims, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=f32,
            )

        return dd(bh, ah) + dd(bh, al) + dd(bl, ah)
    lax_prec = {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[prec]
    return jax.lax.dot_general(
        b, aug, dims, precision=lax_prec, preferred_element_type=f32
    )


def _mxu_rowdot(brows, aug):
    """(4, L) woop rows  x  (4, L) per-lane aug vectors -> (1, L)."""
    return jnp.sum(brows * aug, axis=0, keepdims=True)


def _tile_uv_t(gat_r, tile, ti, od, N, prec, t_lo):
    """Woop sweep of ONE triangle tile against a 2N-stacked [o|d] rhs.
    Returns (ok (tile, N) bool, tq (tile, N) f32) — the shared inner body
    of _mxu_sweep_row and the streamed worklist kernels.

    NOTE (round 5): stacking the u/v/w row-sets along the tile axis so
    each precision pass is ONE (4, 3*tile) matmul instead of three (the
    K=4 dots are issue-latency-bound; per-tile cost measures ~7x the
    FLOP+VPU floor) is blocked by a Mosaic limitation: concatenating VMEM
    slices taken at different row offsets fails to lower ("result/input
    offset mismatch on non-concat dimension"), including via +0.0 copies.
    A tile-grouped (4, 3*t_pad) side table would need new ref plumbing
    through every sweep kernel — left for a future round."""
    ts = pl.ds(ti * tile, tile)
    ouv = _sweep_dot(gat_r[0:4, ts], od, prec)  # (tile, 2N)
    ovv = _sweep_dot(gat_r[4:8, ts], od, prec)
    oww = _sweep_dot(gat_r[8:12, ts], od, prec)
    ou, du = ouv[:, :N], ouv[:, N:]
    ov, dv = ovv[:, :N], ovv[:, N:]
    ow, dw = oww[:, :N], oww[:, N:]
    tq = -ow / dw  # inf/NaN on dw==0 lanes: rejected by the checks below
    u = ou + tq * du
    v = ov + tq * dv
    ok = (
        (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (tq > t_lo) & (tq < 1e30)
    )
    return ok, tq


def _key_t_upper(best_key):
    """Per-lane upper bound on the true best t from a packed argmin key.

    key = (t_bits & ~0x1FF) | idx truncates t's low 9 mantissa bits, so the
    winner's true t_bits <= (key & ~0x1FF) | 0x1FF; bitcasting that back is
    an f32 >= the true best t. A tile whose slab entry tmin exceeds this
    bound can only contain candidates with key STRICTLY above best_key
    (their truncated t_bits >= (key & ~0x1FF) + 0x200), so culling it is
    bit-exact. No-hit lanes (key = +inf bits) produce a NaN bound; callers
    compare with `~(tmin > bound)` so NaN disables the cull on those lanes.
    """
    return jax.lax.bitcast_convert_type(
        best_key | jnp.int32(0x1FF), jnp.float32
    )


def _mxu_sweep_row(gat_r, box_r, tile, n_tiles, o_aug, d_aug, t_lo, t_hi,
                   mode, prec=None, active=None, raw=False, seed_key=None):
    """Woop sweep of one 128-lane ray row against all triangle tiles,
    reading the transposed u/v/w woop rows from the dense gat table.
    [o_aug | d_aug] are N-stacked into ONE rhs so each tile costs 3
    comp-precision dot sets instead of 6. Each tile is slab-tested
    against its AABB (box_r) first and skipped via lax.cond when no
    active lane can hit it — for coherent rows (primaries, shadow rays
    toward one light, fully-missed rows) most tiles never run. The slab
    test is additionally t-capped: in 'closest' mode by the running best
    key (a tile whose slab entry lies beyond every lane's current-best t
    upper bound cannot change any winner — a bit-exact cull, see
    _key_t_upper), in 'any' mode by the per-lane max distance t_hi
    (occluders past the light cannot occlude).

    mode 'closest': returns (miss (1,L) bool, prim (1,L) i32). The
    per-tile argmin packs the within-tile index into the low 9 mantissa
    bits of the order-preserving int32 bit pattern of t (positive-f32
    bitcast is monotone), so ONE i32 min replaces the t-min / eq /
    where-iota / idx-min chain. Tie-breaking stays first-index (lower
    idx = lower key at equal truncated t; earlier tile wins via strict
    <). t resolution drops to 2^-14 relative — the same order as the
    comp sweep's own 1.6e-5 noise, and the winner's t is re-derived
    exactly afterwards (_mxu_trace_kernel), so only near-coplanar
    winner flips are affected. `seed_key` (closest mode, optional (1,L)
    i32) pre-loads the carry with a best key found by an EARLIER sweep
    over other triangles (the HBM-streamed chunk loop): hits from
    previous chunks then t-cull this chunk's tiles; the returned kmin
    equals seed_key wherever nothing closer was found.
    mode 'any': t_hi is a (1, L) per-lane max distance; returns occluded
    (1, L) bool; exits early once every active lane is occluded."""
    o = (o_aug[0:1], o_aug[1:2], o_aug[2:3])
    d = (d_aug[0:1], d_aug[1:2], d_aug[2:3])
    inv = tuple(1.0 / jnp.where(c == 0.0, 1e-20, c) for c in d)
    od = jnp.concatenate([o_aug, d_aug], axis=1)  # (4, 2N)
    N = o_aug.shape[1]

    def tile_need(ti, extra_mask, t_cap=None):
        t0 = tuple((box_r[ti, k] - o[k]) * inv[k] for k in range(3))
        t1 = tuple((box_r[ti, 3 + k] - o[k]) * inv[k] for k in range(3))
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t0[0], t1[0]), jnp.minimum(t0[1], t1[1])),
            jnp.maximum(jnp.minimum(t0[2], t1[2]), 0.0),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t0[0], t1[0]), jnp.maximum(t0[1], t1[1])),
            jnp.maximum(t0[2], t1[2]),
        )
        hit = tmin <= tmax
        if t_cap is not None:
            # NaN-safe: t_cap is NaN on no-hit-yet lanes (+inf key | 0x1FF),
            # where `tmin > NaN` is False and the lane stays uncullable
            hit = hit & ~(tmin > t_cap)
        if active is not None:
            hit = hit & active
        if extra_mask is not None:
            hit = hit & extra_mask
        return jnp.any(hit)

    big_i = jnp.int32(0x7F800000)  # +inf bit pattern: above every real key

    def tile_uv_t(ti):
        return _tile_uv_t(gat_r, tile, ti, od, N, prec, t_lo)

    def sweep_tile(ti, carry):
        ok, tq = tile_uv_t(ti)
        if mode == "any":
            occ = carry  # (1, N) i32 — Mosaic can't legalize i1-vector
            # results on scf.if, so the carry stays int
            hit = ok & (tq < t_hi)  # t_hi broadcasts (1, N)
            return occ | jnp.any(hit, axis=0, keepdims=True).astype(jnp.int32)
        best_key, best_tile = carry
        t_bits = jax.lax.bitcast_convert_type(tq, jnp.int32)
        idx = jax.lax.broadcasted_iota(jnp.int32, ok.shape, 0)
        key = jnp.where(ok, (t_bits & jnp.int32(~0x1FF)) | idx, big_i)
        kmin = jnp.min(key, axis=0, keepdims=True)  # (1, N)
        better = kmin < best_key
        return (
            jnp.where(better, kmin, best_key),
            jnp.where(better, jnp.int32(ti), best_tile),
        )

    if mode == "any":
        # while-loop: stop as soon as every active lane is occluded
        def w_cond(state):
            ti, occ = state
            open_ = occ == 0 if active is None else (active & (occ == 0))
            return (ti < n_tiles) & jnp.any(open_)

        def w_body(state):
            ti, occ = state
            occ = jax.lax.cond(
                tile_need(ti, occ == 0, t_hi),
                lambda c: sweep_tile(ti, c),
                lambda c: c,
                occ,
            )
            return ti + 1, occ

        _, occ = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), jnp.zeros((1, N), jnp.int32))
        )
        return occ != 0

    init = (
        jnp.full((1, N), big_i, jnp.int32) if seed_key is None else seed_key,
        jnp.zeros((1, N), jnp.int32),
    )

    def tile_body(ti, carry):
        return jax.lax.cond(
            tile_need(ti, None, _key_t_upper(carry[0])),
            lambda c: sweep_tile(ti, c),
            lambda c: c,
            carry,
        )

    kmin, btile = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    if raw:
        # (packed key, winning tile) for callers that merge across calls
        # (the HBM-streamed chunk sweep, pallas_stream.py)
        return kmin, btile
    miss = kmin == big_i
    prim = jnp.where(miss, 0, btile * tile + (kmin & 0x1FF))
    return miss, prim


def _mxu_gather_rows(gat_r, row_lo, row_hi, tile, n_tiles, prim, miss):
    """One-hot gather of gat rows [row_lo:row_hi] of the winner's column
    -> (row_hi - row_lo, N), as TWO DEFAULT-precision passes over a hi/lo
    bf16 split of the values: the one-hot lhs is exact in bf16 and each
    K-column contributes at most one nonzero, so the reconstruction error
    is ~4e-6 relative (2nd-order bf16 rounding) — vs 6 HIGHEST passes for
    bitwise f32. Exact-critical quantities (t/u/v) are NOT taken from
    here; they're re-derived by f32 Möller-Trumbore on the gathered
    p0/e1/e2 where the o - p0 recentering cancels the magnitude.
    Tiles that contain no lane's winner are lax.cond-skipped."""
    f32 = jnp.float32
    n_rows = row_hi - row_lo
    N = prim.shape[1]

    def tile_body(ti, acc):
        rel = prim - ti * tile  # (1, N)
        ohi = jax.lax.broadcasted_iota(jnp.int32, (tile, N), 0)
        oh = (ohi == rel).astype(f32)  # (tile, N)
        gt = gat_r[row_lo:row_hi, pl.ds(ti * tile, tile)]
        gh = gt.astype(jnp.bfloat16).astype(f32)
        gl = gt - gh

        def dd(x):
            return jax.lax.dot_general(
                x, oh, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=f32,
            )

        return acc + dd(gh) + dd(gl)

    def tile_need(ti):
        return jnp.any((prim >= ti * tile) & (prim < (ti + 1) * tile) & ~miss)

    def body(ti, acc):
        return jax.lax.cond(tile_need(ti), lambda a: tile_body(ti, a),
                            lambda a: a, acc)

    gat = jax.lax.fori_loop(0, n_tiles, body, jnp.zeros((n_rows, N), f32))
    return jnp.where(miss, 0.0, gat)


def _mt_rederive(gat, o, d, miss):
    """Exact f32 Möller-Trumbore of the winner: gat rows 0:9 are its
    p0/e1/e2 (gather-block layout). The s = o - p0 recentering happens
    BEFORE any product, so there is no large-magnitude cancellation —
    this is the same arithmetic the fori sweep and the unfused
    accel.trace path use. Returns (t, u, v)."""
    p0 = (gat[0:1], gat[1:2], gat[2:3])
    e1 = (gat[3:4], gat[4:5], gat[5:6])
    e2 = (gat[6:7], gat[7:8], gat[8:9])
    h = _vcross(d, e2)
    a = _vdot(e1, h)
    f = 1.0 / jnp.where(a == 0.0, 1.0, a)
    s = _vsub(o, p0)
    u = f * _vdot(s, h)
    q = _vcross(s, e1)
    v = f * _vdot(d, q)
    t = f * _vdot(e2, q)
    t = jnp.where(miss | (a == 0.0), 1.0, t)
    return t, u, v


def _emitter_epilogue(gat, d, t_win, bu, bv, pdf_prev, active, miss):
    """MIS-weighted emission of the sweep winner (the direct integrator's
    bounce emitter lookup — _interact_epilogue's add_emit branch exactly,
    incl. the shading-normal front test, reference direct.py:111). `gat`
    is the gathered winner block (rows rel. GAT_GATHER_LO: 0:9 p0/e1/e2,
    9:12 ng, 12:15 em, 15:16 inv_pdfc, 22:31 n0/dn1/dn2). Returns
    (add_emit_r, add_emit_g, add_emit_b, miss_i32)."""
    ng = (gat[9:10], gat[10:11], gat[11:12])
    emr, emg, emb = gat[12:13], gat[13:14], gat[14:15]
    inv_pdfc = gat[15:16]
    ns = _vnormalize((
        gat[22:23] + bu * gat[25:26] + bv * gat[28:29],
        gat[23:24] + bu * gat[26:27] + bv * gat[29:30],
        gat[24:25] + bu * gat[27:28] + bv * gat[30:31],
    ))
    wo = _vscale(d, -1.0)
    cos_light = -_vdot(ng, d)
    frontfacing = (cos_light >= 1e-4) & (_vdot(wo, ns) >= 1e-4)
    emissive = (emr > 0.0) | (emg > 0.0) | (emb > 0.0)
    pdf_hit = t_win * t_win / jnp.maximum(inv_pdfc * cos_light, 1e-12)
    mis_hit = pdf_prev / jnp.maximum(pdf_prev + pdf_hit, 1e-4)
    on = active & ~miss & frontfacing & emissive
    return (
        jnp.where(on, mis_hit * emr, 0.0),
        jnp.where(on, mis_hit * emg, 0.0),
        jnp.where(on, mis_hit * emb, 0.0),
        (active & miss).astype(jnp.int32),
    )


def _mxu_trace_kernel(t_pad: int, tile: int, prec: str, lite: bool, refs):
    """MXU kernel 1: Woop-transform sweep + one-hot winner gather + MT
    re-derivation. Full mode: same outputs as _trace_interact_kernel.
    Lite mode (the direct integrator's bounce emitter lookup): gathers
    only p0/e1/e2 + the emitter block and writes 4 planes (add_emit3,
    miss) — the only kernel-1 outputs that estimator consumes."""
    gat_r, box_r = refs[0], refs[1]
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, pdfp_r, act_r) = refs[2:10]
    outs = refs[10:]
    n_tiles = t_pad // tile
    rows = ox_r.shape[0]
    f32 = jnp.float32
    ones = jnp.ones((1, LANES), f32)
    zeros = jnp.zeros((1, LANES), f32)

    def group(g, _):
        sl = pl.ds(g, 1)
        o = (ox_r[sl, :], oy_r[sl, :], oz_r[sl, :])
        d = (dx_r[sl, :], dy_r[sl, :], dz_r[sl, :])
        o_aug = jnp.concatenate([*o, ones], axis=0)  # (4, L)
        d_aug = jnp.concatenate([*d, zeros], axis=0)
        active = act_r[sl, :] != 0
        miss, prim = _mxu_sweep_row(
            gat_r, box_r, tile, n_tiles, o_aug, d_aug, 0.0, None, "closest",
            prec=prec, active=active,
        )
        gat = _mxu_gather_rows(
            gat_r, GAT_GATHER_LO, _gat_rows(), tile, n_tiles, prim, miss
        )
        t_win, bu, bv = _mt_rederive(gat, o, d, miss)
        pdf_prev = pdfp_r[sl, :]
        if lite:
            vals = _emitter_epilogue(
                gat, d, t_win, bu, bv, pdf_prev, active, miss
            )
        else:
            # gather-block attr order -> _interact_epilogue's av order
            # (uv0 du1 du2 n0 dn1 dn2 | ng em inv_pdfc): attrs at block
            # rows 16:31, emitter block at rows 9:16
            av = tuple(gat[16 + k: 17 + k] for k in range(15)) + tuple(
                gat[9 + k: 10 + k] for k in range(7)
            )
            vals = _interact_epilogue(
                o, d, pdf_prev, active,
                jnp.where(miss, 1e30, t_win), bu, bv, miss, av,
            )
        for ref, val in zip(outs, vals):
            ref[sl, :] = val
        return 0

    jax.lax.fori_loop(0, rows, group, 0)


# ------------------------------------------------------------- kernel 2


def _shade_kernel(
    n_tris: int,
    rr_depth: int,
    max_depth: int,
    tex_h: int,
    tex_w: int,
    want_grad: bool,
    refs,
    mxu=None,
    has_occ: bool = False,
    want_occ: bool = False,
    bounce_emit: bool = False,
    n_light_tris: int = 0,
):
    """Shadow sweep + GGX shade/sample + RR (+ PRB gradient taps).

    Light selection and every sampler draw happen in the XLA glue
    (fused_glue.py) and arrive as planes: wi_l/l_dist/l_pdf/l_eval are the
    already-selected NEE light sample (mesh, point or envmap — the kernel
    is agnostic), u_* are this bounce's uniform draws. With mxu=(t_pad,
    tile, prec), refs[0] is the gat table and the shadow sweep runs on the
    MXU.

    bounce_emit (the direct integrator's merged mode, no-env scenes only):
    the bounce ray's MIS-weighted emitter lookup — a separate lite kernel-1
    pass otherwise — runs in-kernel as a second closest-hit MXU sweep, so
    the radiance outputs carry the COMPLETE direct-sample radiance and the
    gradient taps compute their continuation adjoint (beta_next * emitter
    radiance) without any le_rem input: one shade pass replaces the
    forward-replay + emitter-trace + gradient-pass chain of the split
    backward. Requires mxu and not has_occ/want_occ."""
    scene_r = refs[0]  # (T_pad, 32) cols 0-8 tri p0/e1/e2; gat table if mxu
    idx = 1
    box_r = None
    lp_r = None
    if mxu is not None and not has_occ:
        box_r = refs[1]  # per-tile AABBs for sweep culling
        idx = 2
        if bounce_emit:
            lp_r = refs[2]  # (L_pad, 25) light-triangle rows
            idx = 3
    (px_r, py_r, pz_r, nsx_r, nsy_r, nsz_r, ngx_r, ngy_r, ngz_r,
     dx_r, dy_r, dz_r, shade_r, m0_r, m1_r, m2_r, m3_r,
     br_r, bg_r, bb_r, depth_r, aer_r, aeg_r, aeb_r) = refs[idx : idx + 24]
    idx += 24
    (lwx_r, lwy_r, lwz_r, ldist_r, lpdf_r, levr_r, levg_r, levb_r,
     ulobe_r, ub0_r, ub1_r, urr_r) = refs[idx : idx + 12]
    idx += 12
    occ_r = None
    if has_occ:
        occ_r = refs[idx]
        idx += 1
    if want_grad:
        (ingrad_r, lrr_r, lrg_r, lrb_r, lgr_r, lgg_r, lgb_r,
         uvx_r, uvy_r, usplat_r) = refs[idx : idx + 10]
        idx += 10
    n_scratch = (12 if bounce_emit else 1) if (mxu is not None and not has_occ) else 0
    outs = refs[idx : len(refs) - n_scratch]
    scr = refs[len(refs) - n_scratch :]
    (radr_o, radg_o, radb_o, bnr_o, bng_o, bnb_o, pdfb_o,
     nox_o, noy_o, noz_o, ndx_o, ndy_o, ndz_o, alive_o) = outs[:14]
    if want_grad:
        (lsr_o, lsg_o, lsb_o, g0_o, g1_o, g2_o, g3_o, ids_o) = outs[14:22]
    occ_o = outs[-1] if want_occ else None

    p = (px_r[:], py_r[:], pz_r[:])
    ns = (nsx_r[:], nsy_r[:], nsz_r[:])
    ng = (ngx_r[:], ngy_r[:], ngz_r[:])
    d = (dx_r[:], dy_r[:], dz_r[:])
    shade = shade_r[:] != 0
    dif = (m0_r[:], m1_r[:], m2_r[:])
    rough = m3_r[:]
    beta = (br_r[:], bg_r[:], bb_r[:])
    depth = depth_r[:]
    add_emit = (aer_r[:], aeg_r[:], aeb_r[:])

    wo = _vscale(d, -1.0)
    tangent, binormal = _make_onb(ns)
    wo_local = _to_local(tangent, binormal, ns, wo)

    # ---- NEE sample (selected by the glue)
    wi_l = (lwx_r[:], lwy_r[:], lwz_r[:])
    l_dist = ldist_r[:]
    l_pdf = lpdf_r[:]
    l_eval = (levr_r[:], levg_r[:], levb_r[:])

    # ---- shadow trace (trace_any, t_min=1e-4, t_max=l_dist)
    if has_occ:
        # precomputed occlusion plane (the forward shade pass of the same
        # sample already swept these exact rays — direct_fused passes it
        # through to the grad pass, halving this kernel's sweep cost)
        occluded = occ_r[:] != 0
    elif mxu is not None:
        t_pad, tile, mxu_prec = mxu
        n_tiles = t_pad // tile
        rows = px_r.shape[0]
        ones = jnp.ones((1, LANES), jnp.float32)
        zeros_r = jnp.zeros((1, LANES), jnp.float32)
        occ_scr = scr[0]  # (BLOCK_ROWS, LANES) i32 VMEM scratch: Mosaic
        # has no dynamic_update_slice on values, so rows accumulate in a ref

        def occ_group(g, _):
            sl = pl.ds(g, 1)
            o_aug = jnp.concatenate(
                [px_r[sl, :], py_r[sl, :], pz_r[sl, :], ones], axis=0
            )
            d_aug = jnp.concatenate(
                [lwx_r[sl, :], lwy_r[sl, :], lwz_r[sl, :], zeros_r], axis=0
            )
            # lanes whose NEE term is already zero need no occlusion
            # answer (exact: the term multiplies by l_eval and gates on
            # wi_light . ns): roughly half a convex object faces away
            # from any one light, and the skipped lanes are spatially
            # coherent, so whole rows drop out of the sweep
            wl_row = (lwx_r[sl, :], lwy_r[sl, :], lwz_r[sl, :])
            ns_row = (nsx_r[sl, :], nsy_r[sl, :], nsz_r[sl, :])
            ev_on = (
                (levr_r[sl, :] != 0.0) | (levg_r[sl, :] != 0.0)
                | (levb_r[sl, :] != 0.0)
            )
            act_row = (
                (shade_r[sl, :] != 0) & ev_on
                & (_vdot(wl_row, ns_row) >= 1e-4)
            )
            row = _mxu_sweep_row(
                scene_r, box_r, tile, n_tiles, o_aug, d_aug, 1e-4,
                ldist_r[sl, :], "any", prec=mxu_prec,
                active=act_row,
            )
            occ_scr[sl, :] = row.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, rows, occ_group, 0)
        occluded = occ_scr[:] != 0
    else:
        def occ_body(ti, occ):
            p0 = (scene_r[ti, 0], scene_r[ti, 1], scene_r[ti, 2])
            e1 = (scene_r[ti, 3], scene_r[ti, 4], scene_r[ti, 5])
            e2 = (scene_r[ti, 6], scene_r[ti, 7], scene_r[ti, 8])
            h = _vcross(wi_l, e2)
            a = _vdot(e1, h)
            f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
            s = _vsub(p, p0)
            u = f * _vdot(s, h)
            q = _vcross(s, e1)
            v = f * _vdot(wi_l, q)
            t = f * _vdot(e2, q)
            ok = (
                (jnp.abs(a) > 1e-12)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t > 1e-4) & (t < l_dist)
            )
            return occ | ok.astype(jnp.int32)

        occluded = (
            jax.lax.fori_loop(0, n_tris, occ_body, jnp.zeros_like(depth)) != 0
        )

    wi_light_local = _to_local(tangent, binormal, ns, wi_l)
    nee_ok = shade & (~occluded) & (wi_light_local[2] >= 1e-4)
    pdf_bsdf_at_light = _ggx_sample_pdf(wo_local, wi_light_local, rough)
    mis_nee = l_pdf / jnp.maximum(l_pdf + pdf_bsdf_at_light, 1e-4)
    nee_weight = mis_nee / jnp.maximum(l_pdf, 1e-4)

    # ---- BSDF sample (path.py:143-150); draws from the glue
    u_lobe = ulobe_r[:]
    ub0 = ub0_r[:]
    ub1 = ub1_r[:]
    wi_local = _ggx_sample(wo_local, rough, u_lobe, ub0, ub1)
    pdf_bounce = _ggx_sample_pdf(wo_local, wi_local, rough)
    wi = _to_world(tangent, binormal, ns, wi_local)
    bounce_ok = shade & (_vdot(wi, ng) >= 1e-4) & (wi_local[2] >= 1e-4)
    next_o = _vadd(p, _vscale(ng, 1e-4))  # offset_ray_origin

    # shading values (+ gradient taps through the SAME closure in bwd)
    def shade_fn(d0, d1, d2, rg):
        df = (d0, d1, d2)
        b_nee = _ggx_brdf(wo_local, wi_light_local, df, rg)
        b_bounce = _ggx_brdf(wo_local, wi_local, df, rg)
        return b_nee, b_bounce

    if want_grad:
        (b_nee, b_bounce), vjp = jax.vjp(shade_fn, dif[0], dif[1], dif[2], rough)
    else:
        b_nee, b_bounce = shade_fn(dif[0], dif[1], dif[2], rough)

    # ---- RR decision from the glue's draw (path.py:153-155,179-187)
    u_rr = urr_r[:]
    inv_pdf = 1.0 / jnp.maximum(pdf_bounce, 1e-9)
    beta_next = (
        beta[0] * b_bounce[0] * inv_pdf,
        beta[1] * b_bounce[1] * inv_pdf,
        beta[2] * b_bounce[2] * inv_pdf,
    )
    lum = (
        0.212671 * beta_next[0] + 0.715160 * beta_next[1] + 0.072169 * beta_next[2]
    )
    q = jnp.maximum(lum, 0.05)
    do_rr = depth >= rr_depth
    dead = do_rr & ((lum == 0.0) | (u_rr >= q))
    rr_scale = jnp.where(do_rr & ~dead & bounce_ok, 1.0 / q, 1.0)
    path_alive = bounce_ok & ~dead & (depth + 1 < max_depth)
    beta_next = _vscale(beta_next, rr_scale)

    # ---- merged bounce emitter lookup (direct integrator, no-env scenes).
    # Emissive-first (round 4): direct lighting only consumes the bounce
    # ray's EMITTER radiance, so instead of a full closest-hit sweep + the
    # O(n_tiles) one-hot winner gather, the kernel intersects the bounce
    # rays against the LIGHT TRIANGLES alone (a statically unrolled MT
    # over L rows — block-wide VPU work) and then runs ONE t-capped
    # occlusion sweep: a bounce ray contributes iff its closest emissive
    # hit is unoccluded. Lanes that reach no light leave the occlusion
    # sweep's active set, and its per-tile t_hi caps + early exit make it
    # far cheaper than the closest sweep it replaces (the same algebra as
    # the streamed path's fused_glue.light_hit_planes).
    bounce_add = None
    if bounce_emit:
        t_pad, tile, mxu_prec = mxu
        n_tiles = t_pad // tile
        rows = px_r.shape[0]
        ones_b = jnp.ones((1, LANES), jnp.float32)
        zeros_b = jnp.zeros((1, LANES), jnp.float32)
        (sno_x, sno_y, sno_z, swi_x, swi_y, swi_z, sthi, sact,
         sbe_r, sbe_g, sbe_b) = scr[1:]

        # block-wide closest hit over the L light triangles
        big_f = jnp.float32(1e30)
        bt = jnp.full_like(pdf_bounce, big_f)
        bu_l = jnp.zeros_like(pdf_bounce)
        bv_l = jnp.zeros_like(pdf_bounce)
        bj = jnp.zeros_like(depth)
        for j in range(n_light_tris):
            p0 = (lp_r[j, 0], lp_r[j, 1], lp_r[j, 2])
            e1 = (lp_r[j, 3], lp_r[j, 4], lp_r[j, 5])
            e2 = (lp_r[j, 6], lp_r[j, 7], lp_r[j, 8])
            hh = _vcross(wi, e2)
            a = _vdot(e1, hh)
            f = jnp.where(jnp.abs(a) > 1e-12,
                          1.0 / jnp.where(a == 0, 1.0, a), 0.0)
            s = _vsub(next_o, p0)
            u = f * _vdot(s, hh)
            q = _vcross(s, e1)
            v = f * _vdot(wi, q)
            t = f * _vdot(e2, q)
            ok = (
                (jnp.abs(a) > 1e-12)
                & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > 0.0) & (t < bt)
            )
            bt = jnp.where(ok, t, bt)
            bu_l = jnp.where(ok, u, bu_l)
            bv_l = jnp.where(ok, v, bv_l)
            bj = jnp.where(ok, j, bj)
        has = path_alive & (bt < big_f)
        # winner attributes by where-chain (L is statically small)
        av = [jnp.zeros_like(pdf_bounce) for _ in range(16)]
        for j in range(n_light_tris):
            m = bj == j
            av = [jnp.where(m, lp_r[j, 9 + c], av[c]) for c in range(16)]
        em = (av[0], av[1], av[2])
        l_ng = (av[3], av[4], av[5])
        inv_pdfc = av[6]
        ns_l = _vnormalize((
            av[7] + bu_l * av[10] + bv_l * av[13],
            av[8] + bu_l * av[11] + bv_l * av[14],
            av[9] + bu_l * av[12] + bv_l * av[15],
        ))
        cos_light = -_vdot(l_ng, wi)
        frontfacing = (cos_light >= 1e-4) & (-_vdot(ns_l, wi) >= 1e-4)
        l_emissive = (em[0] > 0.0) | (em[1] > 0.0) | (em[2] > 0.0)
        pdf_hit = bt * bt / jnp.maximum(inv_pdfc * cos_light, 1e-12)
        mis_hit = pdf_bounce / jnp.maximum(pdf_bounce + pdf_hit, 1e-4)
        e_on = has & frontfacing & l_emissive
        sbe_r[:] = jnp.where(e_on, mis_hit * em[0], 0.0)
        sbe_g[:] = jnp.where(e_on, mis_hit * em[1], 0.0)
        sbe_b[:] = jnp.where(e_on, mis_hit * em[2], 0.0)

        sno_x[:] = next_o[0]
        sno_y[:] = next_o[1]
        sno_z[:] = next_o[2]
        swi_x[:] = wi[0]
        swi_y[:] = wi[1]
        swi_z[:] = wi[2]
        sthi[:] = 0.9999 * bt  # NEE shadow epsilon (lights.py parity)
        sact[:] = has.astype(jnp.int32)

        def be_group(g, _):
            sl = pl.ds(g, 1)
            o_row = (sno_x[sl, :], sno_y[sl, :], sno_z[sl, :])
            d_row = (swi_x[sl, :], swi_y[sl, :], swi_z[sl, :])
            act = sact[sl, :] != 0
            o_aug = jnp.concatenate([*o_row, ones_b], axis=0)
            d_aug = jnp.concatenate([*d_row, zeros_b], axis=0)
            occ = _mxu_sweep_row(
                scene_r, box_r, tile, n_tiles, o_aug, d_aug, 0.0,
                sthi[sl, :], "any", prec=mxu_prec, active=act,
            )
            sbe_r[sl, :] = jnp.where(occ, 0.0, sbe_r[sl, :])
            sbe_g[sl, :] = jnp.where(occ, 0.0, sbe_g[sl, :])
            sbe_b[sl, :] = jnp.where(occ, 0.0, sbe_b[sl, :])
            return 0

        jax.lax.fori_loop(0, rows, be_group, 0)
        bounce_add = (sbe_r[:], sbe_g[:], sbe_b[:])

    # ---- radiance delta: beta * (add_emit + nee_ok * nee_contrib)
    nw = nee_weight
    nee_r = b_nee[0] * nw * l_eval[0]
    nee_g = b_nee[1] * nw * l_eval[1]
    nee_b = b_nee[2] * nw * l_eval[2]
    nok = nee_ok
    radr_o[:] = beta[0] * (add_emit[0] + jnp.where(nok, nee_r, 0.0))
    radg_o[:] = beta[1] * (add_emit[1] + jnp.where(nok, nee_g, 0.0))
    radb_o[:] = beta[2] * (add_emit[2] + jnp.where(nok, nee_b, 0.0))
    if bounce_emit:
        # complete direct-sample radiance: the bounce term lands here
        # instead of in a separate emitter-lookup pass
        radr_o[:] = radr_o[:] + beta_next[0] * bounce_add[0]
        radg_o[:] = radg_o[:] + beta_next[1] * bounce_add[1]
        radb_o[:] = radb_o[:] + beta_next[2] * bounce_add[2]

    bnr_o[:] = beta_next[0]
    bng_o[:] = beta_next[1]
    bnb_o[:] = beta_next[2]
    pdfb_o[:] = pdf_bounce
    nox_o[:] = next_o[0]
    noy_o[:] = next_o[1]
    noz_o[:] = next_o[2]
    ndx_o[:] = wi[0]
    ndy_o[:] = wi[1]
    ndz_o[:] = wi[2]
    alive_o[:] = path_alive.astype(jnp.int32)
    if want_occ:
        occ_o[:] = occluded.astype(jnp.int32)

    if want_grad:
        in_grad = ingrad_r[:] != 0
        le_grad = (lgr_r[:], lgg_r[:], lgb_r[:])
        if bounce_emit:
            # merged mode: the remaining-path radiance IS the bounce term
            # the in-kernel emitter sweep just computed — no le_rem input
            ler = beta_next[0] * bounce_add[0]
            leg = beta_next[1] * bounce_add[1]
            leb = beta_next[2] * bounce_add[2]
        else:
            le_rem = (lrr_r[:], lrg_r[:], lrb_r[:])
            # subtract this vertex's local contributions from the
            # remaining-path radiance (path_persistent phase-1 bookkeeping)
            sub_r = beta[0] * (add_emit[0] + jnp.where(nok, nee_r, 0.0))
            sub_g = beta[1] * (add_emit[1] + jnp.where(nok, nee_g, 0.0))
            sub_b = beta[2] * (add_emit[2] + jnp.where(nok, nee_b, 0.0))
            ler = le_rem[0] - jnp.where(in_grad, sub_r, 0.0)
            leg = le_rem[1] - jnp.where(in_grad, sub_g, 0.0)
            leb = le_rem[2] - jnp.where(in_grad, sub_b, 0.0)
        lsr_o[:] = ler
        lsg_o[:] = leg
        lsb_o[:] = leb
        ct_on_nee = in_grad & nee_ok
        ct_nee = (
            jnp.where(ct_on_nee, beta[0] * nw * l_eval[0] * le_grad[0], 0.0),
            jnp.where(ct_on_nee, beta[1] * nw * l_eval[1] * le_grad[1], 0.0),
            jnp.where(ct_on_nee, beta[2] * nw * l_eval[2] * le_grad[2], 0.0),
        )
        # continuation adjoint = le_rem / bsdf_bounce per channel (see
        # path.path_backward — the reference's beta/pdf*Le form carries a
        # spurious throughput factor)
        ct_on_b = in_grad & bounce_ok
        ct_bounce = (
            jnp.where(
                ct_on_b & (b_bounce[0] > 1e-8),
                ler / jnp.maximum(b_bounce[0], 1e-8) * le_grad[0], 0.0,
            ),
            jnp.where(
                ct_on_b & (b_bounce[1] > 1e-8),
                leg / jnp.maximum(b_bounce[1], 1e-8) * le_grad[1], 0.0,
            ),
            jnp.where(
                ct_on_b & (b_bounce[2] > 1e-8),
                leb / jnp.maximum(b_bounce[2], 1e-8) * le_grad[2], 0.0,
            ),
        )
        g0, g1, g2, g3 = vjp((ct_nee, ct_bounce))
        grad_on = in_grad & (nee_ok | bounce_ok)
        g0_o[:] = jnp.where(grad_on & ~jnp.isnan(g0), g0, 0.0)
        g1_o[:] = jnp.where(grad_on & ~jnp.isnan(g1), g1, 0.0)
        g2_o[:] = jnp.where(grad_on & ~jnp.isnan(g2), g2, 0.0)
        g3_o[:] = jnp.where(grad_on & ~jnp.isnan(g3), g3, 0.0)
        # stochastic single-corner splat id; the glue supplies the salt draw
        # (texture.stochastic_corner_ids + sampler.salt())
        u_splat = usplat_r[:]
        x = uvx_r[:] * (tex_w - 1)
        y = (1.0 - uvy_r[:]) * (tex_h - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        xa = jnp.clip(x0i, 0, tex_w - 1)
        ya = jnp.clip(y0i, 0, tex_h - 1)
        xb = jnp.clip(x0i + 1, 0, tex_w - 1)
        yb = jnp.clip(y0i + 1, 0, tex_h - 1)
        w00 = (1 - fx) * (1 - fy)
        w01 = (1 - fx) * fy
        w10 = fx * (1 - fy)
        c0 = w00
        c1 = c0 + w01
        c2 = c1 + w10
        ids = jnp.where(
            u_splat < c0,
            ya * tex_w + xa,
            jnp.where(
                u_splat < c1,
                yb * tex_w + xa,
                jnp.where(u_splat < c2, ya * tex_w + xb, yb * tex_w + xb),
            ),
        )
        # masked lanes -> sentinel bin (compacted away by the flush)
        ids_o[:] = jnp.where(grad_on, ids, tex_h * tex_w)


FUSED_K2_FWD_OUTS = 14


# -------------------------------------------------------------- wrappers


def _ray_spec():
    return pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(rows):
    return pl.BlockSpec((rows, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _plane_shape(r):
    return (r, LANES)


def fused_trace_interact(scene_pack, n_tris, rays, interpret=False, woop=None,
                         lite=False):
    """kernel 1. rays: 8 planes (ox,oy,oz,dx,dy,dz,pdf_prev f32, active i32).
    Returns 16 planes: p(3), uv(2), ns(3), ng(3), shade(i32), add_emit(3),
    miss(i32). `woop` = build_woop_pack(scene_pack) output routes to the
    MXU sweep (big dense scenes); None keeps the per-triangle fori sweep.
    lite=True (the direct integrator's bounce emitter lookup) returns only
    4 planes (add_emit3, miss): on the MXU path the kernel skips the
    interaction epilogue and 12 plane writes; the fori path computes the
    full set and returns the 4 (small scenes are VPU-cheap anyway)."""
    r = rays[0].shape[0]
    grid = (r // BLOCK_ROWS,)
    f32 = jnp.float32
    if lite and woop is not None:
        out_shape = (
            [jax.ShapeDtypeStruct(_plane_shape(r), f32)] * 3
            + [jax.ShapeDtypeStruct(_plane_shape(r), jnp.int32)]
        )
        n_out = 4
    else:
        out_shape = (
            [jax.ShapeDtypeStruct(_plane_shape(r), f32)] * 11
            + [jax.ShapeDtypeStruct(_plane_shape(r), jnp.int32)]
            + [jax.ShapeDtypeStruct(_plane_shape(r), f32)] * 3
            + [jax.ShapeDtypeStruct(_plane_shape(r), jnp.int32)]
        )
        n_out = 16
    if woop is not None:
        gat_t, box_t, t_pad, tile = woop
        prec = "highest" if interpret else MXU_PRECISION
        outs = pl.pallas_call(
            lambda *refs: _mxu_trace_kernel(t_pad, tile, prec, lite, refs),
            grid=grid,
            in_specs=[_const_spec2(gat_t.shape), _const_spec2(box_t.shape)]
            + [_ray_spec()] * 8,
            out_specs=[_ray_spec()] * n_out,
            out_shape=out_shape,
            interpret=interpret,
        )(gat_t, box_t, *rays)
        return outs
    outs = pl.pallas_call(
        lambda *refs: _trace_interact_kernel(n_tris, refs),
        grid=grid,
        in_specs=[_const_spec2(scene_pack.shape)] + [_ray_spec()] * 8,
        out_specs=[_ray_spec()] * 16,
        out_shape=out_shape,
        interpret=interpret,
    )(scene_pack, *rays)
    if lite:
        return outs[12], outs[13], outs[14], outs[15]
    return outs


def fused_shade(
    scene_pack,
    n_tris: int,
    ray_planes,
    nee_planes,
    draw_planes,
    rr_depth: int,
    max_depth: int,
    tex_h: int,
    tex_w: int,
    grad_planes=None,
    interpret=False,
    woop=None,
    occ_in=None,
    want_occ=False,
    bounce_emit=False,
    light_pack=None,
    n_light_tris=None,
):
    """kernel 2. ray_planes: 24 planes (p3, ns3, ng3, d3, shade i32, mat4,
    beta3, depth i32, add_emit3). nee_planes: 8 (wi_l3, dist, pdf, eval3 —
    the glue-selected light sample). draw_planes: 4 (u_lobe, u0, u1, u_rr).
    grad_planes (backward): 10 more (in_grad i32, le_rem3, le_grad3, uv2,
    u_splat). Returns 14 forward planes (radiance_add3, beta_next3,
    pdf_bounce, next_o3, next_d3, alive i32) + 8 backward planes
    (le_rem_next3, g0..g3, splat ids i32) [+ 1 occluded i32 plane if
    want_occ]. `woop` (build_woop_pack output) runs the shadow sweep on
    the MXU. `occ_in` (an i32 plane from a want_occ call over the SAME
    rays/NEE sample) skips the shadow sweep entirely. `bounce_emit` (MXU
    only, no occ passthrough; needs `light_pack`, the (L_pad, 25)
    light-triangle table) merges the bounce emitter lookup in-kernel as an
    emissive-first light-MT + t-capped occlusion sweep: the radiance
    outputs carry the complete direct-sample radiance and the gradient
    taps need no le_rem input (see _shade_kernel)."""
    r = ray_planes[0].shape[0]
    grid = (r // BLOCK_ROWS,)
    want_grad = grad_planes is not None
    has_occ = occ_in is not None
    if bounce_emit:
        assert woop is not None and not has_occ and not want_occ
        assert light_pack is not None
        if n_light_tris is None:
            n_light_tris = int(light_pack.shape[0])
    else:
        n_light_tris = 0
    f32 = jnp.float32
    out_shape = [jax.ShapeDtypeStruct(_plane_shape(r), f32)] * 13 + [
        jax.ShapeDtypeStruct(_plane_shape(r), jnp.int32)
    ]
    if want_grad:
        out_shape += [jax.ShapeDtypeStruct(_plane_shape(r), f32)] * 7 + [
            jax.ShapeDtypeStruct(_plane_shape(r), jnp.int32)
        ]
    if want_occ:
        out_shape += [jax.ShapeDtypeStruct(_plane_shape(r), jnp.int32)]
    n_out = len(out_shape)
    if woop is not None:
        table = woop[0]  # the gat table; its rows 0:12 drive the occ sweep
        mxu = (woop[2], woop[3], "highest" if interpret else MXU_PRECISION)
    else:
        table, mxu = scene_pack, None
    inputs = [table]
    in_specs = [_const_spec2(table.shape)]
    if mxu is not None and not has_occ:
        inputs.append(woop[1])  # per-tile AABBs
        in_specs.append(_const_spec2(woop[1].shape))
        if bounce_emit:
            inputs.append(light_pack)
            in_specs.append(_const_spec2(light_pack.shape))
    inputs += list(ray_planes) + list(nee_planes) + list(draw_planes)
    in_specs += [_ray_spec()] * 36
    if has_occ:
        inputs.append(occ_in)
        in_specs.append(_ray_spec())
    if want_grad:
        inputs += list(grad_planes)
        in_specs += [_ray_spec()] * 10
    scratch = (
        [pltpu.VMEM((BLOCK_ROWS, LANES), jnp.int32)]
        if (mxu is not None and not has_occ)
        else []
    )
    if bounce_emit:
        # bounce ray planes (o3, d3, pdf), active i32, emitter result (3)
        scratch += [pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32)] * 7
        scratch += [pltpu.VMEM((BLOCK_ROWS, LANES), jnp.int32)]
        scratch += [pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32)] * 3
    outs = pl.pallas_call(
        functools.partial(
            _kernel2_entry, n_tris, rr_depth, max_depth, tex_h, tex_w,
            want_grad, mxu, has_occ, want_occ, bounce_emit, n_light_tris,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[_ray_spec()] * n_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    return outs


def _kernel2_entry(t, rr_depth, max_depth, tex_h, tex_w, want_grad, mxu,
                   has_occ, want_occ, bounce_emit, n_light_tris, *refs):
    _shade_kernel(t, rr_depth, max_depth, tex_h, tex_w, want_grad, refs, mxu,
                  has_occ, want_occ, bounce_emit, n_light_tris)


def _const_spec2(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def spatial_lane_perm(coords):
    """Morton-order permutation of a pixel-coordinate batch.

    The MXU sweeps run one (1, LANES) ray row at a time and skip a whole
    triangle tile when NO lane in the row can hit it (`tile_need` AABB slab
    test / the shadow+bounce sweeps' `active` masks). In raster order every
    512-lane row mixes hit and miss pixels, so no row ever skips anything;
    sorting lanes along the Z-curve packs each row into a compact ~32x16
    screen tile, making miss/dead regions whole rows that skip every tile.
    This is the TPU analog of the SIMT warp coherence the reference gets
    from hardware ray scheduling (OptiX, reference render.py:74).

    Per-lane arithmetic is order-independent, so images are bit-identical;
    gradients differ only by flush summation order (float reassociation).

    Returns (perm, inv): coords[perm] is sweep order, out[inv] restores the
    caller's pixel order. Cost: one argsort per device call (not per
    sample); under jit on a static pixel grid XLA constant-folds it.
    """
    x = coords[:, 0].astype(jnp.uint32)
    y = coords[:, 1].astype(jnp.uint32)

    def part1by1(v):  # low 16 bits -> even bit positions
        v = v & jnp.uint32(0xFFFF)  # coords >= 65536 would corrupt keys
        v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
        v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & jnp.uint32(0x33333333)
        v = (v | (v << 1)) & jnp.uint32(0x55555555)
        return v

    key = part1by1(x) | (part1by1(y) << 1)
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    return perm, inv


def pad_to_planes(x, rows):
    """(N,) array -> (rows, LANES) plane (zero padded)."""
    n = x.shape[0]
    return jnp.pad(x, (0, rows * LANES - n)).reshape(rows, LANES)


def planes_rows(n):
    r = -(-n // LANES)
    return -(-r // BLOCK_ROWS) * BLOCK_ROWS


def read_quads_planes(ux, uy, packed, h, w):
    """Quad-packed bilinear fetch on uv planes -> 4 material planes
    (texture._read_bsdf_quads semantics: CLAMP + v-flip)."""
    shape = ux.shape
    x = ux.reshape(-1) * (w - 1)
    y = (1.0 - uy.reshape(-1)) * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    rows = packed[(y0 * (w - 1) + x0).astype(jnp.int32)]
    if rows.shape[-1] == 8:  # bf16-pair-packed table (texture.pack_quads)
        from ..texture import unpack_quad_rows

        rows = unpack_quad_rows(rows)
    rows = rows.astype(jnp.float32)
    w00 = (1 - fx) * (1 - fy)
    w01 = (1 - fx) * fy
    w10 = fx * (1 - fy)
    w11 = fx * fy
    out = []
    for c in range(4):
        v = (
            rows[:, c] * w00
            + rows[:, 4 + c] * w01
            + rows[:, 8 + c] * w10
            + rows[:, 12 + c] * w11
        )
        out.append(v.reshape(shape))
    return out
