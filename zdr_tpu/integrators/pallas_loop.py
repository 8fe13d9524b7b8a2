"""Single-megakernel persistent path loop ("fused2").

Round-5 restructure of the fused path pipeline. Profiling the round-4 loop
(tools/profile_fused_bounce.py, v5e-1, cbox 512^2) put the 2.73 ms bounce
at: texture gather 1.1 ms, Pallas kernels ~0.2 ms, and ~1.4 ms of XLA glue
— sampler draws, NEE selection, restart camera rays, ~25 carry-plane
select chains — each a fusion-boundary materialization over (rows, 512)
planes. None of that glue needs XLA: the draws are pure uint32 ALU
(procedural pmj02bn / corrmj-P2 / lcg), NEE selection over a small static
light set is a where-chain, and the camera ray is componentized math. So
the whole loop body becomes

    mat4 = read_quads_planes(uv)          # the ONE real gather (XLA)
    carry' = LOOP_KERNEL(carry, mat4)     # everything else (one Pallas call)

where LOOP_KERNEL runs, for bounce n: kernel-2 shading (NEE shadow sweep +
GGX + RR) -> termination/restart bookkeeping (sampler reseed + camera ray,
in-kernel) -> kernel-1 of bounce n+1 (closest sweep + interact + emitter
MIS) -> NEE selection + sampler draws for bounce n+1 -> next uv for the
gather. The sampler stream, splat salts and all shading math are the same
formulas as path_fused/pallas_bounce (same draw order per sample), so
results agree to float tolerance (Mosaic vs XLA transcendental
scheduling), gated by tests/test_fused.py::TestLoopKernel.

Scope (falls back to path_fused otherwise):
  * no environment map (its alias/equirect fetches are real gathers that
    belong in XLA glue); mesh lights with <= LOOP_MAX_LIGHT_TRIS triangles
    (+ point lights) — the NEE tables unroll as in-kernel where-chains
  * samplers whose draws are loop-free in-kernel: lcg always, pmj02bn /
    corrmj at power-of-two spp (the *SamplerP2 classes)
  * dense scenes (num_tris <= FUSED_MAX_TRIS)

Reference parity: same estimator as /root/reference/prb.py's forward; the
megakernel-per-bounce architecture is the TPU answer to the reference's
one-megakernel-per-frame design (/root/reference/integrator.py:8-30).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..samplers.hashes import lcg_step, lcg_to_unit_float, next_pow2_mask
from ..scenedata import SceneData
from .path import _depths
from .wrapper import RADIANCE_CLAMP
from .pallas_bounce import (
    FUSED_MAX_TRIS,
    GAT_GATHER_LO,
    LANES,
    MXU_MIN_TRIS,
    _gat_rows,
    _ggx_brdf,
    _ggx_sample,
    _ggx_sample_pdf,
    _interact_epilogue,
    _make_onb,
    _mt_rederive,
    _mxu_gather_rows,
    _mxu_sweep_row,
    _to_local,
    _to_world,
    _vadd,
    _vcross,
    _vdot,
    _vscale,
    _vsub,
    MXU_PRECISION,
    build_fused_const,
    build_woop_pack,
    pad_to_planes,
    planes_rows,
    read_quads_planes,
    spatial_lane_perm,
)

# block height of the loop kernel: it carries ~45 planes in AND out, so a
# 32-row block's double-buffered VMEM footprint would crowd the scene/gat
# tables; 16 rows halves it at identical throughput (the kernel is
# VPU/issue-bound, not grid-bound)
LOOP_BLOCK_ROWS = 16
# NEE selection + the emissive-first structures unroll per light triangle
LOOP_MAX_LIGHT_TRIS = 32
_PI = math.pi

FUSED2_SAMPLERS = ("lcg", "pmj02bn", "corrmj")


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def _sampler_in_kernel_ok(kind: str, spp: int) -> bool:
    if kind == "lcg":
        return True
    if kind == "pmj02bn":
        return _is_pow2(int(spp))
    if kind == "corrmj":
        return _is_pow2(int(spp)) and _is_pow2(
            max(1, int((float(spp) + 0.4) ** 0.5))
        )
    return False


def loop_eligible(data: SceneData, cfg) -> bool:
    """Scene/config gate for the megakernel loop (see module docstring)."""
    from .path_fused import fused_eligible

    meta = data.fused_meta
    return (
        fused_eligible(data, cfg)
        and meta is not None
        and meta.n_env == 0
        # fori-swept scenes only for now: the loop kernel's per-row MXU
        # sweeps assemble row results by concatenating VALUE slices taken
        # at different offsets, which Mosaic refuses to lower (the same
        # "offset mismatch on non-concat dimension" limit hit by the
        # sweep-dot stacking attempt — see pallas_bounce._tile_uv_t).
        # MXU-size scenes keep the 2-kernel fused route; restructuring
        # the row loops onto scratch refs is future work.
        and meta.num_tris < MXU_MIN_TRIS
        and 0 < len(meta.light_tri_ids) + meta.n_point
        and len(meta.light_tri_ids) <= LOOP_MAX_LIGHT_TRIS
        and cfg.sampler in FUSED2_SAMPLERS
        and _sampler_in_kernel_ok(cfg.sampler, cfg.spp)
    )


# ------------------------------------------------------- in-kernel sampler

def _smp_nstate(kind: str) -> int:
    return {"lcg": 1, "pmj02bn": 2, "corrmj": 3}[kind]


def _smp_from_planes(kind, pxp, pyp, seed, spp: int, state, bn_cache):
    """Rebuild a sampler instance from carried i32 state planes (values,
    inside the kernel). seed is a u32 plane; spp is the static python int."""
    u = lambda x: x.astype(jnp.uint32)  # noqa: E731
    if kind == "lcg":
        from ..samplers.lcg import LCGSampler

        return LCGSampler(state=u(state[0]))
    if kind == "pmj02bn":
        from ..samplers.pmj02bn import PMJ02BNSamplerP2

        w = next_pow2_mask(spp)
        return PMJ02BNSamplerP2(
            px=pxp, py=pyp,
            sample_index=u(state[0]), dimension=u(state[1]),
            seed=seed,
            spp=jnp.full(pxp.shape, spp, jnp.uint32),
            w=jnp.full(pxp.shape, w, jnp.uint32),
            bn_cache=bn_cache,
        )
    if kind == "corrmj":
        from ..samplers.corrmj import CorrMJSamplerP2
        from ..samplers.hashes import U32, xxhash32_4

        w = next_pow2_mask(spp)
        res = max(1, int((float(spp) + 0.4) ** 0.5))
        return CorrMJSamplerP2(
            sample_index=u(state[0]), dimension=u(state[1]), state=u(state[2]),
            permutation_seed=xxhash32_4(pxp, pyp, seed, U32(0)),
            spp=jnp.full(pxp.shape, spp, jnp.uint32),
            w=jnp.full(pxp.shape, w, jnp.uint32),
            res=jnp.full(pxp.shape, res, jnp.uint32),
            resw=jnp.full(pxp.shape, next_pow2_mask(res), jnp.uint32),
        )
    raise ValueError(kind)


def _smp_state(kind, smp):
    """Sampler instance -> tuple of i32 state planes (kernel carry)."""
    i = lambda x: x.astype(jnp.int32)  # noqa: E731
    if kind == "lcg":
        return (i(smp.state),)
    if kind == "pmj02bn":
        return (i(smp.sample_index), i(smp.dimension))
    return (i(smp.sample_index), i(smp.dimension), i(smp.state))


def _smp_fresh_state(kind, pxp, pyp, seed, sample_idx):
    """State planes of a FRESH sampler at (pixel, seed, sample_idx) —
    make_sampler_xy's restart-varying fields only (the invariant fields are
    reconstructed identically by _smp_from_planes)."""
    from ..samplers.hashes import U32, xxhash32_4

    u = sample_idx.astype(jnp.uint32)
    i = lambda x: x.astype(jnp.int32)  # noqa: E731
    if kind == "lcg":
        mixed = seed ^ (u * U32(987654347))
        st = xxhash32_4(pxp, pyp, mixed, jnp.uint32(0x9E3779B9))
        return (i(st),)
    if kind == "pmj02bn":
        return (i(u), jnp.zeros_like(sample_idx))
    st = xxhash32_4(pxp, pyp, seed, u)
    return (i(u), jnp.zeros_like(sample_idx), i(st))


# --------------------------------------------------------- camera in-kernel

def camera_const(camera) -> jnp.ndarray:
    """(2, 8) f32 camera scalars for in-kernel ray generation: row 0 =
    [origin3, right3, up_x, up_y], row 1 = [up_z, fwd3, tan(fov/2), 0...].
    The basis is computed here (XLA, loop-invariant) with the exact
    formulas of fused_glue.start_sample_planes."""
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
    vals = [camera.origin[0], camera.origin[1], camera.origin[2],
            rx, ry, rz, upx, upy,
            upz, fx, fy, fz, scale, 0.0, 0.0, 0.0]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals]).reshape(2, 8)


def _camera_ray(cam_r, pxp, pyp, u0, u1, res, use_tent):
    """In-kernel primary ray (start_sample_planes parity). cam_r is the
    camera_const ref; pxp/pyp i32 planes; u0/u1 the camera jitter draws."""
    w, h = res
    if use_tent:
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
    rx, ry, rz = cam_r[0, 3], cam_r[0, 4], cam_r[0, 5]
    upx, upy, upz = cam_r[0, 6], cam_r[0, 7], cam_r[1, 0]
    fx, fy, fz = cam_r[1, 1], cam_r[1, 2], cam_r[1, 3]
    scale = cam_r[1, 4]
    sx = px_ndc * scale
    sy = py_ndc * scale
    dx = sx * rx - sy * upx + fx
    dy = sx * ry - sy * upy + fy
    dz = sx * rz - sy * upz + fz
    inv = 1.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-20)
    d = (dx * inv, dy * inv, dz * inv)
    o = (jnp.zeros_like(dx) + cam_r[0, 0],
         jnp.zeros_like(dx) + cam_r[0, 1],
         jnp.zeros_like(dx) + cam_r[0, 2])
    return o, d


# ------------------------------------------------------ NEE select in-kernel

def _nee_select(meta, lp_r, li_r, pp_r, p, smp):
    """fused_glue.sample_light_planes for mesh + point lights (no env),
    tables read as in-kernel scalar where-chains. Returns
    ((wi3, dist, pdf, ev3), smp)."""
    u_sel, smp = smp.next1()
    u_prim, smp = smp.next1()
    (u2a, u2b), smp = smp._next2_xy()

    n_point, n_mesh = meta.n_point, meta.n_lights
    n_i = n_point + n_mesh
    n = float(max(n_i, 1))
    idx = jnp.clip((u_sel * n).astype(jnp.int32), 0, max(n_i - 1, 0))

    zero = jnp.zeros_like(u_sel)
    wi = (zero, zero, zero + 1.0)
    dist = zero
    pdf = zero + 1.0
    ev = (zero, zero, zero)

    if n_mesh > 0:
        mesh_idx = jnp.clip(idx - n_point, 0, max(n_mesh - 1, 0))
        off = zero
        tc = zero
        for r in range(n_mesh):
            m = mesh_idx == r
            off = jnp.where(m, li_r[r, 0], off)
            tc = jnp.where(m, li_r[r, 1], tc)
        prim_local = jnp.clip(u_prim * tc, 0.0, jnp.maximum(tc - 1.0, 0.0))
        l_sel = (off + jnp.floor(prim_local)).astype(jnp.int32)
        L = len(meta.light_tri_ids)
        lt = [zero for _ in range(16)]
        for r in range(L):
            m = l_sel == r
            lt = [jnp.where(m, lp_r[r, c], lt[c]) for c in range(16)]
        lv0 = (lt[0], lt[1], lt[2])
        le1 = (lt[3], lt[4], lt[5])
        le2 = (lt[6], lt[7], lt[8])
        lem = (lt[9], lt[10], lt[11])
        l_ng = (lt[12], lt[13], lt[14])
        l_inv_pdf = lt[15]
        a_bc = jnp.where(u2a < u2b, 0.5 * u2a, u2a - 0.5 * u2b)
        b_bc = jnp.where(u2a < u2b, u2b - 0.5 * u2a, 0.5 * u2b)
        c_bc = 1.0 - a_bc - b_bc
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
        p_idx = jnp.clip(idx, 0, max(n_point - 1, 0))
        pt = [zero for _ in range(6)]
        for r in range(n_point):
            m = p_idx == r
            pt = [jnp.where(m, pp_r[r, c], pt[c]) for c in range(6)]
        dx = pt[0] - p[0]
        dy = pt[1] - p[1]
        dz = pt[2] - p[2]
        sqr = dx * dx + dy * dy + dz * dz
        inv_len = 1.0 / jnp.maximum(jnp.sqrt(sqr), 1e-20)
        p_wi = (dx * inv_len, dy * inv_len, dz * inv_len)
        p_pdf = sqr / n
        p_dist = 0.9999 * jnp.sqrt(sqr)
        p_ev = (pt[3], pt[4], pt[5])
        is_point = idx < n_point
        wi = tuple(jnp.where(is_point, p_wi[c], wi[c]) for c in range(3))
        dist = jnp.where(is_point, p_dist, dist)
        pdf = jnp.where(is_point, p_pdf, pdf)
        ev = tuple(jnp.where(is_point, p_ev[c], ev[c]) for c in range(3))

    return (wi, dist, pdf, ev), smp


# NOTE on selection-order parity: fused_glue orders env < point < mesh and
# the loop kernel has no env, so idx 0..n_point-1 = point, then mesh —
# identical to the glue for env-free scenes.


# ------------------------------------------------------------- the kernel

_F32_CARRY = 37  # f32 planes before the i32 tail (see _carry_layout)


def _carry_layout(kind: str):
    """Names of the carried planes, in order. f32 block first, then i32."""
    f32 = (
        "acc_r", "acc_g", "acc_b", "cur_r", "cur_g", "cur_b",
        "beta_r", "beta_g", "beta_b",
        "d_x", "d_y", "d_z", "p_x", "p_y", "p_z",
        "ns_x", "ns_y", "ns_z", "ng_x", "ng_y", "ng_z",
        "ae_r", "ae_g", "ae_b", "uv_x", "uv_y",
        "wl_x", "wl_y", "wl_z", "l_dist", "l_pdf",
        "lev_r", "lev_g", "lev_b",
        # pdf_prev of the NEXT k2's emitter context is consumed inside one
        # kernel invocation; only the BSDF-sample draws ride the carry
        "u_lobe", "u_b0",
    )
    assert len(f32) == _F32_CARRY - 1
    f32 = f32 + ("u_b1",)
    i32 = ("u_rr_bits", "sample_idx", "shade", "depth", "in_flight") + tuple(
        f"smp{k}" for k in range(_smp_nstate(kind))
    )
    return f32, i32


# u_rr rides bitcast in an i32 slot purely to keep the f32/i32 split simple


def _loop_kernel(
    *,
    kind: str,
    spp: int,
    res,
    use_tent: bool,
    n_tris: int,
    rr_depth: int,
    max_depth: int,
    tex_h: int,
    tex_w: int,
    meta,
    mxu,  # None | (t_pad, tile, prec)
    n_bn: int,
    want_grad: bool,
    refs,
):
    nst = _smp_nstate(kind)
    ri = 0

    def take(n=1):
        nonlocal ri
        out = refs[ri] if n == 1 else refs[ri : ri + n]
        ri += n
        return out

    scene_r = take()  # (T_pad, 32) or gat table when mxu
    box_r = take() if mxu is not None else None
    lp_r = take()  # light triangles (may be dummy)
    li_r = take()  # light instances
    pp_r = take()  # point lights
    cam_r = take()  # (2, 8) camera scalars
    bn_r = take() if n_bn else None  # (n_tex, B, L) blue-noise cache
    pxp_r, pyp_r, seed_r, stop_r, allow_r = take(5)
    m0_r, m1_r, m2_r, m3_r = take(4)  # the XLA texture gather's output
    f32_names, i32_names = _carry_layout(kind)
    n_carry = len(f32_names) + len(i32_names)
    ins = take(n_carry)
    grad_in = take(3) if want_grad else None  # le_grad planes
    outs = refs[ri : ri + n_carry]
    tap_outs = refs[ri + n_carry:] if want_grad else None

    s = {}
    for k, r in zip(f32_names + i32_names, ins):
        s[k] = r[:]
    pxp = pxp_r[:]
    pyp = pyp_r[:]
    seed = seed_r[:].astype(jnp.uint32)
    stop_idx = stop_r[:]
    bn_cache = bn_r[:] if bn_r is not None else None

    smp = _smp_from_planes(
        kind, pxp, pyp, seed, spp,
        tuple(s[f"smp{k}"] for k in range(nst)), bn_cache,
    )

    in_flight = s["in_flight"] != 0
    allow = allow_r[:] != 0
    shade = (s["shade"] != 0) & in_flight
    dif = (m0_r[:], m1_r[:], m2_r[:])
    rough = m3_r[:]
    beta = (s["beta_r"], s["beta_g"], s["beta_b"])
    d = (s["d_x"], s["d_y"], s["d_z"])
    p = (s["p_x"], s["p_y"], s["p_z"])
    ns = (s["ns_x"], s["ns_y"], s["ns_z"])
    ng = (s["ng_x"], s["ng_y"], s["ng_z"])
    add_emit = (s["ae_r"], s["ae_g"], s["ae_b"])
    wi_l = (s["wl_x"], s["wl_y"], s["wl_z"])
    l_dist = s["l_dist"]
    l_pdf = s["l_pdf"]
    l_eval = (s["lev_r"], s["lev_g"], s["lev_b"])
    u_lobe, ub0, ub1 = s["u_lobe"], s["u_b0"], s["u_b1"]
    u_rr = jax.lax.bitcast_convert_type(s["u_rr_bits"], jnp.float32)
    depth = s["depth"]

    # ---------------- k2 part: NEE shadow sweep + GGX shade + RR ----------
    wo = _vscale(d, -1.0)
    tangent, binormal = _make_onb(ns)
    wo_local = _to_local(tangent, binormal, ns, wo)
    occluded = _occ_sweep(scene_r, box_r, mxu, n_tris, p, ns, shade,
                          wi_l, l_dist, l_eval)
    wi_light_local = _to_local(tangent, binormal, ns, wi_l)
    nee_ok = shade & (~occluded) & (wi_light_local[2] >= 1e-4)
    pdf_bsdf_at_light = _ggx_sample_pdf(wo_local, wi_light_local, rough)
    mis_nee = l_pdf / jnp.maximum(l_pdf + pdf_bsdf_at_light, 1e-4)
    nee_weight = mis_nee / jnp.maximum(l_pdf, 1e-4)

    wi_local = _ggx_sample(wo_local, rough, u_lobe, ub0, ub1)
    pdf_bounce = _ggx_sample_pdf(wo_local, wi_local, rough)
    wi = _to_world(tangent, binormal, ns, wi_local)
    bounce_ok = shade & (_vdot(wi, ng) >= 1e-4) & (wi_local[2] >= 1e-4)
    next_o = _vadd(p, _vscale(ng, 1e-4))

    def shade_fn(d0, d1, d2, rg):
        df = (d0, d1, d2)
        b_nee = _ggx_brdf(wo_local, wi_light_local, df, rg)
        b_bounce = _ggx_brdf(wo_local, wi_local, df, rg)
        return b_nee, b_bounce

    if want_grad:
        (b_nee, b_bounce), vjp = jax.vjp(shade_fn, dif[0], dif[1], dif[2], rough)
    else:
        b_nee, b_bounce = shade_fn(dif[0], dif[1], dif[2], rough)

    inv_pdf = 1.0 / jnp.maximum(pdf_bounce, 1e-9)
    beta_next = tuple(beta[c] * b_bounce[c] * inv_pdf for c in range(3))
    lum = (0.212671 * beta_next[0] + 0.715160 * beta_next[1]
           + 0.072169 * beta_next[2])
    q = jnp.maximum(lum, 0.05)
    do_rr = depth >= rr_depth
    dead = do_rr & ((lum == 0.0) | (u_rr >= q))
    rr_scale = jnp.where(do_rr & ~dead & bounce_ok, 1.0 / q, 1.0)
    path_alive = bounce_ok & ~dead & (depth + 1 < max_depth)
    beta_next = _vscale(beta_next, rr_scale)

    nw = nee_weight
    nee_c = tuple(b_nee[c] * nw * l_eval[c] for c in range(3))
    rad = tuple(
        beta[c] * (add_emit[c] + jnp.where(nee_ok, nee_c[c], 0.0))
        for c in range(3)
    )
    cur = (s["cur_r"] + rad[0], s["cur_g"] + rad[1], s["cur_b"] + rad[2])

    # ---------------- gradient taps (one-walk backward; see path_loop bwd)
    if want_grad:
        lgr, lgg, lgb = (r[:] for r in grad_in)
        le_grad = (lgr, lgg, lgb)
        ct_on_nee = nee_ok
        ct_nee = tuple(
            jnp.where(ct_on_nee, beta[c] * nw * l_eval[c] * le_grad[c], 0.0)
            for c in range(3)
        )
        # P: the le_rem-independent part of the taps
        P0, P1, P2, P3 = vjp((ct_nee, (jnp.zeros_like(lgr),) * 3))
        # unit-bounce-cotangent vjp: dg_dif_j = wiz/pi (all j), dg_rough =
        # 3 * dspec/drough * wiz -> the G-dependent taps become
        #   g_dif_j += G'_j * B_j * (wiz/pi)
        #   g_rough += (sum_c G'_c * B_c) * (dspec/drough * wiz)
        # with B_c the masked le_grad/b_bounce factor (b_bounce_c =
        # (spec + dif_c/pi) * wiz is DIAGONAL in dif)
        ones = jnp.ones_like(lgr)
        zs = jnp.zeros_like(lgr)
        U0, _U1, _U2, U3 = vjp(((zs, zs, zs), (ones, ones, ones)))
        ct_on_b = bounce_ok  # in_grad == lane_live folded via le_grad mask
        B = tuple(
            jnp.where(
                ct_on_b & (b_bounce[c] > 1e-8),
                le_grad[c] / jnp.maximum(b_bounce[c], 1e-8), 0.0,
            )
            for c in range(3)
        )
        Q = tuple(B[c] * U0 for c in range(3))
        Sr = tuple(B[c] * (U3 * (1.0 / 3.0)) for c in range(3))
        # stochastic single-corner splat id from the SAME salt stream as
        # path_fused (smp state after this bounce's draws — i.e. the carried
        # state, which was advanced when these draws were made last round)
        u_splat = lcg_to_unit_float(smp.salt())
        u_m = lcg_to_unit_float(lcg_step(smp.salt()))
        x = s["uv_x"] * (tex_w - 1)
        y = (1.0 - s["uv_y"]) * (tex_h - 1)
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
            u_splat < c0, ya * tex_w + xa,
            jnp.where(
                u_splat < c1, yb * tex_w + xa,
                jnp.where(u_splat < c2, ya * tex_w + xb, yb * tex_w + xb),
            ),
        )
        grad_on = nee_ok | bounce_ok
        ids = jnp.where(grad_on, ids, tex_h * tex_w)

    # -------------- termination / restart bookkeeping --------------------
    # in_flight replaces path_fused's implicit "live lanes always carry a
    # sample": a lane may be idle-with-work when `allow` suppressed its
    # restart (the backward's bounded tap walk) — it restarts on the next
    # allowed iteration without consuming a sample index.
    terminated = in_flight & ~path_alive
    good = ~(jnp.isnan(cur[0]) | jnp.isnan(cur[1]) | jnp.isnan(cur[2]))
    acc = tuple(
        s[f"acc_{c}"] + jnp.where(
            terminated & good,
            jnp.clip(cur[i], 0.0, RADIANCE_CLAMP), 0.0,
        )
        for i, c in enumerate("rgb")
    )
    sample_idx = s["sample_idx"] + terminated.astype(jnp.int32)
    avail = (~in_flight) | terminated
    restart = avail & (sample_idx < stop_idx) & allow

    fresh = _smp_fresh_state(kind, pxp, pyp, seed, sample_idx)
    smp_new = _smp_from_planes(kind, pxp, pyp, seed, spp, fresh, bn_cache)
    (cu0, cu1), smp_new = smp_new._next2_xy()
    cam_o, cam_d = _camera_ray(cam_r, pxp, pyp, cu0, cu1, res, use_tent)

    def sel(a, b, c):  # where(restart, a, where(path_alive, b, c))
        return jnp.where(restart, a, jnp.where(path_alive, b, c))

    o_n = tuple(sel(cam_o[c], next_o[c], p[c]) for c in range(3))
    d_n = tuple(sel(cam_d[c], wi[c], d[c]) for c in range(3))
    new_state = _smp_state(kind, smp_new)
    old_state = _smp_state(kind, smp)
    state_sel = tuple(
        jnp.where(restart, new_state[k], old_state[k]) for k in range(nst)
    )
    smp2 = _smp_from_planes(
        kind, pxp, pyp, seed, spp,
        tuple(x for x in state_sel), bn_cache,
    )
    # restart-from-idle lanes (the backward's bounded walk, and iteration
    # 0) never hit `terminated`, so the per-sample resets key on both
    reset = restart | terminated
    cur_n = tuple(jnp.where(reset, 0.0, cur[c]) for c in range(3))
    beta_n = tuple(
        jnp.where(reset, 1.0,
                  jnp.where(path_alive, beta_next[c], beta[c]))
        for c in range(3)
    )
    pdf_prev = jnp.where(
        terminated, 1e30, jnp.where(path_alive, pdf_bounce, 1e30)
    )
    # non-alive non-restart lanes are idle: pdf value moot
    depth_n = jnp.where(restart | terminated, 0, depth + 1)
    in_flight_n = restart | path_alive
    active_n = in_flight_n

    # -------------- k1 part: next bounce closest trace + interact --------
    k1 = _closest_interact(
        scene_r, box_r, mxu, n_tris, o_n, d_n, pdf_prev, active_n, refs,
    )
    (npx, npy, npz, nux, nuy, nnsx, nnsy, nnsz, nngx, nngy, nngz,
     nshade_i, naer, naeg, naeb, _nmiss) = k1

    # -------------- NEE + bounce draws for the next bounce ---------------
    (nee, smp2) = _nee_select(meta, lp_r, li_r, pp_r, (npx, npy, npz), smp2)
    (nwl, nld, nlp, nlev) = nee
    nu_lobe, smp2 = smp2.next1()
    (nub0, nub1), smp2 = smp2._next2_xy()
    nu_rr, smp2 = smp2.next1()

    out_vals = dict(
        acc_r=acc[0], acc_g=acc[1], acc_b=acc[2],
        cur_r=cur_n[0], cur_g=cur_n[1], cur_b=cur_n[2],
        beta_r=beta_n[0], beta_g=beta_n[1], beta_b=beta_n[2],
        d_x=d_n[0], d_y=d_n[1], d_z=d_n[2],
        p_x=npx, p_y=npy, p_z=npz,
        ns_x=nnsx, ns_y=nnsy, ns_z=nnsz,
        ng_x=nngx, ng_y=nngy, ng_z=nngz,
        ae_r=naer, ae_g=naeg, ae_b=naeb,
        uv_x=nux, uv_y=nuy,
        wl_x=nwl[0], wl_y=nwl[1], wl_z=nwl[2],
        l_dist=nld, l_pdf=nlp,
        lev_r=nlev[0], lev_g=nlev[1], lev_b=nlev[2],
        u_lobe=nu_lobe, u_b0=nub0, u_b1=nub1,
        u_rr_bits=jax.lax.bitcast_convert_type(nu_rr, jnp.int32),
        sample_idx=sample_idx, shade=nshade_i, depth=depth_n,
        in_flight=in_flight_n.astype(jnp.int32),
    )
    final_state = _smp_state(kind, smp2)
    for k in range(nst):
        out_vals[f"smp{k}"] = final_state[k]
    for name, ref in zip(f32_names + i32_names, outs):
        ref[:] = out_vals[name]

    if want_grad:
        # tap planes this iteration: rad (pre-beta? no: full local
        # contribution), P, Q, Sr, ids, flags, u_m
        flags = (
            terminated.astype(jnp.int32)
            | (good.astype(jnp.int32) << 1)
            | (in_flight.astype(jnp.int32) << 2)
        )
        tap_vals = (
            rad[0], rad[1], rad[2],
            P0, P1, P2, P3,
            Q[0], Q[1], Q[2],
            Sr[0], Sr[1], Sr[2],
            u_m,
        )
        for ref, val in zip(tap_outs[:14], tap_vals):
            ref[:] = val
        tap_outs[14][:] = ids
        tap_outs[15][:] = flags


N_TAP_PLANES = 16  # rad3, P4, Q3, S3, u_m, ids, flags


def _occ_sweep(scene_r, box_r, mxu, n_tris, p, ns, shade, wi_l, l_dist,
               l_eval):
    """NEE occlusion: per-triangle fori (dense) or per-row MXU any-sweeps.
    Exactly _shade_kernel's shadow trace, on values (the MXU path slices
    rows of the VALUE planes with static indices)."""
    if mxu is None:
        def occ_body(ti, occ):
            p0 = (scene_r[ti, 0], scene_r[ti, 1], scene_r[ti, 2])
            e1 = (scene_r[ti, 3], scene_r[ti, 4], scene_r[ti, 5])
            e2 = (scene_r[ti, 6], scene_r[ti, 7], scene_r[ti, 8])
            h = _vcross(wi_l, e2)
            a = _vdot(e1, h)
            f = jnp.where(
                jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0
            )
            sv = _vsub(p, p0)
            u = f * _vdot(sv, h)
            qv = _vcross(sv, e1)
            v = f * _vdot(wi_l, qv)
            t = f * _vdot(e2, qv)
            ok = (
                (jnp.abs(a) > 1e-12)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t > 1e-4) & (t < l_dist)
            )
            return occ | ok.astype(jnp.int32)

        occ = jax.lax.fori_loop(
            0, n_tris, occ_body, jnp.zeros_like(p[0], jnp.int32)
        )
        return occ != 0

    t_pad, tile, prec = mxu
    n_tiles = t_pad // tile
    rows = p[0].shape[0]
    ones = jnp.ones((1, LANES), jnp.float32)
    zeros = jnp.zeros((1, LANES), jnp.float32)

    occ_rows = []
    for g in range(rows):
        sl = slice(g, g + 1)  # static within the unrolled python loop
        o_aug = jnp.concatenate(
            [p[0][sl], p[1][sl], p[2][sl], ones], axis=0
        )
        d_aug = jnp.concatenate(
            [wi_l[0][sl], wi_l[1][sl], wi_l[2][sl], zeros], axis=0
        )
        ev_on = (
            (l_eval[0][sl] != 0.0) | (l_eval[1][sl] != 0.0)
            | (l_eval[2][sl] != 0.0)
        )
        wl_row = (wi_l[0][sl], wi_l[1][sl], wi_l[2][sl])
        ns_row = (ns[0][sl], ns[1][sl], ns[2][sl])
        act = shade[sl] & ev_on & (_vdot(wl_row, ns_row) >= 1e-4)
        occ_rows.append(_mxu_sweep_row(
            scene_r, box_r, tile, n_tiles, o_aug, d_aug, 1e-4,
            l_dist[sl], "any", prec=prec, active=act,
        ))
    return jnp.concatenate(occ_rows, axis=0)


def _closest_interact(scene_r, box_r, mxu, n_tris, o, d, pdf_prev, active,
                      refs):
    """kernel-1 on values: closest sweep + interact epilogue. Dense scenes
    run the per-triangle fori on the whole block; MXU scenes unroll a
    python loop over the block's rows (slicing values at static offsets)."""
    if mxu is None:
        t_min = jnp.zeros_like(o[0])

        def mt_body(ti, carry):
            best_t, best_u, best_v, best_prim = carry
            p0 = (scene_r[ti, 0], scene_r[ti, 1], scene_r[ti, 2])
            e1 = (scene_r[ti, 3], scene_r[ti, 4], scene_r[ti, 5])
            e2 = (scene_r[ti, 6], scene_r[ti, 7], scene_r[ti, 8])
            h = _vcross(d, e2)
            a = _vdot(e1, h)
            f = jnp.where(
                jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0
            )
            sv = _vsub(o, p0)
            u = f * _vdot(sv, h)
            qv = _vcross(sv, e1)
            v = f * _vdot(d, qv)
            t = f * _vdot(e2, qv)
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

        def attr_body(ti, carry):
            m = prim == ti
            vals = [
                jnp.where(m, scene_r[ti, 9 + k], carry[k]) for k in range(22)
            ]
            return tuple(vals)

        a0 = tuple(jnp.zeros_like(o[0]) for _ in range(22))
        av = jax.lax.fori_loop(0, n_tris, attr_body, a0)
        return _interact_epilogue(o, d, pdf_prev, active, best_t, bu, bv,
                                  miss, av)

    t_pad, tile, prec = mxu
    n_tiles = t_pad // tile
    rows = o[0].shape[0]
    ones = jnp.ones((1, LANES), jnp.float32)
    zeros = jnp.zeros((1, LANES), jnp.float32)
    out_rows = []
    for g in range(rows):
        sl = slice(g, g + 1)
        o_row = tuple(o[c][sl] for c in range(3))
        d_row = tuple(d[c][sl] for c in range(3))
        o_aug = jnp.concatenate([*o_row, ones], axis=0)
        d_aug = jnp.concatenate([*d_row, zeros], axis=0)
        act = active[sl]
        miss, prim = _mxu_sweep_row(
            scene_r, box_r, tile, n_tiles, o_aug, d_aug, 0.0, None,
            "closest", prec=prec, active=act,
        )
        gat = _mxu_gather_rows(
            scene_r, GAT_GATHER_LO, _gat_rows(), tile, n_tiles, prim, miss
        )
        t_win, bu, bv = _mt_rederive(gat, o_row, d_row, miss)
        av = tuple(gat[16 + k: 17 + k] for k in range(15)) + tuple(
            gat[9 + k: 10 + k] for k in range(7)
        )
        out_rows.append(_interact_epilogue(
            o_row, d_row, pdf_prev[sl], act,
            jnp.where(miss, 1e30, t_win), bu, bv, miss, av,
        ))
    return tuple(
        jnp.concatenate([r[k] for r in out_rows], axis=0) for k in range(16)
    )


# ------------------------------------------------------------ host wrapper

def _ray_spec():
    return pl.BlockSpec(
        (LOOP_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )


def _const_spec(shape):
    return pl.BlockSpec(
        shape, (lambda i: tuple(0 for _ in shape)), memory_space=pltpu.VMEM
    )


def _bn_spec(shape):
    return pl.BlockSpec(
        (shape[0], LOOP_BLOCK_ROWS, LANES),
        lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )


def loop_rows(n_pix: int) -> int:
    r = -(-n_pix // LANES)
    return -(-r // LOOP_BLOCK_ROWS) * LOOP_BLOCK_ROWS


def _loop_setup(data, material, cfg, coords, it_start):
    """Tables, planes and static config for the loop kernel (path_fused.
    _setup analog; no stream pack — loop scope is dense scenes only)."""
    if getattr(cfg, "lane_order", "morton") == "morton":
        perm, inv = spatial_lane_perm(coords)
        coords = coords[perm]
    else:
        perm = inv = None
    meta = data.fused_meta
    scene_pack, light_pack = build_fused_const(data, meta)
    woop = (
        build_woop_pack(scene_pack) if meta.num_tris >= MXU_MIN_TRIS else None
    )
    import numpy as np

    if meta.n_lights > 0:
        offs = np.asarray(meta.light_offsets, np.float32)
        tcs = np.asarray(meta.light_tcs, np.float32)
        li = jnp.asarray(np.stack([offs, tcs], axis=1))
    else:
        li = jnp.zeros((1, 2), jnp.float32)
    li = jnp.pad(li, ((0, 0), (0, 8 - li.shape[1])))
    if meta.n_point > 0:
        pp = jnp.concatenate(
            [
                data.point_pos[: meta.n_point].astype(jnp.float32),
                data.point_intensity[: meta.n_point].astype(jnp.float32),
                jnp.zeros((meta.n_point, 2), jnp.float32),
            ],
            axis=1,
        )
    else:
        pp = jnp.zeros((1, 8), jnp.float32)
    packed = pack_quads_cfg(material, cfg)
    n_pix = coords.shape[0]
    rows = loop_rows(n_pix)
    pxp = pad_to_planes(coords[:, 0], rows)
    pyp = pad_to_planes(coords[:, 1], rows)
    win_start = jnp.asarray(it_start, jnp.int32)
    win_count = cfg.window_count
    real = pad_to_planes(jnp.ones((n_pix,), jnp.int32), rows) != 0
    start_idx = jnp.zeros((rows, LANES), jnp.int32) + win_start
    stop_idx = jnp.where(real, win_start + win_count, win_start)
    return (meta, scene_pack, light_pack, li, pp, packed, rows, pxp, pyp,
            real, start_idx, stop_idx, woop, (perm, inv))


def pack_quads_cfg(material, cfg):
    from ..texture import pack_quads

    return pack_quads(material, getattr(cfg, "texture_bf16", False))


def _call_loop_kernel(
    kind, spp, res, use_tent, n_tris, rr_d, md, h, w, meta, woop,
    scene_pack, light_pack, li, pp, cam_c, bn, pxp, pyp, seed_pl, stop_idx,
    allow, mats, carry, interp, le_grad=None,
):
    rows = pxp.shape[0]
    grid = (rows // LOOP_BLOCK_ROWS,)
    want_grad = le_grad is not None
    if woop is not None:
        gat_t, box_t, t_pad, tile = woop
        prec = "highest" if interp else MXU_PRECISION
        mxu = (t_pad, tile, prec)
        tables = [gat_t, box_t]
        t_specs = [_const_spec(gat_t.shape), _const_spec(box_t.shape)]
    else:
        mxu = None
        tables = [scene_pack]
        t_specs = [_const_spec(scene_pack.shape)]
    tables += [light_pack, li, pp, cam_c]
    t_specs += [
        _const_spec(light_pack.shape), _const_spec(li.shape),
        _const_spec(pp.shape), _const_spec(cam_c.shape),
    ]
    n_bn = 0
    if bn is not None:
        tables.append(bn)
        t_specs.append(_bn_spec(bn.shape))
        n_bn = bn.shape[0]
    f32_names, i32_names = _carry_layout(kind)
    n_carry = len(f32_names) + len(i32_names)
    assert len(carry) == n_carry
    inputs = (
        tables + [pxp, pyp, seed_pl, stop_idx, allow] + list(mats)
        + list(carry)
    )
    in_specs = t_specs + [_ray_spec()] * (5 + 4 + n_carry)
    if want_grad:
        inputs += list(le_grad)
        in_specs += [_ray_spec()] * 3
    f32 = jnp.float32
    i32 = jnp.int32
    shp = (rows, LANES)
    out_shape = (
        [jax.ShapeDtypeStruct(shp, f32)] * len(f32_names)
        + [jax.ShapeDtypeStruct(shp, i32)] * len(i32_names)
    )
    if want_grad:
        out_shape += (
            [jax.ShapeDtypeStruct(shp, f32)] * (N_TAP_PLANES - 2)
            + [jax.ShapeDtypeStruct(shp, i32)] * 2
        )
    kernel = functools.partial(
        _loop_kernel_entry, kind, spp, res, use_tent, n_tris, rr_d, md,
        h, w, meta, mxu, n_bn, want_grad,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[_ray_spec()] * len(out_shape),
        out_shape=out_shape,
        interpret=interp,
    )(*inputs)
    carry_out = tuple(outs[:n_carry])
    taps = tuple(outs[n_carry:]) if want_grad else None
    return carry_out, taps


def _loop_kernel_entry(kind, spp, res, use_tent, n_tris, rr_d, md, h, w,
                       meta, mxu, n_bn, want_grad, *refs):
    _loop_kernel(
        kind=kind, spp=spp, res=res, use_tent=use_tent, n_tris=n_tris,
        rr_depth=rr_d, max_depth=md, tex_h=h, tex_w=w, meta=meta, mxu=mxu,
        n_bn=n_bn, want_grad=want_grad, refs=refs,
    )


def _init_carry(kind, rows, start_idx, stop_idx, real):
    """Initial carry: no lane is in flight, so the kernel's own
    `avail & sample_idx < stop` restart path draws every first camera ray
    in iteration 0 — no separate prologue program."""
    zeros = jnp.zeros((rows, LANES), jnp.float32)
    zi = jnp.zeros((rows, LANES), jnp.int32)
    f32_names, i32_names = _carry_layout(kind)
    vals = {n: zeros for n in f32_names}
    vals.update({n: zi for n in i32_names})
    vals["sample_idx"] = jnp.where(real, start_idx, stop_idx)
    vals["l_pdf"] = zeros + 1.0
    return tuple(vals[n] for n in f32_names + i32_names)


def _carry_get(kind, carry, name):
    f32_names, i32_names = _carry_layout(kind)
    return carry[(f32_names + i32_names).index(name)]


def render_path_loop(
    data: SceneData, material, camera, seed, cfg, coords, it_start=0
):
    """Megakernel-loop forward: spp-averaged radiance -> (n_pix, 3)."""
    (meta, scene_pack, light_pack, li, pp, packed, rows, pxp, pyp, real,
     start_idx, stop_idx, woop, (_perm, inv)) = _loop_setup(
        data, material, cfg, coords, it_start)
    n_pix = coords.shape[0]
    h, w = material.shape[0], material.shape[1]
    md, rr_d = _depths(cfg)
    win_count = cfg.window_count
    interp = jax.default_backend() == "cpu"
    kind = cfg.sampler
    cam_c = camera_const(camera)
    seed_pl = jnp.zeros((rows, LANES), jnp.int32) + jnp.asarray(seed, jnp.int32)
    if kind == "pmj02bn":
        from ..samplers.pmj02bn import _build_bn_cache

        bn = _build_bn_cache(pxp, pyp, jnp.asarray(seed, jnp.uint32))
    else:
        bn = None

    carry0 = _init_carry(kind, rows, start_idx, stop_idx, real)
    max_iters = (win_count + 1) * md + md

    def cond(state):
        it, carry = state
        si = _carry_get(kind, carry, "sample_idx")
        return jnp.any(si < stop_idx) & (it < max_iters)

    allow = jnp.ones((rows, LANES), jnp.int32)

    def body(state):
        it, carry = state
        uvx = _carry_get(kind, carry, "uv_x")
        uvy = _carry_get(kind, carry, "uv_y")
        mats = read_quads_planes(uvx, uvy, packed, h, w)
        carry, _ = _call_loop_kernel(
            kind, cfg.spp, cfg.res, cfg.use_tent_filter, meta.num_tris,
            rr_d, md, h, w, meta, woop, scene_pack, light_pack, li, pp,
            cam_c, bn, pxp, pyp, seed_pl, stop_idx, allow, mats, carry,
            interp,
        )
        return it + 1, carry

    _, out = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), carry0))
    acc = jnp.stack(
        [_carry_get(kind, out, f"acc_{c}").reshape(-1)[:n_pix] for c in "rgb"],
        axis=-1,
    )
    if inv is not None:
        acc = acc[inv]
    return acc / win_count


# --------------------------------------------------- one-walk PRB backward

# cap on stored tap-walk iterations per outer pass. Each pass stores
# N_TAP_PLANES (rows, LANES) planes per iteration (~16 MB/iter at 512^2);
# 256 covers a full 64-spp window's ~225 actual iterations in one pass
# (lanes stop STARTING samples at S_cap - max_depth, so every stored
# sample is complete; an outer while resumes the rare overflow).
LOOP_TAP_CAP = 256


def render_path_backward_loop(
    data: SceneData, material, camera, seed, cfg, coords, le_grad, it_start=0
):
    """One-walk PRB backward on the megakernel loop -> d_material (H, W, 4).

    The 2-walk fused backward (path_fused.render_path_backward_fused)
    replays every sample once for its total radiance (phase 0) and
    re-walks it for the gradient taps (phase 1) because the continuation
    adjoint needs the REMAINING-path radiance, which is only known after
    the walk. Here the walk runs ONCE, storing per-iteration tap
    ingredients whose only missing factor is that suffix radiance:

      tap_dif_j  = P_j + G'_j * Q_j
      tap_rough  = P_rough + sum_c G'_c * S_c

    P = the le_rem-independent vjp part (NEE cotangent), and Q/S exploit
    that b_bounce_c = (spec + dif_c/pi) * wi_z is DIAGONAL in dif and its
    roughness derivative is channel-independent, so the bounce cotangent
    ct_c = G'_c * le_grad_c / b_bounce_c contributes linearly through two
    per-lane factors. G'[it] = where(terminated, 0, G[it+1]) with
    G[it] = rad[it] + where(terminated, 0, G[it+1]) is a reverse scan over
    the stored per-iteration radiance — exactly the le_rem bookkeeping of
    the interleaved walk, evaluated after the fact. The post-pass then
    reservoir-merges and flushes taps through the same splat pipeline.

    Same sample stream, same splat salts, same tap values as the 2-walk
    backward (merge pairings differ at splat_merge > 1 — both unbiased);
    iteration count halves, so bwd cost ~= fwd cost + the flush.
    """
    from ..texture import (
        cm_to_texture,
        reservoir_merge_taps,
        segment_scatter_add4,
    )

    (meta, scene_pack, light_pack, li, pp, packed, rows, pxp, pyp, real,
     start_idx, stop_idx, woop, (perm, _inv)) = _loop_setup(
        data, material, cfg, coords, it_start)
    n_pix = coords.shape[0]
    h, w = material.shape[0], material.shape[1]
    n_bins = h * w
    md, rr_d = _depths(cfg)
    win_count = cfg.window_count
    interp = jax.default_backend() == "cpu"
    kind = cfg.sampler
    material = jax.lax.stop_gradient(material)
    cam_c = camera_const(camera)
    seed_pl = jnp.zeros((rows, LANES), jnp.int32) + jnp.asarray(seed, jnp.int32)
    if kind == "pmj02bn":
        from ..samplers.pmj02bn import _build_bn_cache

        bn = _build_bn_cache(pxp, pyp, jnp.asarray(seed, jnp.uint32))
    else:
        bn = None

    if perm is not None:
        le_grad = le_grad[perm]
    lg = tuple(pad_to_planes(le_grad[:, c], rows) for c in range(3))

    max_iters = (win_count + 1) * md + md
    merge = max(1, int(cfg.splat_merge))
    # merge groups reshape the tap store: keep its length a group multiple
    s_cap = -(-min(max_iters, LOOP_TAP_CAP) // merge) * merge

    carry0 = _init_carry(kind, rows, start_idx, stop_idx, real)
    taps0 = (
        [jnp.zeros((s_cap, rows, LANES), jnp.float32)] * (N_TAP_PLANES - 2)
        + [jnp.zeros((s_cap, rows, LANES), jnp.int32)] * 2
    )

    def inner_cond(st):
        it, carry, _taps = st
        in_flight = _carry_get(kind, carry, "in_flight")
        return ((it == 0) | jnp.any(in_flight != 0)) & (it < s_cap)

    def inner_body(st):
        it, carry, taps = st
        allow = jnp.broadcast_to(
            (it < s_cap - md).astype(jnp.int32), (rows, LANES)
        )
        uvx = _carry_get(kind, carry, "uv_x")
        uvy = _carry_get(kind, carry, "uv_y")
        mats = read_quads_planes(uvx, uvy, packed, h, w)
        carry, tap_planes = _call_loop_kernel(
            kind, cfg.spp, cfg.res, cfg.use_tent_filter, meta.num_tris,
            rr_d, md, h, w, meta, woop, scene_pack, light_pack, li, pp,
            cam_c, bn, pxp, pyp, seed_pl, stop_idx, allow, mats, carry,
            interp, le_grad=lg,
        )
        taps = [
            jax.lax.dynamic_update_index_in_dim(b, p, it, 0)
            for b, p in zip(taps, tap_planes)
        ]
        return it + 1, carry, taps

    def post_pass(n_inner, taps, d_mat):
        """Vectorized tap finalize: segmented reverse associative scans
        recover the per-iteration suffix radiance G' and the sample's
        NaN-ok flag over the WHOLE (s_cap, rows, LANES) tap store at once,
        the tap algebra is elementwise, merge groups fold statically, and
        one sort-based scatter drains everything. No serial per-iteration
        loop: a fori/scan post-pass measured ~4x slower whenever the
        backward shared an XLA program with another large computation
        (the jit(value_and_grad) user path), while the parallel form is
        schedule-robust — and faster outright."""
        (rad_r, rad_g, rad_b, p0, p1, p2, p3, q0, q1, q2,
         s0, s1, s2, u_m) = taps[:14]
        ids_raw, flags = taps[14], taps[15]
        its = jnp.arange(s_cap, dtype=jnp.int32)
        valid = (its < n_inner)[:, None, None]
        term = ((flags & 1) != 0) & valid
        good = (flags & 2) != 0

        # associative_scan(reverse=True) flips, scans forward, flips back:
        # the LEFT operand aggregates the LATER elements and the current
        # element joins on the RIGHT — so the segmented operators are the
        # mirror of their forward form (b = the earlier/current element)
        def seg_sum(a, b):
            (va, fa), (vb, fb) = a, b
            return (jnp.where(fb, vb, vb + va), fa | fb)

        def seg_first(a, b):
            (va, fa), (vb, fb) = a, b
            return (jnp.where(fb, vb, va), fa | fb)

        # G[it] = rad[it] + (term[it] ? 0 : G[it+1]); G'[it] = the suffix
        # AFTER it = where(term, 0, G[it+1]) — taken from the shifted scan
        # result (no subtraction: bit-matches the sequential bookkeeping)
        gp = []
        for rad in (rad_r, rad_g, rad_b):
            g, _ = jax.lax.associative_scan(
                seg_sum, (rad, term), axis=0, reverse=True
            )
            g_next = jnp.concatenate(
                [g[1:], jnp.zeros_like(g[:1])], axis=0
            )
            gp.append(jnp.where(term, 0.0, g_next))
        okv, okf = jax.lax.associative_scan(
            seg_first, (good & term, term), axis=0, reverse=True
        )
        ok = jnp.where(term, good, okv | ~okf)  # no later term: keep taps

        g0 = p0 + gp[0] * q0
        g1 = p1 + gp[1] * q1
        g2 = p2 + gp[2] * q2
        g3 = p3 + gp[0] * s0 + gp[1] * s1 + gp[2] * s2
        gs = [jnp.where(ok & ~jnp.isnan(g), g, 0.0)
              for g in (g0, g1, g2, g3)]
        ids = jnp.where(valid, ids_raw, n_bins)

        # reservoir-merge groups of `merge` consecutive iterations
        # (ascending — shard-count-invariant), as a static fold with the
        # stored per-iteration u_m draws: identical algebra to the
        # sequential pend carry
        if merge > 1:
            ng = s_cap // merge

            def grp(x):
                return x.reshape(ng, merge, rows, LANES)

            gi, gg0, gg1, gg2, gg3, gu = (
                grp(ids), grp(gs[0]), grp(gs[1]), grp(gs[2]), grp(gs[3]),
                grp(u_m),
            )
            cur = (gi[:, 0], gg0[:, 0], gg1[:, 0], gg2[:, 0], gg3[:, 0])
            for j in range(1, merge):
                cur = reservoir_merge_taps(
                    cur, (gi[:, j], gg0[:, j], gg1[:, j], gg2[:, j],
                          gg3[:, j]),
                    gu[:, j], n_bins,
                )
            out_ids, o0, o1, o2, o3 = cur
        else:
            out_ids, o0, o1, o2, o3 = ids, gs[0], gs[1], gs[2], gs[3]

        add = segment_scatter_add4(
            out_ids.reshape(-1),
            [o0.reshape(-1), o1.reshape(-1), o2.reshape(-1), o3.reshape(-1)],
            n_bins, packed=cfg.packed_splat,
        )
        return d_mat + add

    def outer_cond(st):
        carry = st[1]
        si = _carry_get(kind, carry, "sample_idx")
        return jnp.any(si < stop_idx) & (st[0] < max_iters)

    def outer_body(st):
        # the tap store is PASS-LOCAL (fully drained by post_pass), so it
        # must not ride the outer carry: carrying the multi-GB buffers
        # through the resume loop measured ~4x slower on the whole
        # backward whenever it shared a program with another computation
        it_o, carry, d_mat = st
        n_inner, carry, taps = jax.lax.while_loop(
            inner_cond, inner_body, (jnp.zeros((), jnp.int32), carry, taps0)
        )
        d_mat = post_pass(n_inner, taps, d_mat)
        return (it_o + n_inner, carry, d_mat)

    st = (
        jnp.zeros((), jnp.int32), carry0,
        jnp.zeros((4, n_bins), material.dtype),
    )
    st = jax.lax.while_loop(outer_cond, outer_body, st)
    return cm_to_texture(st[2], h, w)
