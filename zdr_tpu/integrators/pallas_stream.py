"""HBM-streamed MXU trace for big meshes — the TPU-native replacement for
the reference's hardware BVH traversal at scene sizes past the VMEM cap
(reference: luisa.Accel / OptiX RT cores, render.py:74,109 and kernel
call sites collocated.py:16, direct.py:22,67).

The VMEM-resident Woop sweep (pallas_bounce.build_woop_pack +
_mxu_sweep_row) is limited to FUSED_MAX_TRIS triangles by the 16 MB VMEM
budget. This module lifts that cap by streaming the same gat table from
HBM in chunk-sized slices over a second (innermost) grid axis:

    grid = (ray_blocks, chunk_steps)    # chunk axis fastest, sequential
    gat chunk   : BlockSpec((48, CHUNK), (i, c) -> (0, order[i, c]))
    ray planes  : BlockSpec((32, 512),   (i, c) -> (i, 0))  [resident]
    key/prim out: BlockSpec((32, 512),   (i, c) -> (i, 0))  [revisited]

The chunk axis is REMAPPED per ray block through scalar-prefetched
indices: an XLA "sweep plan" (conservative interval slab tests of each
512-lane row's frustum against every tile AABB — see _plan_sweep) sorts
each block's reachable chunks front-to-back and hands every row a sorted
per-chunk tile WORKLIST packed as (tmin_lb bits | tile id) keys. The
kernel walks worklists in t order and breaks as soon as a tile's
conservative entry t exceeds every active lane's current-best-t upper
bound (bit-exact; pallas_bounce._key_t_upper), with per-lane scene-exit
caps bounding lanes that never hit. Each visited tile still runs the
per-lane t-capped slab test before any MXU work, and each swept tile
folds its packed argmin key into the revisited output block — the
classic matmul-K-accumulation pattern, with min instead of add.
Triangles are pre-sorted by Morton code so tiles stay spatially tight
and worklists stay short for coherent ray rows.

The winner's attributes are NOT gathered in-kernel (the winning chunk's
slice is long gone by the last grid step): the epilogue instead does one
XLA row-gather of the (Morton-sorted) scene table by winning prim and
re-derives t/u/v with exact f32 Möller–Trumbore in plane layout —
`_interact_epilogue` is plane-shape-generic, so kernel-1 parity costs a
page of glue. Occlusion (trace_any) streams the same way with an
early-exit: once a revisited occ block is all-ones, remaining chunk
steps for that ray block reduce to a skipped @pl.when body.

Cost model: streaming re-reads the gat table once per ray block
(n_ray_blocks x 192 B/tri). At 66k tris and 2048 ray rows that is
16 x 12.7 MB ≈ 0.25 ms of HBM traffic — noise against the sweep math.
The stackless BVH (accel/trace.py) remains for the unfused path and CPU;
measured against it this sweep wins by an order of magnitude at 66k tris
(BASELINE.md round-3 big-mesh table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_bounce import (
    BLOCK_ROWS,
    LANES,
    MXU_PRECISION,
    MXU_TILE,
    _gat_rows,
    _interact_epilogue,
    _mxu_sweep_row,
    _ray_spec,
    _vcross,
    _vdot,
    _vsub,
    build_woop_pack,
)

# Scenes up to this many triangles are eligible for the streamed fused
# path (the cap is a sanity bound on HBM table size — 1M tris ≈ 190 MB).
STREAM_MAX_TRIS = 1 << 20
# Triangles per streamed chunk: 48 rows x 8192 x 4 B = 1.5 MB VMEM per
# buffer (double-buffered by the pipeline), leaving plenty for ray planes.
STREAM_CHUNK = 8192
# Below this padded triangle count the whole gat table fits in VMEM
# alongside the trace kernel's ray planes (192 B/tri; ~11 MB at the cap),
# so the pack uses ONE chunk: the worklist becomes a single globally
# t-sorted list and the front-to-back break reaches its full power
# (multi-chunk packs restart the t order at every chunk boundary).
STREAM_ONECHUNK_TRIS = 57344

_BIG_KEY = 0x7F800000  # +inf bit pattern, > any packed key (python int:
# a module-level jnp scalar would be a captured constant inside pallas)


def _morton3(q):
    """(T, 3) uint32 quantized coords -> (T,) uint32 Morton codes (10b/axis)."""
    def spread(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def build_stream_pack(scene_pack, chunk=None, tile=None):
    """Morton-sort the scene table and build the streamed Woop tables.

    Returns (gat, boxes, t_pad, tile, chunk, sorted_pack, order):
      gat    (48, t_pad) f32, t_pad a multiple of `chunk` (HBM resident)
      boxes  (n_tiles, 8) f32 per-tile AABBs (n_tiles multiple of
             chunk//tile; padded tiles carry inverted boxes)
      sorted_pack (t_pad, 32) the Morton-ordered scene table the XLA
             epilogue gathers winner attributes from (prim ids produced
             by the streamed sweep index THIS table, not the original).
      order  (t_pad,) i32 Morton index -> input-order triangle index
             (identity past the real count).
    """
    t_n = scene_pack.shape[0]
    tile = int(tile or MXU_TILE)
    auto_chunk = chunk is None
    chunk = max(int(chunk or STREAM_CHUNK), tile)
    if chunk % tile:
        chunk = -(-chunk // tile) * tile

    # Morton order over triangle centroids: tiles become spatially tight,
    # so the per-tile AABB slab tests cull most tiles for coherent rows.
    p0 = scene_pack[:, 0:3]
    cent = p0 + (scene_pack[:, 3:6] + scene_pack[:, 6:9]) / 3.0
    lo = jnp.min(cent, axis=0)
    span = jnp.maximum(jnp.max(cent, axis=0) - lo, 1e-20)
    q = ((cent - lo) / span * 1023.0).astype(jnp.uint32)
    order = jnp.argsort(_morton3(q))
    sorted_pack = scene_pack[order]

    gat, boxes, t_pad, tile = build_woop_pack(sorted_pack, tile=tile)
    # round t_pad up to a chunk multiple; padded triangles have all-zero
    # woop rows (dw == 0 -> rejected) and inverted AABBs (never slab-hit)
    if auto_chunk and t_pad <= STREAM_ONECHUNK_TRIS:
        chunk = t_pad  # VMEM-resident single chunk: global worklist order
    chunk = min(chunk, t_pad)  # small scenes: one chunk, no pad blowup
    t_full = -(-t_pad // chunk) * chunk
    if t_full != t_pad:
        gat = jnp.pad(gat, ((0, 0), (0, t_full - t_pad)))
    n_tiles = t_full // tile
    bpad = n_tiles - boxes.shape[0]
    if bpad > 0:
        empty = jnp.zeros((bpad, 8), jnp.float32)
        empty = empty.at[:, 0:3].set(1e30).at[:, 3:6].set(-1e30)
        boxes = jnp.concatenate([boxes, empty], axis=0)
    else:
        boxes = boxes[:n_tiles]
    if sorted_pack.shape[0] != t_full:
        sorted_pack = jnp.pad(
            sorted_pack, ((0, t_full - sorted_pack.shape[0]), (0, 0))
        )
    order = jnp.concatenate(
        [order.astype(jnp.int32), jnp.arange(t_n, t_full, dtype=jnp.int32)]
    )
    return gat, boxes, t_full, tile, chunk, sorted_pack, order


# ------------------------------------------------------------- kernels
#
# Round-4 design: per-row sorted tile WORKLISTS + front-to-back early
# breaks, fed by an XLA "sweep plan" computed from conservative per-row
# ray frusta (interval arithmetic over each 512-lane row's origin and
# direction bounds):
#
#   plan (XLA, per sweep call):
#     * per (row, tile): conservative slab interval -> candidate? + a
#       LOWER bound on the slab entry t (tmin_lb)
#     * per (row, chunk): candidate tiles packed as sorted i32 keys
#       (tmin_lb bits | local tile id) -> the kernel visits tiles in
#       front-to-back order and STOPS once tmin_lb exceeds every active
#       lane's current-best-t upper bound (bit-exact: a candidate behind
#       every lane's bound can only produce strictly worse argmin keys,
#       see pallas_bounce._key_t_upper)
#     * per (block, chunk): chunk visit ORDER sorted by the block's
#       conservative chunk tmin + a chunk count -> the grid's chunk axis
#       is remapped through scalar-prefetched indices, so each ray block
#       streams only the chunks it can reach, nearest first, and whole
#       grid steps skip once the block's best-t beats the chunk bound.
#
# Against the round-3 kernel (every ray block swept every chunk, every
# row tested every tile): the unculled cost at 50,880 tris / 262k
# coherent rays measured 586 ms; per-tile AABB tests + per-lane t caps
# brought it to 185 ms; the worklist + break design is the next level of
# the same hierarchy.

# Break cap for active lanes that have not hit anything yet (their true
# cap is the scene-exit distance, refined per lane in-kernel).
_CAP_NOHIT = 1e28
# Sorted-worklist sentinel: above every packed candidate key (tmin_lb is
# clamped to [0, 1e28] before packing).
_WL_SENT = 0x7F7FFFFF
# Low bits of a worklist key carry the local tile id (9 bits, like the
# in-tile argmin packing: tiles/chunk <= 512 — the single-chunk mode's
# 448 fits). Worklist rows are padded to a 128-lane multiple >= tpc, so
# a worklist can never overflow.
_WL_IDX_BITS = 0x1FF


def _wl_width(tpc: int) -> int:
    if tpc > _WL_IDX_BITS + 1:
        raise ValueError(f"tiles/chunk {tpc} exceeds worklist id capacity")
    return -(-tpc // 128) * 128


def _plan_sweep(boxes, tile: int, chunk: int, o3, d3, act, t_hi=None):
    """XLA sweep plan from conservative per-row frusta.

    boxes: (n_tiles, 8) per-tile AABBs (pad tiles inverted). o3/d3: ray
    component planes (rows, LANES); act: (rows, LANES) i32. t_hi: optional
    per-lane max distance (occlusion sweeps) — tiles past every active
    lane's t_hi are not candidates.

    Returns (order, cnt, ctmin, wl, sbox):
      order (n_blocks, C) i32 — chunk visit order, front-to-back by the
            block's conservative chunk tmin; tail entries clamp to the
            last real chunk so the pipeline re-uses its DMA.
      cnt   (n_blocks,) i32 — chunks this block actually visits.
      ctmin (n_blocks, C) i32 — f32 bits of each visited chunk's
            conservative tmin (sorted ascending; block-level break key).
      wl    (rows, C * 128) i32 — per (row, chunk) sorted packed keys
            (tmin_lb bits & ~0x7F) | local_tile_id; _WL_SENT padded.
      sbox  (8, 128) f32 — scene AABB in [0, 0:6] (per-lane exit caps).
    """
    rows = o3[0].shape[0]
    nb = rows // BLOCK_ROWS
    n_tiles = boxes.shape[0]
    tpc = chunk // tile
    C = n_tiles // tpc
    width = _wl_width(tpc)
    if C > 256:
        raise ValueError(f"chunk count {C} exceeds order-key capacity")
    f32, i32 = jnp.float32, jnp.int32
    on = act != 0
    big = jnp.float32(1e30)

    def r_lo(x):
        return jnp.min(jnp.where(on, x, big), axis=1)

    def r_hi(x):
        return jnp.max(jnp.where(on, x, -big), axis=1)

    o_lo = [r_lo(o3[k]) for k in range(3)]
    o_hi = [r_hi(o3[k]) for k in range(3)]
    d_lo = [r_lo(d3[k]) for k in range(3)]
    d_hi = [r_hi(d3[k]) for k in range(3)]

    lo = boxes[:, 0:3]
    hi = boxes[:, 3:6]
    tmin_lb = jnp.zeros((rows, n_tiles), f32)
    tmax_ub = jnp.full((rows, n_tiles), big, f32)
    for k in range(3):
        e = (lo[None, :, k], hi[None, :, k])
        oo = (o_lo[k][:, None], o_hi[k][:, None])
        dl, dh = d_lo[k], d_hi[k]
        i1 = (1.0 / jnp.where(dl == 0, 1e-20, dl))[:, None]
        i2 = (1.0 / jnp.where(dh == 0, 1e-20, dh))[:, None]
        ax_lo = jnp.full((rows, n_tiles), big, f32)
        ax_hi = -ax_lo
        for edge in e:
            for oe in oo:
                a = edge - oe
                for inv in (i1, i2):
                    p = a * inv
                    ax_lo = jnp.minimum(ax_lo, p)
                    ax_hi = jnp.maximum(ax_hi, p)
        span0 = ((dl <= 0) & (dh >= 0))[:, None]
        ax_lo = jnp.where(span0, -big, ax_lo)
        ax_hi = jnp.where(span0, big, ax_hi)
        tmin_lb = jnp.maximum(tmin_lb, ax_lo)
        tmax_ub = jnp.minimum(tmax_ub, ax_hi)

        # tighter per-axis ENTRY lower bound via direction-sign subgroups
        # (the plain interval bound collapses to -inf when the row's d_k
        # spans 0, which loses exactly the depth-axis constraint that
        # separates front tiles from back tiles — measured: fully-hit
        # rows break at ~42 instead of ~63 candidates with this bound).
        # Positive-d lanes enter the slab no earlier than
        # (lo_k - max o_k)/max d_k; negative-d lanes no earlier than
        # (min o_k - hi_k)/|min d_k|; zero-d lanes either sit inside the
        # slab (bound 0) or can never enter it (bound +inf).
        dk = d3[k]
        pos = on & (dk > 0)
        neg = on & (dk < 0)
        zer = on & (dk == 0)
        pd_hi = jnp.max(jnp.where(pos, dk, 0.0), axis=1)
        nd_lo = jnp.min(jnp.where(neg, dk, 0.0), axis=1)
        has_p = jnp.any(pos, axis=1)[:, None]
        has_n = jnp.any(neg, axis=1)[:, None]
        has_z = jnp.any(zer, axis=1)[:, None]
        bl, bh = lo[None, :, k], hi[None, :, k]
        # computed bounds clamp below `big` so `axis_lb >= big` can only
        # arise from subgroup ABSENCE (the one case that proves exclusion)
        num_p = jnp.maximum(bl - o_hi[k][:, None], 0.0)
        lb_p = jnp.where(
            has_p,
            jnp.minimum(num_p / jnp.maximum(pd_hi, 1e-30)[:, None], 1e29),
            big,
        )
        num_n = jnp.maximum(o_lo[k][:, None] - bh, 0.0)
        lb_n = jnp.where(
            has_n,
            jnp.minimum(num_n / jnp.maximum(-nd_lo, 1e-30)[:, None], 1e29),
            big,
        )
        inside = (o_hi[k][:, None] >= bl) & (o_lo[k][:, None] <= bh)
        lb_z = jnp.where(has_z & inside, 0.0, big)
        axis_lb = jnp.minimum(jnp.minimum(lb_p, lb_n), lb_z)
        # axis_lb == big means NO lane can ever enter this slab: exclude
        tmax_ub = jnp.where(axis_lb >= big, -big, tmax_ub)
        tmin_lb = jnp.maximum(tmin_lb, jnp.where(axis_lb >= big, 0.0,
                                                 axis_lb))
    hit = (tmin_lb <= tmax_ub) & (tmax_ub >= 0.0)
    # rows with no active lane have inverted (garbage) intervals: no tiles
    hit = hit & jnp.any(on, axis=1)[:, None]
    if t_hi is not None:
        cap_row = jnp.max(jnp.where(on, t_hi, -big), axis=1)
        hit = hit & (tmin_lb <= cap_row[:, None])
    tl = jnp.clip(tmin_lb, 0.0, _CAP_NOHIT)
    kb = jax.lax.bitcast_convert_type(tl, i32)
    local = (jnp.arange(n_tiles, dtype=i32) % tpc)[None, :]
    keys = jnp.where(hit, (kb & ~_WL_IDX_BITS) | local, _WL_SENT)
    keys = keys.reshape(rows, C, tpc)
    if tpc < width:
        keys = jnp.pad(
            keys, ((0, 0), (0, 0), (0, width - tpc)),
            constant_values=_WL_SENT,
        )
    wl = jnp.sort(keys, axis=-1).reshape(rows, C * width)

    hit_c = hit.reshape(rows, C, tpc).any(-1)
    tmin_c = jnp.min(
        jnp.where(hit.reshape(rows, C, tpc), tl.reshape(rows, C, tpc), big),
        axis=-1,
    )
    bhit = hit_c.reshape(nb, BLOCK_ROWS, C).any(1)
    btmin = jnp.clip(
        jnp.min(tmin_c.reshape(nb, BLOCK_ROWS, C), axis=1), 0.0, _CAP_NOHIT
    )
    bkb = jax.lax.bitcast_convert_type(btmin, i32)
    bkeys = jnp.where(bhit, (bkb & ~0xFF) | jnp.arange(C, dtype=i32), _WL_SENT)
    bsort = jnp.sort(bkeys, axis=-1)
    cnt = jnp.sum(bhit, axis=-1).astype(i32)
    order = bsort & 0xFF
    last = jnp.take_along_axis(
        order, jnp.maximum(cnt - 1, 0)[:, None], axis=1
    )
    steps = jnp.arange(C, dtype=i32)[None, :]
    order = jnp.where(steps < cnt[:, None], order, last)
    ctmin = bsort & ~0xFF

    sbox = jnp.zeros((8, 128), f32)
    real = boxes[:, 0] <= boxes[:, 3]  # inverted pad boxes excluded
    s_lo = jnp.min(jnp.where(real[:, None], lo, big), axis=0)
    s_hi = jnp.max(jnp.where(real[:, None], hi, -big), axis=0)
    sbox = sbox.at[0, 0:3].set(s_lo).at[0, 3:6].set(s_hi)
    return order, cnt, ctmin, wl, sbox


def _exit_cap(sbox_r, o, d):
    """Per-lane scene-exit t bound (inflated for f32 slab rounding): no
    triangle hit can lie beyond the ray's exit from the scene AABB."""
    inv = tuple(1.0 / jnp.where(c == 0.0, 1e-20, c) for c in d)
    t1 = tuple(
        jnp.maximum(
            (sbox_r[0, k] - o[k]) * inv[k], (sbox_r[0, 3 + k] - o[k]) * inv[k]
        )
        for k in range(3)
    )
    exit_t = jnp.minimum(jnp.minimum(t1[0], t1[1]), t1[2])
    return exit_t * 1.001 + 1e-3


def _tile_lane_need(box_r, ti, o, d, inv, active, t_cap):
    """Per-lane slab test of one tile under a per-lane t cap (NaN-safe)."""
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
    hit = (tmin <= tmax) & active
    if t_cap is not None:
        hit = hit & ~(tmin > t_cap)
    return jnp.any(hit)


def _stream_closest_kernel(tile: int, chunk: int, width: int, prec: str,
                           t_lo: float, *refs):
    """One (ray_block, ordered-chunk) grid step of the streamed closest
    sweep: per-row front-to-back worklist walk with early break."""
    from .pallas_bounce import _key_t_upper, _tile_uv_t

    order_ref, cnt_ref, ctmin_ref = refs[0], refs[1], refs[2]
    gat_r, box_r, wl_r, sbox_r = refs[3], refs[4], refs[5], refs[6]
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, act_r) = refs[7:14]
    key_o, prim_o = refs[14], refs[15]
    i = pl.program_id(0)
    c = pl.program_id(1)
    ones = jnp.ones((1, LANES), jnp.float32)
    zeros = jnp.zeros((1, LANES), jnp.float32)
    f32, i32 = jnp.float32, jnp.int32

    @pl.when(c == 0)
    def _init():
        key_o[:] = jnp.full((BLOCK_ROWS, LANES), _BIG_KEY, i32)
        prim_o[:] = jnp.zeros((BLOCK_ROWS, LANES), i32)

    # block-level break: the chunk's conservative tmin (sorted ascending
    # across the visit order) vs every active lane's current best-t bound.
    # Both sides are NONNEGATIVE-float bit patterns, so the comparison runs
    # in int space (bit order == float order; Mosaic has no scalar bitcast).
    # No-hit lanes carry key|0x1FF = 0x7F8001FF, which int-compares above
    # every real tmin — the "+inf, keep all chunks alive" behavior.
    int_min = jnp.int32(-(2**31))
    cap_bits = jnp.max(
        jnp.where(act_r[:] != 0, key_o[:] | jnp.int32(0x1FF), int_min)
    )

    @pl.when((c < cnt_ref[i]) & (ctmin_ref[i, c] <= cap_bits))
    def _body():
        base = order_ref[i, c] * chunk

        def row(g, _):
            sl = pl.ds(g, 1)
            o = (ox_r[sl, :], oy_r[sl, :], oz_r[sl, :])
            d = (dx_r[sl, :], dy_r[sl, :], dz_r[sl, :])
            active = act_r[sl, :] != 0
            inv = tuple(1.0 / jnp.where(x == 0.0, 1e-20, x) for x in d)
            exit_cap = jnp.maximum(_exit_cap(sbox_r, o, d), 0.0)
            exit_bits = jax.lax.bitcast_convert_type(exit_cap, i32)
            od = jnp.concatenate(
                [jnp.concatenate([*o, ones], axis=0),
                 jnp.concatenate([*d, zeros], axis=0)], axis=1
            )

            # the row's worklist as one (1, width) vector: Mosaic only allows
            # dynamic indices on the sublane axis, so the j-th entry is
            # extracted by a masked lane reduce (keys are nonnegative)
            wlv = wl_r[sl, :]
            lane_iota = jax.lax.broadcasted_iota(i32, (1, width), 1)

            def wl_at(j):
                return jnp.max(jnp.where(lane_iota == j, wlv, int_min))

            def cap_bits_of(bk):
                # int-space per-lane cap: min(best-t upper bound, scene
                # exit); no-hit lanes' 0x7F8001FF naturally yields the exit
                capv = jnp.minimum(bk | jnp.int32(0x1FF), exit_bits)
                return jnp.max(jnp.where(active, capv, int_min))

            def wcond(st):
                j, cap, _bk, _bp = st
                tmin_bits = wl_at(j) & ~_WL_IDX_BITS
                return (j < width) & (tmin_bits <= cap)

            def wbody(st):
                j, cap, bk, bp = st
                kj = wl_at(j)
                ti = kj & _WL_IDX_BITS

                def sweep(args):
                    _cap, bk, bp = args
                    ok, tq = _tile_uv_t(gat_r, tile, ti, od, LANES, prec,
                                        t_lo)
                    t_bits = jax.lax.bitcast_convert_type(tq, i32)
                    idx = jax.lax.broadcasted_iota(i32, ok.shape, 0)
                    key = jnp.where(
                        ok, (t_bits & jnp.int32(~0x1FF)) | idx,
                        jnp.int32(_BIG_KEY),
                    )
                    kmin = jnp.min(key, axis=0, keepdims=True)
                    better = kmin < bk
                    prim = base + ti * tile + (kmin & 0x1FF)
                    bk = jnp.where(better, kmin, bk)
                    # the cap only tightens when a sweep improves a key
                    return (
                        cap_bits_of(bk), bk, jnp.where(better, prim, bp),
                    )

                ub = _key_t_upper(bk)  # NaN on no-hit lanes
                t_cap = jnp.where(
                    jnp.isnan(ub), exit_cap, jnp.minimum(ub, exit_cap)
                )
                cap, bk, bp = jax.lax.cond(
                    _tile_lane_need(box_r, ti, o, d, inv, active, t_cap),
                    sweep, lambda a: a, (cap, bk, bp),
                )
                return j + 1, cap, bk, bp

            bk0 = key_o[sl, :]
            _, _, bk, bp = jax.lax.while_loop(
                wcond, wbody,
                (jnp.int32(0), cap_bits_of(bk0), bk0, prim_o[sl, :]),
            )
            key_o[sl, :] = bk
            prim_o[sl, :] = bp
            return 0

        jax.lax.fori_loop(0, BLOCK_ROWS, row, 0)


def _stream_any_kernel(tile: int, chunk: int, width: int, prec: str,
                       t_lo: float, *refs):
    """One (ray_block, ordered-chunk) grid step of the streamed occlusion
    sweep: per-row worklist walk, early-exit once every lane is occluded."""
    from .pallas_bounce import _tile_uv_t

    order_ref, cnt_ref, ctmin_ref = refs[0], refs[1], refs[2]
    gat_r, box_r, wl_r, sbox_r = refs[3], refs[4], refs[5], refs[6]
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, thi_r, act_r) = refs[7:15]
    occ_o = refs[15]
    i = pl.program_id(0)
    c = pl.program_id(1)
    ones = jnp.ones((1, LANES), jnp.float32)
    zeros = jnp.zeros((1, LANES), jnp.float32)
    f32, i32 = jnp.float32, jnp.int32

    @pl.when(c == 0)
    def _init():
        occ_o[:] = jnp.zeros((BLOCK_ROWS, LANES), i32)

    open_any = jnp.any((act_r[:] != 0) & (occ_o[:] == 0))

    @pl.when((c < cnt_ref[i]) & open_any)
    def _body():
        # (ctmin_ref is unused here: occlusion has no t ordering to break on)

        def row(g, _):
            sl = pl.ds(g, 1)
            o = (ox_r[sl, :], oy_r[sl, :], oz_r[sl, :])
            d = (dx_r[sl, :], dy_r[sl, :], dz_r[sl, :])
            thi = thi_r[sl, :]
            act = act_r[sl, :] != 0
            inv = tuple(1.0 / jnp.where(x == 0.0, 1e-20, x) for x in d)
            thi_bits = jax.lax.bitcast_convert_type(
                jnp.maximum(thi, 0.0), i32
            )
            int_min = jnp.int32(-(2**31))
            od = jnp.concatenate(
                [jnp.concatenate([*o, ones], axis=0),
                 jnp.concatenate([*d, zeros], axis=0)], axis=1
            )

            wlv = wl_r[sl, :]
            lane_iota = jax.lax.broadcasted_iota(i32, (1, width), 1)

            def wl_at(j):
                return jnp.max(jnp.where(lane_iota == j, wlv, int_min))

            def wcond(st):
                j, occ = st
                open_ = act & (occ == 0)
                # int-space compare (nonneg-float bit order == float order)
                cap_bits = jnp.max(jnp.where(open_, thi_bits, int_min))
                tmin_bits = wl_at(j) & ~_WL_IDX_BITS
                return (j < width) & (tmin_bits <= cap_bits)

            def wbody(st):
                j, occ = st
                ti = wl_at(j) & _WL_IDX_BITS
                open_ = act & (occ == 0)

                def sweep(occ):
                    ok, tq = _tile_uv_t(gat_r, tile, ti, od, LANES, prec,
                                        t_lo)
                    hit = ok & (tq < thi)
                    return occ | jnp.any(hit, axis=0, keepdims=True
                                         ).astype(i32)

                occ = jax.lax.cond(
                    _tile_lane_need(box_r, ti, o, d, inv, open_, thi),
                    sweep, lambda x: x, occ,
                )
                return j + 1, occ

            _, occ = jax.lax.while_loop(
                wcond, wbody, (jnp.int32(0), occ_o[sl, :])
            )
            occ_o[sl, :] = occ
            return 0

        jax.lax.fori_loop(0, BLOCK_ROWS, row, 0)


# ------------------------------------------------- grid specs / wrappers


def _stream_specs(chunk: int, tpc: int, width: int, n_chunks: int,
                  n_ray_planes: int, n_out: int):
    """(in_specs, out_specs) for the worklist kernels. All index maps see
    the 3 scalar-prefetch refs (order, cnt, ctmin) as trailing args; the
    gat/box/worklist blocks follow the block's chunk visit order. With a
    single chunk the gat/box maps are CONSTANT — order[i, 0] is always 0,
    and a constant map keeps the pipeline from double-buffering the gat
    table (at the one-chunk cap that is a ~10 MB buffer: doubling it
    OOMs the 16 MB scoped-VMEM budget inside render graphs)."""

    def by_order_gat(i, c, order, cnt, ctmin):
        return (0, order[i, c])

    def by_order_box(i, c, order, cnt, ctmin):
        return (order[i, c], 0)

    def by_order_wl(i, c, order, cnt, ctmin):
        return (i, order[i, c])

    def by_block(i, c, order, cnt, ctmin):
        return (i, 0)

    def const(i, c, order, cnt, ctmin):
        return (0, 0)

    if n_chunks == 1:
        by_order_gat = const
        by_order_box = const
        by_order_wl = by_block

    v = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((_gat_rows(), chunk), by_order_gat, memory_space=v),
        pl.BlockSpec((tpc, 8), by_order_box, memory_space=v),
        pl.BlockSpec((BLOCK_ROWS, width), by_order_wl, memory_space=v),
        pl.BlockSpec((8, 128), const, memory_space=v),
    ] + [
        pl.BlockSpec((BLOCK_ROWS, LANES), by_block, memory_space=v)
    ] * n_ray_planes
    out_specs = [
        pl.BlockSpec((BLOCK_ROWS, LANES), by_block, memory_space=v)
    ] * n_out
    return in_specs, out_specs


def stream_closest(stream_pack, rays7, interpret=False, t_lo: float = 0.0):
    """Streamed closest-hit sweep. rays7: (ox,oy,oz,dx,dy,dz,active_i32)
    planes. Returns (miss bool plane, prim i32 plane) — prim indexes the
    pack's Morton-sorted scene table. t_lo is a static float."""
    gat, boxes, t_pad, tile, chunk = stream_pack[:5]
    o3, d3, act = rays7[0:3], rays7[3:6], rays7[6]
    order, cnt, ctmin, wl, sbox = _plan_sweep(boxes, tile, chunk, o3, d3, act)
    r = rays7[0].shape[0]
    grid = (r // BLOCK_ROWS, t_pad // chunk)
    prec = "highest" if interpret else MXU_PRECISION
    width = _wl_width(chunk // tile)
    in_specs, out_specs = _stream_specs(chunk, chunk // tile, width,
                                        t_pad // chunk, 7, 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=grid,
        in_specs=in_specs, out_specs=out_specs,
    )
    key, prim = pl.pallas_call(
        functools.partial(
            _stream_closest_kernel, tile, chunk, width, prec, float(t_lo)
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((r, LANES), jnp.int32)] * 2,
        interpret=interpret,
    )(order, cnt, ctmin, gat, boxes, wl, sbox, *rays7)
    return key == _BIG_KEY, prim


def stream_any(stream_pack, rays8, interpret=False, t_lo: float = 1e-4):
    """Streamed occlusion sweep. rays8: (ox,oy,oz,dx,dy,dz,t_hi,active_i32)
    planes; t_lo (static float) defaults to the shadow-ray offset 1e-4
    (path.py parity). Returns an i32 occlusion plane suitable for
    fused_shade(occ_in=...)."""
    gat, boxes, t_pad, tile, chunk = stream_pack[:5]
    o3, d3, thi, act = rays8[0:3], rays8[3:6], rays8[6], rays8[7]
    order, cnt, ctmin, wl, sbox = _plan_sweep(
        boxes, tile, chunk, o3, d3, act, t_hi=thi
    )
    r = rays8[0].shape[0]
    grid = (r // BLOCK_ROWS, t_pad // chunk)
    prec = "highest" if interpret else MXU_PRECISION
    width = _wl_width(chunk // tile)
    in_specs, out_specs = _stream_specs(chunk, chunk // tile, width,
                                        t_pad // chunk, 8, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=grid,
        in_specs=in_specs, out_specs=out_specs,
    )
    (occ,) = pl.pallas_call(
        functools.partial(_stream_any_kernel, tile, chunk, width, prec,
                          float(t_lo)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((r, LANES), jnp.int32)],
        interpret=interpret,
    )(order, cnt, ctmin, gat, boxes, wl, sbox, *rays8)
    return occ


# ------------------------------------------------------------- epilogue


def stream_trace_interact(stream_pack, rays8, interpret=False, lite=False):
    """Streamed kernel-1 equivalent: same 8 ray planes in, same 16 planes
    out as pallas_bounce.fused_trace_interact (lite=True: the 4 emitter
    planes). The interaction epilogue runs in XLA on plane arrays — at
    streamed scene sizes the sweep dominates and the one row-gather per
    bounce (~128 B/ray) is noise."""
    (ox, oy, oz, dx, dy, dz, pdf_prev, act) = rays8
    miss_raw, prim = stream_closest(
        stream_pack, (ox, oy, oz, dx, dy, dz, act), interpret=interpret
    )
    sorted_pack = stream_pack[5]
    shape = prim.shape
    cols = jnp.take(sorted_pack, prim.reshape(-1), axis=0,
                    indices_are_sorted=False, unique_indices=False)
    # miss lanes carry prim=0 (a real triangle): zero its attributes like
    # the VMEM kernel's masked gather, so uv/ns/emission stay finite-0 and
    # downstream gathers never see garbage indices
    col = [
        jnp.where(miss_raw, 0.0, cols[:, k].reshape(shape)) for k in range(31)
    ]
    o = (ox, oy, oz)
    d = (dx, dy, dz)
    p0 = (col[0], col[1], col[2])
    e1 = (col[3], col[4], col[5])
    e2 = (col[6], col[7], col[8])
    # exact f32 Möller–Trumbore re-derivation of the winner (s = o - p0
    # recenters before any product: no large-magnitude cancellation)
    hh = _vcross(d, e2)
    a = _vdot(e1, hh)
    f = 1.0 / jnp.where(a == 0.0, 1.0, a)
    s = _vsub(o, p0)
    bu = f * _vdot(s, hh)
    q = _vcross(s, e1)
    bv = f * _vdot(d, q)
    t = f * _vdot(e2, q)
    bad = miss_raw | (a == 0.0)
    t = jnp.where(bad, 1.0, t)
    active = act != 0
    vals = _interact_epilogue(
        o, d, pdf_prev, active,
        jnp.where(miss_raw, 1e30, t), bu, bv, miss_raw,
        tuple(col[9:31]),
    )
    if lite:
        return vals[12], vals[13], vals[14], vals[15]
    return vals


# ------------------------------------------- standalone (accel) wrappers


def build_stream_tris(p0, e1, e2, chunk: int = STREAM_CHUNK, tile=None):
    """Geometry-only stream pack for the standalone accel trace
    (accel.method == "stream"): same tables as build_stream_pack but from
    bare (p0, e1, e2) with attribute columns zeroed.

    Returns (gat, boxes, t_pad, tile, chunk, verts9, order):
      verts9 (t_pad, 9) Morton-ordered p0/e1/e2 (winner MT re-derivation)
      order  (t_pad,) i32 Morton index -> accel-order triangle index
             (identity past the real count; compose with Accel.tri_perm
             for global ids).
    """
    t_n = p0.shape[0]
    scene_like = jnp.concatenate(
        [p0, e1, e2, jnp.zeros((t_n, 23), jnp.float32)], axis=1
    )
    gat, boxes, t_full, tile, chunk, sorted_pack, order = build_stream_pack(
        scene_like, chunk=chunk, tile=tile
    )
    return gat, boxes, t_full, tile, chunk, sorted_pack[:, 0:9], order


def _to_planes(cols3):
    from .pallas_bounce import pad_to_planes, planes_rows

    n = cols3.shape[0]
    rows = planes_rows(n)
    return tuple(pad_to_planes(cols3[:, k], rows) for k in range(3)), rows, n


def stream_trace_closest(tri_pack, o, d, t_min=0.0, t_max=1e30,
                         interpret=False):
    """(N, 3) ray closest-hit through the streamed sweep. Returns
    (t, prim_accel, u, v) with prim -1 on miss — accel.trace_closest's
    internal contract (trace.py), with exact f32 MT re-derivation of the
    winner. t_min must be a static float; t_max may be traced."""
    from .pallas_bounce import pad_to_planes

    op, rows, n = _to_planes(o)
    dp, _, _ = _to_planes(d)
    act = pad_to_planes(jnp.ones((n,), jnp.int32), rows)
    miss, prim = stream_closest(
        tri_pack, (*op, *dp, act), interpret=interpret, t_lo=float(t_min)
    )
    verts9, order = tri_pack[5], tri_pack[6]
    shape = prim.shape
    v = jnp.take(verts9, prim.reshape(-1), axis=0)
    col = [
        jnp.where(miss, 0.0, v[:, k].reshape(shape)) for k in range(9)
    ]
    dtup = dp
    p0 = (col[0], col[1], col[2])
    e1 = (col[3], col[4], col[5])
    e2 = (col[6], col[7], col[8])
    hh = _vcross(dtup, e2)
    a = _vdot(e1, hh)
    f = 1.0 / jnp.where(a == 0.0, 1.0, a)
    s = _vsub(op, p0)
    bu = f * _vdot(s, hh)
    q = _vcross(s, e1)
    bv = f * _vdot(dtup, q)
    t = f * _vdot(e2, q)
    bad = miss | (a == 0.0) | (t >= t_max)
    t = jnp.where(bad, 1e30, t)
    prim_acc = jnp.where(bad, -1, jnp.take(order, prim.reshape(-1)).reshape(shape))
    flat = lambda x: x.reshape(-1)[:n]
    return flat(t), flat(prim_acc), flat(bu), flat(bv)


def stream_trace_any(tri_pack, o, d, t_min=1e-4, t_max=1e30,
                     interpret=False):
    """(N, 3) ray any-hit through the streamed occlusion sweep. t_min is a
    static float; t_max may be scalar or per-ray (N,). Returns (N,) bool."""
    from .pallas_bounce import pad_to_planes, planes_rows

    op, rows, n = _to_planes(o)
    dp, _, _ = _to_planes(d)
    act = pad_to_planes(jnp.ones((n,), jnp.int32), rows)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    thi = pad_to_planes(t_max, rows)
    occ = stream_any(
        tri_pack, (*op, *dp, thi, act), interpret=interpret,
        t_lo=float(t_min),
    )
    return occ.reshape(-1)[:n] != 0
