"""HBM-streamed MXU trace for big meshes — the TPU-native replacement for
the reference's hardware BVH traversal at scene sizes past the VMEM cap
(reference: luisa.Accel / OptiX RT cores, render.py:74,109 and kernel
call sites collocated.py:16, direct.py:22,67).

The VMEM-resident Woop sweep (pallas_bounce.build_woop_pack +
_mxu_sweep_row) is limited to FUSED_MAX_TRIS triangles by the 16 MB VMEM
budget. This module lifts that cap by streaming the same gat table from
HBM in chunk-sized slices over a second (innermost) grid axis:

    grid = (ray_blocks, chunks)         # chunk axis fastest, sequential
    gat chunk   : BlockSpec((48, CHUNK), (i, c) -> (0, c))   [streams]
    ray planes  : BlockSpec((128, 128), (i, c) -> (i, 0))    [resident]
    key/prim out: BlockSpec((128, 128), (i, c) -> (i, 0))    [revisited]

Each chunk step runs the ordinary tiled Woop sweep (per-tile AABB culls
included) and folds its packed argmin key into the revisited output
block — the classic matmul-K-accumulation pattern, with min instead of
add. Triangles are pre-sorted by Morton code so tiles stay spatially
tight and the AABB slab tests cull effectively for coherent ray rows.

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


def build_stream_pack(scene_pack, chunk: int = STREAM_CHUNK, tile=None):
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
    chunk = max(int(chunk), tile)
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


def _chunk_bounds(box_r):
    """Chunk-level AABB from the resident per-tile boxes (pad tiles carry
    inverted boxes, so an all-pad chunk stays inverted -> never slab-hit)."""
    lo = tuple(jnp.min(box_r[:, k]) for k in range(3))
    hi = tuple(jnp.max(box_r[:, 3 + k]) for k in range(3))
    return lo, hi


def _chunk_slab_any(lo, hi, o, d, active, t_cap):
    """Any active lane's slab interval reaches [lo, hi] below t_cap?
    (The per-row chunk cull: one slab test instead of tiles_per_chunk.)"""
    inv = tuple(1.0 / jnp.where(c == 0.0, 1e-20, c) for c in d)
    t0 = tuple((lo[k] - o[k]) * inv[k] for k in range(3))
    t1 = tuple((hi[k] - o[k]) * inv[k] for k in range(3))
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
        hit = hit & ~(tmin > t_cap)  # NaN t_cap (no hit yet) -> no cull
    return jnp.any(hit)


def _stream_closest_kernel(tile: int, chunk: int, prec: str, t_lo: float,
                           *refs):
    """One (ray_block, chunk) grid step of the streamed closest sweep.

    Hierarchical culling (round 4): each row first slab-tests the CHUNK's
    AABB under the row's current best-t bound (one test replaces the
    whole tile loop for unreachable chunks), and the tile sweep is seeded
    with the carried best key so hits from earlier chunks t-cull this
    chunk's tiles (bit-exact — see pallas_bounce._key_t_upper)."""
    from .pallas_bounce import _key_t_upper

    gat_r, box_r = refs[0], refs[1]
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, act_r) = refs[2:9]
    key_o, prim_o = refs[9], refs[10]
    c = pl.program_id(1)
    tiles_per_chunk = chunk // tile
    ones = jnp.ones((1, LANES), jnp.float32)
    zeros = jnp.zeros((1, LANES), jnp.float32)

    @pl.when(c == 0)
    def _init():
        key_o[:] = jnp.full((BLOCK_ROWS, LANES), _BIG_KEY, jnp.int32)
        prim_o[:] = jnp.zeros((BLOCK_ROWS, LANES), jnp.int32)

    base = c * chunk
    clo, chi = _chunk_bounds(box_r)

    def row(g, _):
        sl = pl.ds(g, 1)
        o = (ox_r[sl, :], oy_r[sl, :], oz_r[sl, :])
        d = (dx_r[sl, :], dy_r[sl, :], dz_r[sl, :])
        active = act_r[sl, :] != 0
        old_key = key_o[sl, :]
        t_ub = _key_t_upper(old_key)

        def run(_):
            o_aug = jnp.concatenate([*o, ones], axis=0)
            d_aug = jnp.concatenate([*d, zeros], axis=0)
            kmin, btile = _mxu_sweep_row(
                gat_r, box_r, tile, tiles_per_chunk, o_aug, d_aug, t_lo,
                None, "closest", prec=prec, active=active, raw=True,
                seed_key=old_key,
            )
            better = kmin < old_key
            prim_c = base + btile * tile + (kmin & 0x1FF)
            return (
                jnp.where(better, kmin, old_key),
                jnp.where(better, prim_c, prim_o[sl, :]),
            )

        new_key, new_prim = jax.lax.cond(
            _chunk_slab_any(clo, chi, o, d, active, t_ub),
            run,
            lambda _: (old_key, prim_o[sl, :]),
            0,
        )
        key_o[sl, :] = new_key
        prim_o[sl, :] = new_prim
        return 0

    jax.lax.fori_loop(0, BLOCK_ROWS, row, 0)


def _stream_any_kernel(tile: int, chunk: int, prec: str, t_lo: float, *refs):
    """One (ray_block, chunk) grid step of the streamed occlusion sweep."""
    gat_r, box_r = refs[0], refs[1]
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, thi_r, act_r) = refs[2:10]
    occ_o = refs[10]
    c = pl.program_id(1)
    tiles_per_chunk = chunk // tile
    ones = jnp.ones((1, LANES), jnp.float32)
    zeros = jnp.zeros((1, LANES), jnp.float32)

    @pl.when(c == 0)
    def _init():
        occ_o[:] = jnp.zeros((BLOCK_ROWS, LANES), jnp.int32)

    # whole-block early exit: once every active lane in the block is
    # occluded, the remaining chunk steps do no sweep work
    open_any = jnp.any((act_r[:] != 0) & (occ_o[:] == 0))

    @pl.when(open_any)
    def _sweep():
        clo, chi = _chunk_bounds(box_r)

        def row(g, _):
            sl = pl.ds(g, 1)
            active = (act_r[sl, :] != 0) & (occ_o[sl, :] == 0)
            o = (ox_r[sl, :], oy_r[sl, :], oz_r[sl, :])
            d = (dx_r[sl, :], dy_r[sl, :], dz_r[sl, :])

            def run(occ_prev):
                o_aug = jnp.concatenate([*o, ones], axis=0)
                d_aug = jnp.concatenate([*d, zeros], axis=0)
                occ = _mxu_sweep_row(
                    gat_r, box_r, tile, tiles_per_chunk, o_aug, d_aug,
                    t_lo, thi_r[sl, :], "any", prec=prec, active=active,
                )
                return occ_prev | occ.astype(jnp.int32)

            # per-row chunk cull: occluders must sit below the shadow
            # distance, so the chunk slab test is t_hi-capped too
            occ_o[sl, :] = jax.lax.cond(
                _chunk_slab_any(clo, chi, o, d, active, thi_r[sl, :]),
                run, lambda p: p, occ_o[sl, :],
            )
            return 0

        jax.lax.fori_loop(0, BLOCK_ROWS, row, 0)


def _gat_spec(chunk):
    return pl.BlockSpec(
        (_gat_rows(), chunk), lambda i, c: (0, c), memory_space=pltpu.VMEM
    )


def _box_spec(tiles_per_chunk):
    return pl.BlockSpec(
        (tiles_per_chunk, 8), lambda i, c: (c, 0), memory_space=pltpu.VMEM
    )


def _ray_spec2():
    return pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i, c: (i, 0), memory_space=pltpu.VMEM
    )


def stream_closest(stream_pack, rays7, interpret=False, t_lo: float = 0.0):
    """Streamed closest-hit sweep. rays7: (ox,oy,oz,dx,dy,dz,active_i32)
    planes. Returns (miss bool plane, prim i32 plane) — prim indexes the
    pack's Morton-sorted scene table. t_lo is a static float."""
    gat, boxes, t_pad, tile, chunk = stream_pack[:5]
    r = rays7[0].shape[0]
    grid = (r // BLOCK_ROWS, t_pad // chunk)
    prec = "highest" if interpret else MXU_PRECISION
    key, prim = pl.pallas_call(
        functools.partial(
            _stream_closest_kernel, tile, chunk, prec, float(t_lo)
        ),
        grid=grid,
        in_specs=[_gat_spec(chunk), _box_spec(chunk // tile)]
        + [_ray_spec2()] * 7,
        out_specs=[_ray_spec2()] * 2,
        out_shape=[jax.ShapeDtypeStruct((r, LANES), jnp.int32)] * 2,
        interpret=interpret,
    )(gat, boxes, *rays7)
    return key == _BIG_KEY, prim


def stream_any(stream_pack, rays8, interpret=False, t_lo: float = 1e-4):
    """Streamed occlusion sweep. rays8: (ox,oy,oz,dx,dy,dz,t_hi,active_i32)
    planes; t_lo (static float) defaults to the shadow-ray offset 1e-4
    (path.py parity). Returns an i32 occlusion plane suitable for
    fused_shade(occ_in=...)."""
    gat, boxes, t_pad, tile, chunk = stream_pack[:5]
    r = rays8[0].shape[0]
    grid = (r // BLOCK_ROWS, t_pad // chunk)
    prec = "highest" if interpret else MXU_PRECISION
    (occ,) = pl.pallas_call(
        functools.partial(_stream_any_kernel, tile, chunk, prec, float(t_lo)),
        grid=grid,
        in_specs=[_gat_spec(chunk), _box_spec(chunk // tile)]
        + [_ray_spec2()] * 8,
        out_specs=[_ray_spec2()],
        out_shape=[jax.ShapeDtypeStruct((r, LANES), jnp.int32)],
        interpret=interpret,
    )(gat, boxes, *rays8)
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
