"""Batched ray-triangle intersection: dense brute force + BVH traversal.

All entry points take flat ray batches (N, 3) and return batched Hit records.
Both strategies are pure jnp, jit/vmap/shard_map-compatible, and run the
whole wavefront in lock-step (the TPU analog of the reference's SIMT grid).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .bvh import LEAF_SIZE, MAX_STACK
from .types import Accel, Hit

_BIG = jnp.float32(1e30)


def _moller_trumbore(
    o: jnp.ndarray,  # (N, 1_or_C, 3)
    d: jnp.ndarray,  # (N, 1_or_C, 3)
    p0: jnp.ndarray,  # (..., C, 3)
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    t_min,
    t_max,  # (N, 1) broadcastable
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Möller–Trumbore. Returns (t, u, v, valid) of shape (N, C)."""
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
    s = o - p0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    valid = (
        (jnp.abs(a) > 1e-12)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, u, v, valid


# ---------------------------------------------------------------- brute force


def _brute_scan(accel: Accel, o, d, t_min, t_max, want_closest: bool):
    """Scan over triangle chunks; carry the best hit (or an occluded flag)."""
    T = accel.num_triangles
    C = min(accel.chunk, max(T, 1))
    pad = (-T) % C
    p0 = jnp.pad(accel.p0, ((0, pad), (0, 0)))
    e1 = jnp.pad(accel.e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(accel.e2, ((0, pad), (0, 0)))
    ids = jnp.pad(accel.tri_perm, (0, pad), constant_values=-1)
    n_chunks = (T + pad) // C
    p0 = p0.reshape(n_chunks, C, 3)
    e1 = e1.reshape(n_chunks, C, 3)
    e2 = e2.reshape(n_chunks, C, 3)
    ids = ids.reshape(n_chunks, C)

    N = o.shape[0]
    oN = o[:, None, :]
    dN = d[:, None, :]
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (N,))[:, None]
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))[:, None]

    if want_closest:
        def step(carry, chunk):
            best_t, best_prim, best_u, best_v = carry
            cp0, ce1, ce2, cid = chunk
            t, u, v, ok = _moller_trumbore(
                oN, dN, cp0[None], ce1[None], ce2[None], t_min_b, best_t[:, None]
            )
            ok = ok & (cid[None, :] >= 0)
            # Selection by reductions only: take-along-axis gathers after an
            # argmin measure ~1000x slower than a min-reduce on TPU.
            t = jnp.where(ok, t, _BIG)
            tj = jnp.min(t, axis=-1)
            sel_prim = jnp.min(
                jnp.where(t <= tj[:, None], cid[None, :], jnp.int32(2**30)), axis=-1
            )
            sel_mask = cid[None, :] == sel_prim[:, None]
            uj = jnp.sum(jnp.where(sel_mask, u, 0.0), axis=-1)
            vj = jnp.sum(jnp.where(sel_mask, v, 0.0), axis=-1)
            better = tj < best_t
            best_prim = jnp.where(better, sel_prim, best_prim)
            best_u = jnp.where(better, uj, best_u)
            best_v = jnp.where(better, vj, best_v)
            best_t = jnp.where(better, tj, best_t)
            return (best_t, best_prim, best_u, best_v), None

        init = (
            jnp.broadcast_to(t_max_b[:, 0], (N,)).astype(jnp.float32),
            jnp.full((N,), -1, jnp.int32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32),
        )
        (best_t, best_prim, best_u, best_v), _ = jax.lax.scan(
            step, init, (p0, e1, e2, ids)
        )
        return best_t, best_prim, best_u, best_v
    else:
        def step(occluded, chunk):
            cp0, ce1, ce2, cid = chunk
            _, _, _, ok = _moller_trumbore(
                oN, dN, cp0[None], ce1[None], ce2[None], t_min_b, t_max_b
            )
            ok = ok & (cid[None, :] >= 0)
            return occluded | jnp.any(ok, axis=-1), None

        occluded, _ = jax.lax.scan(
            step, jnp.zeros((N,), bool), (p0, e1, e2, ids)
        )
        return occluded


# ------------------------------------------------------------------ BVH


def _safe_inv(d):
    tiny = jnp.abs(d) < 1e-12
    return jnp.where(tiny, jnp.where(d >= 0, _BIG, -_BIG), 1.0 / jnp.where(tiny, 1.0, d))


def _aabb_hit(o, inv_d, lo, hi, t_min, t_max):
    """Slab test. o/inv_d: (N,3); lo/hi: (N,3). Returns (hit, t_near)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (near <= far) & (far >= t_min) & (near <= t_max)
    return hit, near


def _bvh_loop(accel: Accel, o, d, t_min, t_max, want_closest: bool):
    N = o.shape[0]
    inv_d = _safe_inv(d)
    lane = jnp.arange(N)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (N,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    class S(NamedTuple):
        stack: jnp.ndarray
        sp: jnp.ndarray
        best_t: jnp.ndarray
        best_prim: jnp.ndarray
        best_u: jnp.ndarray
        best_v: jnp.ndarray
        occluded: jnp.ndarray

    init = S(
        stack=jnp.zeros((N, MAX_STACK), jnp.int32),
        sp=jnp.ones((N,), jnp.int32),
        best_t=t_max,
        best_prim=jnp.full((N,), -1, jnp.int32),
        best_u=jnp.zeros((N,), jnp.float32),
        best_v=jnp.zeros((N,), jnp.float32),
        occluded=jnp.zeros((N,), bool),
    )

    def cond(s: S):
        return jnp.any(s.sp > 0)

    def body(s: S) -> S:
        active = s.sp > 0
        sp1 = jnp.where(active, s.sp - 1, s.sp)
        node = jnp.where(active, s.stack[lane, sp1], 0)
        is_leaf = accel.node_is_leaf[node] & active

        # --- leaf path: fixed-size block of LEAF_SIZE triangles
        start = accel.node_left[node]
        tri = start[:, None] + jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :]
        tri = jnp.where(is_leaf[:, None], tri, 0)
        t, u, v, ok = _moller_trumbore(
            o[:, None, :],
            d[:, None, :],
            accel.p0[tri],
            accel.e1[tri],
            accel.e2[tri],
            t_min[:, None],
            s.best_t[:, None],
        )
        gid = accel.tri_perm[tri]  # (N, LEAF) global ids
        ok = ok & is_leaf[:, None] & (gid >= 0)
        t = jnp.where(ok, t, _BIG)
        tj = jnp.min(t, axis=-1)
        sel_prim = jnp.min(
            jnp.where(t <= tj[:, None], gid, jnp.int32(2**30)), axis=-1
        )
        sel_mask = gid == sel_prim[:, None]
        uj = jnp.sum(jnp.where(sel_mask, u, 0.0), axis=-1)
        vj = jnp.sum(jnp.where(sel_mask, v, 0.0), axis=-1)
        better = tj < s.best_t
        best_prim = jnp.where(better, sel_prim, s.best_prim)
        best_u = jnp.where(better, uj, s.best_u)
        best_v = jnp.where(better, vj, s.best_v)
        best_t = jnp.where(better, tj, s.best_t)
        occluded = s.occluded | jnp.any(ok, axis=-1)

        # --- internal path: test children, push far then near
        internal = active & ~accel.node_is_leaf[node]
        lchild = accel.node_left[node]
        rchild = accel.node_right[node]
        lhit, lnear = _aabb_hit(o, inv_d, accel.node_lo[lchild], accel.node_hi[lchild], t_min, best_t)
        rhit, rnear = _aabb_hit(o, inv_d, accel.node_lo[rchild], accel.node_hi[rchild], t_min, best_t)
        lhit = lhit & internal
        rhit = rhit & internal
        l_first = lnear <= rnear
        first = jnp.where(l_first, lchild, rchild)
        second = jnp.where(l_first, rchild, lchild)
        first_hit = jnp.where(l_first, lhit, rhit)
        second_hit = jnp.where(l_first, rhit, lhit)
        # push far child first so the near child pops first
        stack = s.stack.at[lane, sp1].set(
            jnp.where(second_hit, second, s.stack[lane, sp1])
        )
        sp2 = sp1 + second_hit.astype(jnp.int32)
        stack = stack.at[lane, sp2].set(jnp.where(first_hit, first, stack[lane, sp2]))
        sp3 = sp2 + first_hit.astype(jnp.int32)

        if not want_closest:
            sp3 = jnp.where(occluded, 0, sp3)

        return S(stack, sp3, best_t, best_prim, best_u, best_v, occluded)

    out = jax.lax.while_loop(cond, body, init)
    if want_closest:
        return out.best_t, out.best_prim, out.best_u, out.best_v
    return out.occluded


def _bvh_stackless(accel: Accel, o, d, t_min, t_max, want_closest: bool):
    """Escape-link (threaded) BVH traversal: no per-lane stack.

    The stack-based loop costs two (N,)-row scatters per iteration for the
    stack pushes (~7 ns/lane each — the same serial-scatter floor the
    gradient flush hits) plus ~15 scattered column gathers for node data.
    Here a node visit is ONE 32-byte row-gather of the packed DFS-preorder
    node (bvh.to_stackless): descend = node+1, miss/after-leaf = escape
    link. Triangles are fetched as packed 36-byte rows. Trades ordered
    near-child-first descent (and its earlier best_t shrinking) for
    scatter-free, gather-light iterations — measured well ahead on TPU.
    """
    N = o.shape[0]
    inv_d = _safe_inv(d)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (N,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    m = accel.node_packed.shape[0]
    node_rows = accel.node_packed
    tri_rows = jnp.concatenate([accel.p0, accel.e1, accel.e2], axis=1)  # (Tp, 9)

    class S(NamedTuple):
        node: jnp.ndarray
        best_t: jnp.ndarray
        best_prim: jnp.ndarray
        best_u: jnp.ndarray
        best_v: jnp.ndarray
        occluded: jnp.ndarray

    init = S(
        node=jnp.zeros((N,), jnp.int32),
        best_t=t_max,
        best_prim=jnp.full((N,), -1, jnp.int32),
        best_u=jnp.zeros((N,), jnp.float32),
        best_v=jnp.zeros((N,), jnp.float32),
        occluded=jnp.zeros((N,), bool),
    )

    HOPS = 8  # internal-node hops per loop body (see below)

    def cond(s: S):
        return jnp.any(s.node < m)

    def body(s: S) -> S:
        # Phase A: up to HOPS internal-node hops per lane, pausing at the
        # first leaf. A hop is one 32B row-gather + an AABB test (~20 ns);
        # the 8-triangle leaf fetch is ~80 ns and is paid once per BODY
        # instead of once per visit — the leaf gather was the dominant cost
        # of the one-visit-per-body version (the gather is issued for every
        # lane whether or not it sits at a leaf).
        def hop(_, hs):
            node, at_leaf, leaf_start, leaf_escape = hs
            cur = jnp.minimum(node, m - 1)
            row = node_rows[cur]
            lo = row[:, 0:3]
            hi = row[:, 3:6]
            escape = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
            leafw = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
            moving = ~at_leaf & (node < m)
            hit, _ = _aabb_hit(o, inv_d, lo, hi, t_min, s.best_t)
            hit = hit & moving
            pause = (leafw > 0) & hit
            nxt = jnp.where(hit & (leafw == 0), cur + 1, escape)
            node = jnp.where(moving & ~pause, nxt, node)
            at_leaf = at_leaf | pause
            leaf_start = jnp.where(pause, leafw - 1, leaf_start)
            leaf_escape = jnp.where(pause, escape, leaf_escape)
            return node, at_leaf, leaf_start, leaf_escape

        zero = jnp.zeros((N,), jnp.int32)
        node, at_leaf, start, leaf_escape = jax.lax.fori_loop(
            0, HOPS, hop, (s.node, jnp.zeros((N,), bool), zero, zero)
        )

        # Phase B: one batched leaf test for the paused lanes
        is_leaf = at_leaf
        tri = start[:, None] + jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :]
        tri = jnp.where(is_leaf[:, None], tri, 0)
        rows9 = tri_rows[tri]  # (N, LEAF, 9)
        t, u, v, ok = _moller_trumbore(
            o[:, None, :],
            d[:, None, :],
            rows9[..., 0:3],
            rows9[..., 3:6],
            rows9[..., 6:9],
            t_min[:, None],
            s.best_t[:, None],
        )
        gid = accel.tri_perm[tri]
        ok = ok & is_leaf[:, None] & (gid >= 0)
        t = jnp.where(ok, t, _BIG)
        tj = jnp.min(t, axis=-1)
        sel_prim = jnp.min(
            jnp.where(t <= tj[:, None], gid, jnp.int32(2**30)), axis=-1
        )
        sel_mask = gid == sel_prim[:, None]
        uj = jnp.sum(jnp.where(sel_mask, u, 0.0), axis=-1)
        vj = jnp.sum(jnp.where(sel_mask, v, 0.0), axis=-1)
        better = tj < s.best_t
        best_prim = jnp.where(better, sel_prim, s.best_prim)
        best_u = jnp.where(better, uj, s.best_u)
        best_v = jnp.where(better, vj, s.best_v)
        best_t = jnp.where(better, tj, s.best_t)
        occluded = s.occluded | jnp.any(ok, axis=-1)

        nxt = jnp.where(is_leaf, leaf_escape, node)
        if not want_closest:
            nxt = jnp.where(occluded, m, nxt)
        return S(nxt, best_t, best_prim, best_u, best_v, occluded)

    out = jax.lax.while_loop(cond, body, init)
    if want_closest:
        return out.best_t, out.best_prim, out.best_u, out.best_v
    return out.occluded


TIERED_MIN_RAYS = 65536  # below this the compaction machinery isn't worth it


def _bvh_stackless_tiered(accel: Accel, o, d, t_min, t_max, want_closest: bool,
                          n_tiers: int = 2):
    """Stackless traversal with stream compaction over tiered ray queues.

    The lock-step loop's cost is (max node visits over all lanes) x (full
    wavefront width): retired rays keep burning VPU until the deepest lane
    finishes. Here, after every round of HOPS visits the lane state is
    re-sorted by current node id — retired lanes (node == M) compact to the
    back, and the live prefix is processed at the smallest static width
    tier that covers it. The node-id sort doubles as a ray-coherence sort:
    lanes visiting the same subtree become neighbors, so their node/
    triangle row-gathers hit the same table regions. Results are scattered
    back to the caller's ray order through a carried original-index array
    at the end.

    n_tiers picks the compile-time/run-time tradeoff:
      2 — widths {N, N/4} dispatched by ONE lax.cond: compiles nearly as
          fast as the plain loop, captures most of the tail win; this is
          what renders use (traversal="auto") and the only reachable
          setting. (A 4-width lax.switch variant — "tiered4" in rounds
          2-3 — measured ~15% faster standalone but cost minutes of XLA
          compile inside render graphs; it was retired in round 4, its
          big-mesh role superseded by the HBM-streamed MXU sweep,
          pallas_stream.py. n_tiers > 2 remains exercisable for tests.)
    """
    N0 = o.shape[0]
    m = accel.node_packed.shape[0]
    node_rows = accel.node_packed
    tri_rows = jnp.concatenate([accel.p0, accel.e1, accel.e2], axis=1)
    HOPS = 8

    pad = (-N0) % 8
    N = N0 + pad

    def padded(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill)

    o3 = [padded(o[:, c], 0.0) for c in range(3)]
    d3 = [padded(d[:, c], 1.0) for c in range(3)]
    inv = _safe_inv(jnp.stack(d3, axis=-1))
    iv3 = [inv[:, c] for c in range(3)]
    tmn = padded(jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (N0,)), 0.0)
    tmx = padded(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N0,)), 0.0)
    if n_tiers == 2:
        widths = [N, max(8, -(-(N // 4) // 8) * 8)]
    else:
        widths = [N, max(8, N // 2), max(8, N // 4), max(8, N // 8)]

    state = dict(
        node=padded(jnp.zeros((N0,), jnp.int32), m),  # padding retired
        best_t=tmx,
        prim=jnp.full((N,), -1, jnp.int32),
        u=jnp.zeros((N,), jnp.float32),
        v=jnp.zeros((N,), jnp.float32),
        occ=jnp.zeros((N,), jnp.int32),
        orig=jnp.arange(N, dtype=jnp.int32),
        ox=o3[0], oy=o3[1], oz=o3[2],
        dx=d3[0], dy=d3[1], dz=d3[2],
        ivx=iv3[0], ivy=iv3[1], ivz=iv3[2],
        tmn=tmn, tmx=tmx,
        active=jnp.asarray(N0, jnp.int32),
    )
    KEYS = ["node", "best_t", "prim", "u", "v", "occ", "orig",
            "ox", "oy", "oz", "dx", "dy", "dz", "ivx", "ivy", "ivz",
            "tmn", "tmx"]

    def round_prefix(s, w):
        """One HOPS-round + leaf phase + compaction sort on prefix [0:w]."""
        sl = {k: s[k][:w] for k in KEYS}
        oP = (sl["ox"], sl["oy"], sl["oz"])
        dP = (sl["dx"], sl["dy"], sl["dz"])
        ivP = jnp.stack([sl["ivx"], sl["ivy"], sl["ivz"]], axis=-1)
        oA = jnp.stack(oP, axis=-1)
        dA = jnp.stack(dP, axis=-1)

        def hop(_, hs):
            node, at_leaf, leaf_start, leaf_escape = hs
            cur = jnp.minimum(node, m - 1)
            row = node_rows[cur]
            escape = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
            leafw = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
            moving = ~at_leaf & (node < m)
            hit, _ = _aabb_hit(oA, ivP, row[:, 0:3], row[:, 3:6], sl["tmn"], sl["best_t"])
            hit = hit & moving
            pause = (leafw > 0) & hit
            nxt = jnp.where(hit & (leafw == 0), cur + 1, escape)
            node = jnp.where(moving & ~pause, nxt, node)
            at_leaf = at_leaf | pause
            leaf_start = jnp.where(pause, leafw - 1, leaf_start)
            leaf_escape = jnp.where(pause, escape, leaf_escape)
            return node, at_leaf, leaf_start, leaf_escape

        zero = jnp.zeros((w,), jnp.int32)
        node, at_leaf, start, leaf_escape = jax.lax.fori_loop(
            0, HOPS, hop, (sl["node"], jnp.zeros((w,), bool), zero, zero)
        )
        tri = start[:, None] + jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :]
        tri = jnp.where(at_leaf[:, None], tri, 0)
        rows9 = tri_rows[tri]
        t, u, v, ok = _moller_trumbore(
            oA[:, None, :], dA[:, None, :],
            rows9[..., 0:3], rows9[..., 3:6], rows9[..., 6:9],
            sl["tmn"][:, None], sl["best_t"][:, None],
        )
        gid = accel.tri_perm[tri]
        ok = ok & at_leaf[:, None] & (gid >= 0)
        t = jnp.where(ok, t, _BIG)
        tj = jnp.min(t, axis=-1)
        sel_prim = jnp.min(
            jnp.where(t <= tj[:, None], gid, jnp.int32(2**30)), axis=-1
        )
        sel_mask = gid == sel_prim[:, None]
        uj = jnp.sum(jnp.where(sel_mask, u, 0.0), axis=-1)
        vj = jnp.sum(jnp.where(sel_mask, v, 0.0), axis=-1)
        better = tj < sl["best_t"]
        sl["prim"] = jnp.where(better, sel_prim, sl["prim"])
        sl["u"] = jnp.where(better, uj, sl["u"])
        sl["v"] = jnp.where(better, vj, sl["v"])
        sl["best_t"] = jnp.where(better, tj, sl["best_t"])
        occ_now = jnp.any(ok, axis=-1)
        sl["occ"] = sl["occ"] | occ_now.astype(jnp.int32)
        node = jnp.where(at_leaf, leaf_escape, node)
        if not want_closest:
            node = jnp.where(sl["occ"] != 0, m, node)
        sl["node"] = node

        # compaction: retired lanes (node == m) sort last; live lanes sort
        # by node id (subtree coherence for next round's gathers)
        sorted_ops = jax.lax.sort(
            [sl["node"]] + [sl[k] for k in KEYS[1:]], num_keys=1
        )
        out = dict(s)
        for k, arr in zip(KEYS, sorted_ops):
            out[k] = s[k].at[:w].set(arr)
        out["active"] = jnp.sum((out["node"] < m).astype(jnp.int32))
        return out

    def tier_index(active):
        idx = jnp.asarray(0, jnp.int32)
        for i, w in enumerate(widths[1:], start=1):
            idx = jnp.where(active <= w, i, idx)
        return idx

    def cond(s):
        return s["active"] > 0

    branches = [
        (lambda w: (lambda st: round_prefix(st, w)))(w) for w in widths
    ]

    if len(widths) == 2:
        def body(s):
            return jax.lax.cond(
                s["active"] <= widths[1], branches[1], branches[0], s
            )
    else:
        def body(s):
            return jax.lax.switch(tier_index(s["active"]), branches, s)

    out = jax.lax.while_loop(cond, body, state)
    # restore the caller's ray order
    restored = jax.lax.sort(
        [out["orig"], out["best_t"], out["prim"], out["u"], out["v"], out["occ"]],
        num_keys=1,
    )
    _, best_t, prim, u, v, occ = restored
    if want_closest:
        return best_t[:N0], prim[:N0], u[:N0], v[:N0]
    return occ[:N0] != 0


# ------------------------------------------------------------------ public


def _bvh_dispatch(accel: Accel, o, d, t_min, t_max, want_closest: bool):
    """Pick the stackless traversal flavor from Accel.traversal (static)."""
    kind = accel.traversal
    n = o.shape[0]
    if kind == "auto":
        if n >= TIERED_MIN_RAYS:
            return _bvh_stackless_tiered(
                accel, o, d, t_min, t_max, want_closest, n_tiers=2
            )
        return _bvh_stackless(accel, o, d, t_min, t_max, want_closest)
    if kind != "stackless":
        raise ValueError(
            f"unknown Accel.traversal {kind!r} (expected 'auto' or "
            "'stackless'; 'tiered4' was retired in round 4 — the "
            "HBM-streamed sweep, accel method 'stream', covers big meshes)"
        )
    return _bvh_stackless(accel, o, d, t_min, t_max, want_closest)


def trace_closest(accel: Accel, o: jnp.ndarray, d: jnp.ndarray, t_min=0.0, t_max=1e30) -> Hit:
    """Closest-hit trace (reference: accel.trace_closest, direct.py:22).

    Results are stop_gradient'ed: intersection is never differentiated (the
    material parameters don't move geometry, and reverse-mode through the
    traversal while_loop is undefined anyway).
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    if accel.method == "bvh":
        if accel.node_packed is not None:
            best_t, prim, u, v = _bvh_dispatch(accel, o, d, t_min, t_max, True)
        else:
            best_t, prim, u, v = _bvh_loop(accel, o, d, t_min, t_max, True)
    elif accel.method == "pallas":
        from .pallas_trace import trace_closest_pallas

        best_t, u, v, prim = trace_closest_pallas(
            accel, o, d, t_min, t_max, interpret=jax.default_backend() == "cpu"
        )
    elif accel.method == "stream":
        from ..integrators.pallas_stream import stream_trace_closest

        best_t, prim, u, v = stream_trace_closest(
            accel.stream_pack, o, d, t_min, t_max,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        best_t, prim, u, v = _brute_scan(accel, o, d, t_min, t_max, True)
    missed = prim < 0
    inst = jnp.where(missed, -1, accel.tri_inst[jnp.maximum(prim, 0)])
    hit = Hit(
        t=jnp.where(missed, _BIG, best_t),
        prim=prim,
        inst=inst,
        bary_u=u,
        bary_v=v,
    )
    return jax.tree.map(jax.lax.stop_gradient, hit)


def trace_any(accel: Accel, o: jnp.ndarray, d: jnp.ndarray, t_min=1e-4, t_max=1e30) -> jnp.ndarray:
    """Any-hit (shadow) trace (reference: accel.trace_any, direct.py:44)."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    t_max = jax.lax.stop_gradient(t_max)
    if accel.method == "bvh":
        if accel.node_packed is not None:
            return _bvh_dispatch(accel, o, d, t_min, t_max, False)
        return _bvh_loop(accel, o, d, t_min, t_max, False)
    if accel.method == "pallas":
        from .pallas_trace import trace_any_pallas

        return trace_any_pallas(
            accel, o, d, t_min, t_max, interpret=jax.default_backend() == "cpu"
        )
    if accel.method == "stream":
        from ..integrators.pallas_stream import stream_trace_any

        return stream_trace_any(
            accel.stream_pack, o, d, t_min, t_max,
            interpret=jax.default_backend() == "cpu",
        )
    return _brute_scan(accel, o, d, t_min, t_max, False)
