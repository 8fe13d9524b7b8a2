"""Pallas TPU kernel for dense ray-scene intersection.

The jnp brute-force path (trace.py) materializes (N_rays, chunk) temporaries
in HBM; this kernel keeps the whole Möller–Trumbore sweep in VMEM/registers:
each grid step owns a (8, 128)-multiple block of rays, loops over the
triangle list (static trip count), and writes only the final hit record —
HBM traffic drops from O(N*T) to O(N).

Rays and hit outputs are laid out as component planes of shape (R, 128)
(struct-of-arrays; a trailing xyz axis of 3 would pad to 128 lanes on TPU).
Triangle data lives in VMEM as (T_pad, 1) planes read as broadcast scalars.

Intended for the scenes the reference actually renders (tens..thousands of
triangles); BVH traversal remains the jnp while_loop for big meshes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK_ROWS = 256  # rows of 128 lanes per grid step (32768 rays)
UNROLL_LIMIT = 0  # unrolling measured slower than fori_loop (register pressure)

_BIG = jnp.float32(1e30)


def _closest_kernel(n_tris: int, tri_refs, ray_refs, out_refs):
    (tri_r,) = tri_refs  # (T_pad, 16): cols 0-8 = p0/e1/e2 xyz components
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tmin_r, tmax_r = ray_refs
    t_out, u_out, v_out, prim_out = out_refs

    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
    t_min = tmin_r[:]

    def body(t_i, carry):
        best_t, best_u, best_v, best_prim = carry
        ap0x = tri_r[t_i, 0]
        ap0y = tri_r[t_i, 1]
        ap0z = tri_r[t_i, 2]
        ae1x = tri_r[t_i, 3]
        ae1y = tri_r[t_i, 4]
        ae1z = tri_r[t_i, 5]
        ae2x = tri_r[t_i, 6]
        ae2y = tri_r[t_i, 7]
        ae2z = tri_r[t_i, 8]
        hx = dy * ae2z - dz * ae2y
        hy = dz * ae2x - dx * ae2z
        hz = dx * ae2y - dy * ae2x
        a = ae1x * hx + ae1y * hy + ae1z * hz
        f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
        sx = ox - ap0x
        sy = oy - ap0y
        sz = oz - ap0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * ae1z - sz * ae1y
        qy = sz * ae1x - sx * ae1z
        qz = sx * ae1y - sy * ae1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (ae2x * qx + ae2y * qy + ae2z * qz)
        ok = (
            (jnp.abs(a) > 1e-12)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > t_min)
            & (t < best_t)
        )
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
        best_prim = jnp.where(ok, t_i, best_prim)
        best_t = jnp.where(ok, t, best_t)
        return best_t, best_u, best_v, best_prim

    init = (
        tmax_r[:],
        jnp.zeros_like(ox),
        jnp.zeros_like(ox),
        jnp.full(ox.shape, -1, jnp.int32),
    )
    if n_tris <= UNROLL_LIMIT:
        carry = init
        for t_i in range(n_tris):  # static scalar reads, fully pipelined
            carry = body(t_i, carry)
        best_t, best_u, best_v, best_prim = carry
    else:
        best_t, best_u, best_v, best_prim = jax.lax.fori_loop(0, n_tris, body, init)
    t_out[:] = best_t
    u_out[:] = best_u
    v_out[:] = best_v
    prim_out[:] = best_prim


def _any_kernel(n_tris: int, tri_refs, ray_refs, out_refs):
    (tri_r,) = tri_refs  # (T_pad, 16)
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tmin_r, tmax_r = ray_refs
    (occ_out,) = out_refs
    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
    t_min = tmin_r[:]
    t_max = tmax_r[:]

    def body2(t_i, occ):
        ap0x = tri_r[t_i, 0]
        ap0y = tri_r[t_i, 1]
        ap0z = tri_r[t_i, 2]
        ae1x = tri_r[t_i, 3]
        ae1y = tri_r[t_i, 4]
        ae1z = tri_r[t_i, 5]
        ae2x = tri_r[t_i, 6]
        ae2y = tri_r[t_i, 7]
        ae2z = tri_r[t_i, 8]
        hx = dy * ae2z - dz * ae2y
        hy = dz * ae2x - dx * ae2z
        hz = dx * ae2y - dy * ae2x
        a = ae1x * hx + ae1y * hy + ae1z * hz
        f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
        sx = ox - ap0x
        sy = oy - ap0y
        sz = oz - ap0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * ae1z - sz * ae1y
        qy = sz * ae1x - sx * ae1z
        qz = sx * ae1y - sy * ae1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (ae2x * qx + ae2y * qy + ae2z * qz)
        ok = (
            (jnp.abs(a) > 1e-12)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > t_min)
            & (t < t_max)
        )
        # int32 throughout: bool vector loop carries / output tiles fail
        # Mosaic compilation on this toolchain
        return occ | ok.astype(jnp.int32)

    if n_tris <= UNROLL_LIMIT:
        occ = jnp.zeros(ox.shape, dtype=jnp.int32)
        for t_i in range(n_tris):
            occ = body2(t_i, occ)
    else:
        occ = jax.lax.fori_loop(
            0, n_tris, body2, jnp.zeros(ox.shape, dtype=jnp.int32)
        )
    occ_out[:] = occ


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = rows * LANES - n
    return jnp.pad(x, (0, pad)).reshape(rows, LANES)


@functools.partial(jax.jit, static_argnames=("n_tris", "want_closest", "interpret"))
def _pallas_trace(tri_packed, n_tris, o, d, t_min, t_max, want_closest: bool, interpret: bool):
    n = o.shape[0]
    rows_total = math.ceil(n / LANES)
    rows_total = math.ceil(rows_total / BLOCK_ROWS) * BLOCK_ROWS
    shape2d = (rows_total, LANES)

    ray_planes = [
        _pad_rows(o[:, 0], rows_total),
        _pad_rows(o[:, 1], rows_total),
        _pad_rows(o[:, 2], rows_total),
        _pad_rows(d[:, 0], rows_total),
        _pad_rows(d[:, 1], rows_total),
        _pad_rows(d[:, 2], rows_total),
        _pad_rows(jnp.broadcast_to(t_min, (n,)).astype(jnp.float32), rows_total),
        _pad_rows(jnp.broadcast_to(t_max, (n,)).astype(jnp.float32), rows_total),
    ]

    grid = (rows_total // BLOCK_ROWS,)
    tri_spec = pl.BlockSpec(tri_packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    if want_closest:
        def kernel(*refs):
            _closest_kernel(n_tris, refs[:1], refs[1:9], refs[9:])

        out_shape = [
            jax.ShapeDtypeStruct(shape2d, jnp.float32),
            jax.ShapeDtypeStruct(shape2d, jnp.float32),
            jax.ShapeDtypeStruct(shape2d, jnp.float32),
            jax.ShapeDtypeStruct(shape2d, jnp.int32),
        ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tri_spec] + [ray_spec] * 8,
            out_specs=[ray_spec] * 4,
            out_shape=out_shape,
            interpret=interpret,
        )(tri_packed, *ray_planes)
        t, u, v, prim = (x.reshape(-1)[:n] for x in outs)
        return t, u, v, prim

    def kernel(*refs):
        _any_kernel(n_tris, refs[:1], refs[1:9], refs[9:])

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tri_spec] + [ray_spec] * 8,
        out_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(shape2d, jnp.int32)],
        interpret=interpret,
    )(tri_packed, *ray_planes)
    return outs[0].reshape(-1)[:n] != 0


def make_tri_packed(p0, e1, e2):
    """(T,3) triangle arrays -> ONE (T_pad, 16) component-column array.

    The original layout — nine separate (T, 1) planes — tiled each plane's
    single-lane axis up to 128 VMEM lanes (4.6 KB per triangle!), OOMing
    the kernel beyond ~3k triangles. One array with components in columns
    is 512 B/triangle (lanes pad 16 -> 128; Mosaic requires the dynamic
    scalar index on the sublane axis, so the long axis cannot sit on
    lanes), lifting the dense sweep's VMEM cap to ~16k triangles."""
    t = p0.shape[0]
    t_pad = -(-max(t, 1) // 8) * 8
    packed = jnp.concatenate([p0, e1, e2], axis=1)  # (T, 9)
    return jnp.pad(packed, ((0, t_pad - t), (0, 7)))


def trace_closest_pallas(accel, o, d, t_min, t_max, interpret: bool = False):
    packed = make_tri_packed(accel.p0, accel.e1, accel.e2)
    return _pallas_trace(
        packed, accel.p0.shape[0], o, d, t_min, t_max, True, interpret
    )


def trace_any_pallas(accel, o, d, t_min, t_max, interpret: bool = False):
    packed = make_tri_packed(accel.p0, accel.e1, accel.e2)
    return _pallas_trace(
        packed, accel.p0.shape[0], o, d, t_min, t_max, False, interpret
    )
