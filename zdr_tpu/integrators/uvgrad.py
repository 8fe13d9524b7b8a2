"""Screen-space → texture-space Jacobian AOV (duv/dxy).

Reference: /root/reference/uvgrad.py. Per sample: a central ray plus two
offset rays one pixel apart; build dp/duv from the hit triangle's vertex
data, intersect the offset rays with the hit plane to get dp/dx and dp/dy,
then least-squares invert to (du/dx, dv/dx, du/dy, dv/dy).

Note: the reference reads *untransformed* vertex positions here
(uvgrad.py:30-35), which is only correct for identity instance transforms;
our geometry is pre-transformed to world space so this path is correct for
any transform. Not differentiable (used for footprint visualization,
example.py:61-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..accel import trace_closest
from ..camera import generate_ray, tent_warp
from ..samplers import make_sampler
from ..scenedata import SceneData
from ..vecmath import cross, dot, normalize
from .wrapper import RenderConfig, _pixel_grid


def _trace_duvdxy(data: SceneData, o, d, o_dx, d_dx, o_dy, d_dy):
    from ..interaction import gather_rows

    hit = trace_closest(data.accel, o, d)
    prim = jnp.maximum(hit.prim, 0)
    tri = gather_rows(data.geom.triangles, prim)
    p0 = gather_rows(data.geom.positions, tri[..., 0])
    p1 = gather_rows(data.geom.positions, tri[..., 1])
    p2 = gather_rows(data.geom.positions, tri[..., 2])
    t0 = gather_rows(data.geom.uvs, tri[..., 0])
    t1 = gather_rows(data.geom.uvs, tri[..., 1])
    t2 = gather_rows(data.geom.uvs, tri[..., 2])
    p = hit.interpolate(p0, p1, p2)

    # dp/duv: dpde (3x2 cols e1,e2) times inverse of duvde (2x2), v flipped
    e1, e2 = p1 - p0, p2 - p0
    du1, dv1 = t1[..., 0] - t0[..., 0], t1[..., 1] - t0[..., 1]
    du2, dv2 = t2[..., 0] - t0[..., 0], t2[..., 1] - t0[..., 1]
    det = du1 * dv2 - dv1 * du2
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    #   [du1 du2]^-1 = inv_det * [ dv2 -du2]
    #   [dv1 dv2]               [-dv1  du1]
    dpdu = (e1 * dv2[..., None] - e2 * dv1[..., None]) * inv_det[..., None]
    dpdv = (e2 * du1[..., None] - e1 * du2[..., None]) * inv_det[..., None]
    dpdv = -dpdv  # inverted v (uvgrad.py:15)

    ng = normalize(cross(e1, e2))

    def plane_hit(oo, dd):
        t = dot(p - oo, ng) / jnp.where(
            jnp.abs(dot(dd, ng)) > 1e-12, dot(dd, ng), 1.0
        )
        return oo + t[..., None] * dd

    dpdx = plane_hit(o_dx, d_dx) - p
    dpdy = plane_hit(o_dy, d_dy) - p

    # least squares: [duvdx] = (A^T A)^-1 A^T dpdx with A = [dpdu dpdv]
    a00 = dot(dpdu, dpdu)
    a01 = dot(dpdu, dpdv)
    a11 = dot(dpdv, dpdv)
    det_a = a00 * a11 - a01 * a01
    inv_a = jnp.where(jnp.abs(det_a) > 1e-20, 1.0 / jnp.where(det_a == 0, 1.0, det_a), 0.0)

    def solve(dp):
        b0 = dot(dpdu, dp)
        b1 = dot(dpdv, dp)
        du = (a11 * b0 - a01 * b1) * inv_a
        dv = (a00 * b1 - a01 * b0) * inv_a
        return du, dv

    dudx, dvdx = solve(dpdx)
    dudy, dvdy = solve(dpdy)
    out = jnp.stack([dudx, dvdx, dudy, dvdy], axis=-1)
    return jnp.where(hit.miss[..., None], 0.0, out)


def render_uvgrad(data: SceneData, camera, seed, cfg: RenderConfig):
    """Render the (du/dx, dv/dx, du/dy, dv/dy) AOV -> (H, W, 4)."""
    w, h = cfg.res
    coords = _pixel_grid(cfg.res)
    resf = jnp.array([w, h], jnp.float32)
    aspect = jnp.array([1.0, h / w], jnp.float32)

    def one_sample(acc, it):
        sampler = make_sampler("lcg", coords, seed, cfg.spp, it)
        u2, sampler = sampler.next2()

        # offset rays share the central jitter, one pixel apart (uvgrad.py:88-94)
        offset = tent_warp(u2, 1.0) + 0.5 if cfg.use_tent_filter else u2
        base = coords.astype(jnp.float32) + offset
        pix = (2.0 / resf * base - 1.0) * aspect
        pix_dx = (2.0 / resf * (base + jnp.array([1.0, 0.0])) - 1.0) * aspect
        pix_dy = (2.0 / resf * (base + jnp.array([0.0, 1.0])) - 1.0) * aspect
        o_c, d_c = generate_ray(camera, pix)
        o_dx, d_dx = generate_ray(camera, pix_dx)
        o_dy, d_dy = generate_ray(camera, pix_dy)
        g = _trace_duvdxy(data, o_c, d_c, o_dx, d_dx, o_dy, d_dy)
        g = jnp.where(jnp.any(jnp.isnan(g), axis=-1, keepdims=True), 0.0, g)
        return acc + g, None

    acc, _ = jax.lax.scan(
        one_sample, jnp.zeros((h * w, 4), jnp.float32), jnp.arange(cfg.spp)
    )
    return (acc / cfg.spp).reshape(h, w, 4)
