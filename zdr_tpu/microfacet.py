"""Isotropic GGX (Trowbridge-Reitz) microfacet BRDF: eval / sample / pdf.

Reference: /root/reference/microfacet.py. The model is the standard
pbrt-v4-style GGX with Schlick Fresnel, Smith geometry, and a 50/50 mixture
of cosine-hemisphere and visible-normal (VNDF) sampling. All functions are
batched over the last axis and pure, so `jax.grad` differentiates eval for
free (the reference needed in-kernel source-transform AD for this).

Sampling functions take explicit uniform random numbers instead of a stateful
sampler; the integrator threads its sampler and passes draws in the same
order the reference consumes them (microfacet.py:41-49).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .vecmath import dot, length_squared, lerp, normalize, reflect

_PI = math.pi


def ggx_distribution(h: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    alpha2 = alpha * alpha
    nh = jnp.maximum(1e-5, h[..., 2])
    denom = nh * nh * (alpha2 - 1.0) + 1.0
    return alpha2 / (_PI * denom * denom)


def fresnel_schlick(cos_theta: jnp.ndarray, specular) -> jnp.ndarray:
    return specular + (1.0 - specular) * (1.0 - cos_theta) ** 5


def smith_geometry(v: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    alpha2 = alpha * alpha
    nv = jnp.maximum(1e-5, v[..., 2])
    nv2 = nv * nv
    return 2.0 / (1.0 + jnp.sqrt(1.0 + alpha2 * (1.0 - nv2) / nv2))


def ggx_brdf(
    wo: jnp.ndarray,
    wi: jnp.ndarray,
    diffuse: jnp.ndarray,
    specular,
    roughness: jnp.ndarray,
) -> jnp.ndarray:
    """BRDF * cos(wi). `diffuse` is (..., 3); `roughness` (...,)."""
    alpha = roughness * roughness
    h = normalize(wi + wo)
    d = ggx_distribution(h, alpha)
    f = fresnel_schlick(jnp.clip(dot(wo, h), 1e-5, 1.0), specular)
    g = smith_geometry(wi, alpha) * smith_geometry(wo, alpha)
    wiz = jnp.maximum(1e-5, wi[..., 2])
    woz = jnp.maximum(1e-5, wo[..., 2])
    spec_term = (d * f * g) / (4.0 * wiz * woz)
    return (spec_term[..., None] + diffuse / _PI) * wi[..., 2:3]


def cosine_sample_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * _PI * u[..., 1]
    z = jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_uniform_disk_polar(u: jnp.ndarray) -> jnp.ndarray:
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * _PI * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_wm(w: jnp.ndarray, alpha: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Sample a visible microfacet normal (pbrt-v4 VNDF; microfacet.py:71-92)."""
    wh = normalize(
        jnp.concatenate([alpha[..., None] * w[..., :2], w[..., 2:3]], axis=-1)
    )
    wh = jnp.where(wh[..., 2:3] < 0.0, -wh, wh)
    # cross((0,0,1), wh) = (-wh.y, wh.x, 0), written out (an .at[].set()
    # constant axis builds a scatter op on TPU)
    zero = jnp.zeros_like(wh[..., 0])
    t1_generic = normalize(
        jnp.stack([-wh[..., 1], wh[..., 0], zero], axis=-1)
    )
    t1_degenerate = jnp.stack([zero + 1.0, zero, zero], axis=-1)
    t1 = jnp.where(wh[..., 2:3] < 0.99999, t1_generic, t1_degenerate)
    t2 = jnp.cross(wh, t1)
    p = sample_uniform_disk_polar(u)
    h = jnp.sqrt(jnp.maximum(1.0 - p[..., 0] ** 2, 0.0))
    py = lerp(h, p[..., 1], (1.0 + wh[..., 2]) / 2.0)
    p = jnp.stack([p[..., 0], py], axis=-1)
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - length_squared(p)))
    nh = p[..., 0:1] * t1 + p[..., 1:2] * t2 + pz[..., None] * wh
    wm = normalize(
        jnp.concatenate(
            [alpha[..., None] * nh[..., :2], jnp.maximum(1e-6, nh[..., 2:3])],
            axis=-1,
        )
    )
    return wm


def pdf_wm(w: jnp.ndarray, wm: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return (
        smith_geometry(w, alpha)
        / jnp.maximum(jnp.abs(w[..., 2]), 1e-9)
        * ggx_distribution(wm, alpha)
        * jnp.abs(dot(w, wm))
    )


def ggx_sample(
    wo: jnp.ndarray,
    roughness: jnp.ndarray,
    u_lobe: jnp.ndarray,
    u2: jnp.ndarray,
) -> jnp.ndarray:
    """Draw wi from the 50/50 cosine + VNDF mixture (microfacet.py:40-49).

    `u_lobe` is the lobe-selection uniform (the reference's sampler.next()),
    `u2` the 2D sample. Both lobes are evaluated and selected to keep control
    flow compiler-friendly; the estimator is per-ray tiny so this is cheap.
    """
    diffuse_wi = cosine_sample_hemisphere(u2)
    alpha = roughness * roughness
    wm = sample_wm(wo, alpha, u2)
    glossy_wi = reflect(-wo, wm)
    return jnp.where((u_lobe < 0.5)[..., None], diffuse_wi, glossy_wi)


def ggx_sample_pdf(
    wo: jnp.ndarray, wi: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    alpha = roughness * roughness
    wm = normalize(wi + wo)
    diffuse_pdf = wi[..., 2] / _PI
    glossy_pdf = pdf_wm(wo, wm, alpha) / (4.0 * jnp.maximum(jnp.abs(dot(wo, wm)), 1e-9))
    return 0.5 * diffuse_pdf + 0.5 * glossy_pdf
