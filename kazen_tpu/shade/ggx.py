"""GGX-Smith microfacet math (vectorized port of ggx_brdf.h, after Heitz
2014/2018), plus the Beckmann D/G1 used by the rough* models
(bsdf.cpp:727-757). All functions operate on local-frame direction batches
(..., 3) and are differentiable; masking replaces the scalar early-outs.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as km

MIN_ALPHA = 1e-3


def schlick_fresnel(f0, cos_theta):
    """evaluateSchlickFresnel (ggx_brdf.h:22-24)."""
    w = jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)[..., None]
    return f0 + (1.0 - f0) * w


def roughness_to_alpha(roughness, anisotropy):
    """roughnessToAlpha (ggx_brdf.h:28-37): alpha = max(1e-3, r^2)*(1 +- a).

    Returns (..., 2) [alpha_x, alpha_y].
    """
    alpha = jnp.maximum(MIN_ALPHA, km.sqr(roughness))
    return jnp.stack([alpha * (1.0 + anisotropy), alpha * (1.0 - anisotropy)], -1)


def _lambda(v, alpha):
    """Smith lambda (ggx_brdf.h:41-45)."""
    vz2 = jnp.maximum(km.sqr(v[..., 2]), 1e-9)
    squared = (
        km.sqr(alpha[..., 0]) * km.sqr(v[..., 0])
        + km.sqr(alpha[..., 1]) * km.sqr(v[..., 1])
    ) / vz2
    return (-1.0 + jnp.sqrt(1.0 + squared)) * 0.5


def smith_g1(v, h, alpha):
    """G1 (ggx_brdf.h:49-55): zero when v is below the half-vector."""
    g = 1.0 / (1.0 + _lambda(v, alpha))
    return jnp.where(km.dot(v, h) <= 0.0, 0.0, g)


def smith_g2(v, l, h, alpha):
    """G2 (ggx_brdf.h:60-67)."""
    g = 1.0 / (1.0 + _lambda(v, alpha) + _lambda(l, alpha))
    return jnp.where((km.dot(v, h) <= 0.0) | (km.dot(l, h) < 0.0), 0.0, g)


def ggx_ndf(h, alpha):
    """D (ggx_brdf.h:71-75)."""
    ellipse = (
        km.sqr(h[..., 0]) / km.sqr(alpha[..., 0])
        + km.sqr(h[..., 1]) / km.sqr(alpha[..., 1])
        + km.sqr(h[..., 2])
    )
    return 1.0 / (jnp.pi * alpha[..., 0] * alpha[..., 1] * km.sqr(ellipse))


def vndf(v, h, alpha):
    """Visible-normal distribution Dv (ggx_brdf.h:80-91); also the sampling
    pdf of sample_vndf (ggx_brdf.h:124-127)."""
    vdoth = km.dot(v, h)
    d = ggx_ndf(h, alpha)
    g1 = smith_g1(v, h, alpha)
    vz = jnp.where(v[..., 2] == 0.0, 1e-9, v[..., 2])
    val = d * g1 * vdoth / vz
    return jnp.where(vdoth <= 0.0, 0.0, val)


def sample_vndf(v, alpha, u2):
    """sampleGGXSmithVNDF (ggx_brdf.h:96-120, Heitz 2018 appendix A)."""
    vh = km.normalize(
        jnp.stack(
            [alpha[..., 0] * v[..., 0], alpha[..., 1] * v[..., 1], v[..., 2]], -1
        )
    )
    lensq = km.sqr(vh[..., 0]) + km.sqr(vh[..., 1])
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-9))
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)], -1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], v.dtype), vh.shape),
    )
    t2 = km.normalize(km.cross(vh, t1))
    r = jnp.sqrt(u2[..., 0])
    phi = 2.0 * jnp.pi * u2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))[..., None] * vh
    )
    h = km.normalize(
        jnp.stack(
            [
                alpha[..., 0] * nh[..., 0],
                alpha[..., 1] * nh[..., 1],
                jnp.maximum(1e-6, nh[..., 2]),
            ],
            -1,
        )
    )
    return h


def eval_ggx_smith_brdf(v, l, f0, roughness, anisotropy):
    """evaluateGGXSmithBRDF (ggx_brdf.h:158-179): returns (brdf, F)."""
    alpha = roughness_to_alpha(roughness, anisotropy)
    h = km.normalize(v + l)
    d = ggx_ndf(h, alpha)
    g = smith_g2(v, l, h, alpha)
    f = schlick_fresnel(f0, km.dot(v, h))
    denom = 4.0 * jnp.abs(v[..., 2]) * jnp.abs(l[..., 2])
    brdf = (d * g / jnp.maximum(denom, 1e-9))[..., None] * f
    zero = (v[..., 2] * l[..., 2] < 0.0)[..., None]
    return jnp.where(zero, 0.0, brdf), f


# ---------------------------------------------------------------------------
# Beckmann microfacet pieces for roughconductor/plastic/dielectric
# (bsdf.cpp:727-757; identical copies in each class)
# ---------------------------------------------------------------------------


def beckmann_ndf(m, alpha):
    """evalBeckmann: exp(-tan^2/a^2) / (pi a^2 cos^4)."""
    ct = m[..., 2]
    ct2 = jnp.maximum(km.sqr(ct), 1e-9)
    tan2 = jnp.maximum(1.0 - km.sqr(ct), 0.0) / ct2
    return jnp.exp(-tan2 / km.sqr(alpha)) / (jnp.pi * km.sqr(alpha) * km.sqr(ct2))


def smith_beckmann_g1(v, m, alpha):
    """Rational-approx Smith-Beckmann G1 (bsdf.cpp:737-757).

    The tangent is clamped to 1e-2 *inside the approx branch only*: that
    branch is selected when a < 1.6 (i.e. large tangents), so the clamp
    never changes a taken value, but it keeps ``a`` bounded -- reverse-mode
    of the rational quotient squares a^2 terms, and an unbounded a (~1e10
    at tan==0) overflows f32 to inf - inf = NaN in the cotangents."""
    ct = v[..., 2]
    tan_theta = jnp.abs(
        jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0)) / jnp.where(ct == 0.0, 1e-9, ct)
    )
    a = 1.0 / (alpha * jnp.maximum(tan_theta, 1e-2))
    a2 = a * a
    approx = (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2)
    g = jnp.where((a >= 1.6) | (tan_theta == 0.0), 1.0, approx)
    return jnp.where(km.dot(v, m) * ct <= 0.0, 0.0, g)


def fresnel_conductor(cos_theta_i, eta, k):
    """fresnelCond (bsdf.cpp:717-726); eta/k are (..., 3)."""
    ci = cos_theta_i[..., None]
    tmp_f = km.sqr(eta) + km.sqr(k)
    tmp = tmp_f * km.sqr(ci)
    rparl2 = (tmp - 2.0 * eta * ci + 1.0) / (tmp + 2.0 * eta * ci + 1.0)
    rperp2 = (tmp_f - 2.0 * eta * ci + km.sqr(ci)) / (
        tmp_f + 2.0 * eta * ci + km.sqr(ci)
    )
    return (rparl2 + rperp2) / 2.0


# ---------------------------------------------------------------------------
# Shadow-terminator softening terms. The reference implements both in kiss
# (bsdf.cpp:1190-1213) but leaves their call sites commented out
# (:1261-1262); the always-on mechanism is the Hanika hit-point offset in
# shade/interaction.py. Provided for scenes that opt in.
# ---------------------------------------------------------------------------


def shadow_terminator_chiang(l, sh_n, geo_n):
    """[Chiang 2019] smooth G' term (bsdf.cpp:1190-1205)."""
    ndotl = jnp.maximum(0.0, km.dot(sh_n, l))
    ngdotl = jnp.maximum(0.0, km.dot(geo_n, l))
    ngdotn = jnp.maximum(0.0, km.dot(geo_n, sh_n))
    denom = ndotl * ngdotn
    g = ngdotl / jnp.where(denom == 0.0, 1.0, denom)
    smooth = -(g * g * g) + g * g + g
    out = jnp.where(g <= 1.0, smooth, 1.0)
    return jnp.where((ndotl == 0.0) | (ngdotl == 0.0) | (ngdotn == 0.0), 0.0, out)


def shadow_terminator_soften(geo_n, sh_n, wi, alpha: float = 0.05):
    """[Predictable and Targeted Softening ...] (bsdf.cpp:1208-1213)."""
    import math as pymath

    d = km.lerp(
        km.dot(sh_n, geo_n), pymath.sin(alpha + 0.1), pymath.sin(alpha)
    )
    t = jnp.clip(km.dot(geo_n, wi) / jnp.where(d == 0.0, 1e-9, d), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)
