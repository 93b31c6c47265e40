"""Square-to-distribution warps + pdfs (warp.cpp:7-130), batched and
differentiable. Sample args are (..., 2) uniforms in [0,1); outputs are
(..., 2) or (..., 3)."""
from __future__ import annotations

import jax.numpy as jnp

from .math import INV_FOURPI, INV_PI, INV_TWOPI, cos_theta, vec3


def square_to_uniform_square(s):
    return s


def square_to_uniform_square_pdf(s):
    inside = jnp.all((s >= 0.0) & (s <= 1.0), axis=-1)
    return jnp.where(inside, 1.0, 0.0)


def _interval_to_tent(s):
    sign = jnp.where(s < 0.5, 1.0, -1.0)
    s2 = jnp.where(s < 0.5, 2.0 * s, 2.0 * (s - 0.5))
    return sign * (1.0 - jnp.sqrt(jnp.maximum(s2, 0.0)))


def square_to_tent(s):
    return jnp.stack(
        [_interval_to_tent(s[..., 0]), _interval_to_tent(s[..., 1])], axis=-1
    )


def square_to_tent_pdf(p):
    return (1.0 - jnp.abs(p[..., 0])) * (1.0 - jnp.abs(p[..., 1]))


def square_to_uniform_disk(s):
    r = jnp.sqrt(s[..., 0])
    phi = 2.0 * jnp.pi * s[..., 1]
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r], axis=-1)


def square_to_uniform_disk_pdf(p):
    return jnp.full(p.shape[:-1], INV_PI)


def square_to_uniform_sphere(s):
    z = 1.0 - 2.0 * s[..., 1]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * s[..., 0]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_sphere_pdf(v):
    return jnp.full(v.shape[:-1], INV_FOURPI)


def square_to_uniform_hemisphere(s):
    z = s[..., 0]
    tmp = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * s[..., 1]
    return vec3(jnp.cos(phi) * tmp, jnp.sin(phi) * tmp, z)


def square_to_uniform_hemisphere_pdf(v):
    return jnp.full(v.shape[:-1], INV_TWOPI)


def square_to_cosine_hemisphere(s):
    """Concentric-disk (Cline) mapping + lift (warp.cpp:86-115)."""
    r1 = 2.0 * s[..., 0] - 1.0
    r2 = 2.0 * s[..., 1] - 1.0
    use_r1 = r1 * r1 > r2 * r2
    r = jnp.where(use_r1, r1, r2)
    safe_r1 = jnp.where(r1 == 0.0, 1.0, r1)
    safe_r2 = jnp.where(r2 == 0.0, 1.0, r2)
    phi = jnp.where(
        use_r1,
        (jnp.pi / 4.0) * (r2 / safe_r1),
        (jnp.pi / 2.0) - (r1 / safe_r2) * (jnp.pi / 4.0),
    )
    degen = (r1 == 0.0) & (r2 == 0.0)
    r = jnp.where(degen, 0.0, r)
    phi = jnp.where(degen, 0.0, phi)
    px = r * jnp.cos(phi)
    py = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - px * px - py * py, 0.0))
    z = jnp.where(z == 0.0, 1e-10, z)
    return vec3(px, py, z)


def square_to_cosine_hemisphere_pdf(v):
    return INV_PI * cos_theta(v)


def square_to_beckmann(s, alpha):
    phi = 2.0 * jnp.pi * s[..., 0]
    theta = jnp.arctan(
        alpha * jnp.sqrt(jnp.log(1.0 / jnp.maximum(1.0 - s[..., 1], 1e-9)))
    )
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return vec3(st * jnp.cos(phi), st * jnp.sin(phi), ct)


def square_to_beckmann_pdf(m, alpha):
    ct = jnp.clip(m[..., 2], -1.0, 1.0)
    tan2 = jnp.maximum(1.0 - ct * ct, 0.0) / jnp.maximum(ct * ct, 1e-9)
    pdf = jnp.exp(-tan2 / (alpha * alpha)) / (
        jnp.pi * alpha * alpha * jnp.maximum(ct, 1e-9) ** 3
    )
    return jnp.where(ct > 0.0, pdf, 0.0)
