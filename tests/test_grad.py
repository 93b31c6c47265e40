"""Gradient validation: autodiff through the renderer vs finite differences.

Because the sampler streams are deterministic (counter-based), a central
finite difference on a scene parameter uses IDENTICAL random numbers on both
sides, so FD equals the true derivative of this exact estimator up to
higher-order terms -- the BASELINE 'grad-allclose' check. max_depth < 3
avoids Russian-roulette discontinuities.
"""
import numpy as np
import jax
import jax.numpy as jnp

import scenes
from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.integrate.render import render


def _loss_for(scene_desc, field, spp):
    arrays0, static = compile_scene(scene_desc, use_bvh=False)

    def loss(val):
        mats = arrays0.materials._replace(**{field: val})
        arrays = arrays0._replace(materials=mats)
        img = render(arrays, static, spp=spp)
        return jnp.mean(img)

    return loss, getattr(arrays0.materials, field)


def test_grad_albedo_matches_fd():
    scene = scenes.cornell_box(width=12, height=12, spp=2, max_depth=2)
    loss, base = _loss_for(scene, "base_color", spp=2)
    g = jax.grad(loss)(base)
    # FD on the floor material's red channel (material 0)
    h = 1e-3
    for (mi, ch) in [(0, 0), (3, 1)]:
        e = jnp.zeros_like(base).at[mi, ch].set(h)
        fd = (float(loss(base + e)) - float(loss(base - e))) / (2 * h)
        ad = float(g[mi, ch])
        assert abs(fd - ad) <= 2e-3 * max(abs(fd), abs(ad), 1e-3), (
            f"mat {mi} ch {ch}: fd={fd} ad={ad}"
        )


def test_grad_kiss_roughness_reparam_matches_fd():
    """Reparameterized VNDF sampling gradient at the BSDF level: the sampled
    lobe is a smooth function of roughness given fixed uniforms, so FD==AD.
    (Through a full render, visibility discontinuities make FD noisy at low
    sample counts -- the continuous-parameter render tests cover that path.)
    """
    from kazen_tpu.core import math as km
    from kazen_tpu.shade import bsdf as bsdf_mod
    from kazen_tpu.scene.compiler import compile_scene as _cs

    scene = scenes.cornell_box(
        width=8, height=8, spp=1,
        wall_bsdf=D.KazenStandard(
            base_color=D.ConstantTexture((0.6, 0.6, 0.6)),
            roughness=D.ConstantTexture((0.4,) * 3),
        ),
    )
    arrays, static = _cs(scene, use_bvh=False)
    n = 50_000
    r = np.random.default_rng(3)
    s1 = jnp.asarray(r.random(n, dtype=np.float32))
    s2 = jnp.asarray(r.random((n, 2), dtype=np.float32))
    uv = jnp.asarray(r.random((n, 2), dtype=np.float32))
    mat_id = jnp.zeros(n, jnp.int32)
    frame = km.frame_from_normal(
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    )
    wi = jnp.broadcast_to(
        jnp.asarray([np.sin(0.5), 0.0, np.cos(0.5)], dtype=jnp.float32), (n, 3)
    )

    def per_lane(rough_val):
        mats = arrays.materials._replace(
            roughness=arrays.materials.roughness.at[0].set(rough_val)
        )
        sc = arrays._replace(materials=mats)
        res = bsdf_mod.sample(
            static, sc, mat_id, uv, frame, frame.s, wi, s1, s2, jnp.zeros(n)
        )
        # smooth functional of the sampled lobe + weight
        return km.luminance(res.weight) * (1.0 + res.wo[:, 2])

    # per-lane AD via jvp; per-lane central FD. A handful of lanes sit on
    # discontinuous guards (pdf<=eps rejects) and flip under +-h -- exclude
    # them; the continuous bulk must match tightly.
    x = jnp.float32(0.4)
    _, ad = jax.jvp(per_lane, (x,), (jnp.float32(1.0),))
    ad = np.asarray(ad, np.float64)
    h = 2e-3
    fd = (
        np.asarray(per_lane(x + h), np.float64)
        - np.asarray(per_lane(x - h), np.float64)
    ) / (2 * h)
    err = np.abs(fd - ad)
    tol = 0.02 * np.maximum(np.abs(ad), 0.05)
    good = err <= tol
    assert good.mean() > 0.99, (
        f"only {good.mean():.4%} lanes agree; "
        f"median |fd-ad|={np.median(err):.3g}"
    )
    # and the trimmed means agree (robust global check)
    keep = err < np.quantile(err, 0.995)
    np.testing.assert_allclose(
        fd[keep].mean(), ad[keep].mean(), rtol=0.05, atol=1e-4
    )


def test_grad_light_radiance_linear():
    """Image is linear in light radiance: grad == image/intensity exactly."""
    scene = scenes.cornell_box(width=10, height=10, spp=2, max_depth=3)
    arrays0, static = compile_scene(scene, use_bvh=False)

    def loss(rad):
        arrays = arrays0._replace(light_radiance=rad)
        return jnp.mean(render(arrays, static, spp=2))

    base = arrays0.light_radiance
    g = jax.grad(loss)(base)
    # linearity: loss(2*rad) == 2*loss(rad); grad . rad == loss
    l1 = float(loss(base))
    np.testing.assert_allclose(
        float(jnp.sum(g * base)), l1, rtol=1e-4
    )


def test_grad_texels_flow():
    """Texture gradients reach the texel pool (inverse-rendering path)."""
    tex = D.ImageTexture(
        data=np.full((8, 8, 3), 0.5, np.float32), colorspace="linear"
    )
    scene = scenes.cornell_box(
        width=10, height=10, spp=2, max_depth=2,
        wall_bsdf=D.Lambertian(albedo=tex),
    )
    arrays0, static = compile_scene(scene, use_bvh=False)

    def loss(texels):
        arrays = arrays0._replace(
            textures=arrays0.textures._replace(texels=texels)
        )
        return jnp.mean(render(arrays, static, spp=2))

    g = np.asarray(jax.grad(loss)(arrays0.textures.texels))
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).any()


def test_grad_fd_matrix_all_bsdfs():
    """FD-vs-AD over every BSDF type (VERDICT r2 ask #8): one small render
    per material class, central differences on a continuous parameter of
    that class. Streams are counter-based, so both FD sides see identical
    uniforms; parameters that modulate *discrete* lobe probabilities
    (dielectric IOR, plastic kd, rough-glass alpha) can flip a finite
    number of lane decisions inside the FD window -- those rows get a
    looser (still deterministic) tolerance."""
    cases = [
        # (bsdf, MaterialTable field, rel tolerance)
        (D.Diffuse((0.6, 0.5, 0.4)), "base_color", 2e-3),
        (D.Lambertian(albedo=D.ConstantTexture((0.5, 0.6, 0.7))),
         "base_color", 2e-3),
        (D.Dielectric(), "int_ior", 5e-2),
        (D.NormalMap(nested=D.Diffuse((0.7, 0.6, 0.5)),
                     normals=D.ConstantTexture((0.5, 0.5, 1.0))),
         "base_color", 2e-3),
        (D.GGX(albedo=D.ConstantTexture((0.6, 0.6, 0.6)), roughness=0.4),
         "roughness", 1e-2),
        (D.RoughConductor(material="Cu", alpha=0.3), "alpha", 1e-2),
        (D.RoughPlastic(alpha=0.3, kd=(0.5, 0.4, 0.3)), "base_color", 5e-2),
        (D.RoughDielectric(roughness=0.35), "alpha", 5e-2),
        (D.KazenStandard(
            base_color=D.ConstantTexture((0.7, 0.5, 0.3)),
            roughness=D.ConstantTexture((0.4,) * 3)),
         "base_color", 2e-3),
    ]
    h = 1e-3
    for bsdf, field, tol in cases:
        scene = scenes.cornell_box(
            width=8, height=8, spp=1, max_depth=2, wall_bsdf=bsdf
        )
        loss, base = _loss_for(scene, field, spp=1)
        g = jax.grad(loss)(base)
        e = jnp.full_like(base, h)
        fd = (float(loss(base + e)) - float(loss(base - e))) / (2 * h)
        ad = float(jnp.sum(g))
        denom = max(abs(fd), abs(ad), 1e-4)
        assert abs(fd - ad) <= tol * denom, (
            f"{type(bsdf).__name__}.{field}: fd={fd} ad={ad}"
        )

    # mirror has no continuous material parameter; its differentiable path
    # is radiance through the specular chain -- grad wrt light radiance
    # must equal FD exactly (linear)
    scene = scenes.cornell_box(
        width=8, height=8, spp=1, max_depth=3, wall_bsdf=D.Mirror()
    )
    arrays0, static = compile_scene(scene, use_bvh=False)

    def lloss(rad):
        return jnp.mean(render(arrays0._replace(light_radiance=rad),
                               static, spp=1))

    rad0 = arrays0.light_radiance
    g = jax.grad(lloss)(rad0)
    e = jnp.full_like(rad0, 1e-2)
    fd = (float(lloss(rad0 + e)) - float(lloss(rad0 - e))) / 2e-2
    ad = float(jnp.sum(g * jnp.ones_like(rad0)))
    assert abs(fd - ad) <= 2e-3 * max(abs(fd), abs(ad), 1e-4), (fd, ad)
