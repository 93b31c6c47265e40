"""BSDF validation: eval/pdf/sample cross-consistency for every material.

For each smooth BSDF, two independent estimates of the directional albedo
integral I(wi) = int f(wi, wo) cos dOmega must agree:
  A. uniform-sphere MC over eval (pdf-free)
  B. importance sampling: E[sample weight] (= E[eval/pdf])
This catches any mismatch between eval, pdf, and the sampling routine.
Discrete BSDFs get law-of-reflection/Snell checks instead.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import scenes
from kazen_tpu.core import math as km
from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.shade import bsdf as bsdf_mod

N = 200_000
RNG = np.random.default_rng(11)


def _setup(bsdf_desc):
    scene = scenes.cornell_box(width=8, height=8, spp=1, wall_bsdf=bsdf_desc)
    arrays, static = compile_scene(scene, use_bvh=False)
    # wall material id 0 (first mesh)
    mat_id = jnp.zeros(N, jnp.int32)
    uv = jnp.asarray(RNG.random((N, 2), dtype=np.float32))
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))
    frame = km.frame_from_normal(n)
    dpdu = frame.s
    accum = jnp.zeros(N)
    return arrays, static, mat_id, uv, frame, dpdu, accum


def _wi(theta_deg):
    t = np.deg2rad(theta_deg)
    wi = jnp.asarray([np.sin(t), 0.0, np.cos(t)], dtype=jnp.float32)
    return jnp.broadcast_to(wi, (N, 3))


def _uniform_sphere(seed):
    r = np.random.default_rng(seed)
    v = r.normal(size=(N, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.asarray(v)


def _consistency(bsdf_desc, theta=35.0, rtol=0.04, check_pdf_norm=True):
    arrays, static, mat_id, uv, frame, dpdu, accum = _setup(bsdf_desc)
    wi = _wi(theta)

    # A: uniform-sphere estimate of int eval dOmega
    wo_u = _uniform_sphere(5)
    f = bsdf_mod.eval(static, arrays, mat_id, uv, frame, dpdu, wi, wo_u, accum)
    est_a = float(jnp.mean(km.luminance(f)) * 4 * np.pi)

    # B: importance-sampled estimate = E[weight]
    s1 = jnp.asarray(RNG.random(N, dtype=np.float32))
    s2 = jnp.asarray(RNG.random((N, 2), dtype=np.float32))
    res = bsdf_mod.sample(
        static, arrays, mat_id, uv, frame, dpdu, wi, s1, s2, accum
    )
    est_b = float(jnp.mean(km.luminance(res.weight)))
    assert est_a > 0.0
    np.testing.assert_allclose(est_a, est_b, rtol=rtol), bsdf_desc

    if check_pdf_norm:
        pdf = bsdf_mod.pdf(
            static, arrays, mat_id, uv, frame, dpdu, wi, wo_u, accum
        )
        norm = float(jnp.mean(pdf) * 4 * np.pi)
        np.testing.assert_allclose(norm, 1.0, atol=0.05)

    # sampled directions must be valid where weight > 0
    w_pos = np.asarray(res.weight).max(axis=-1) > 0
    wo = np.asarray(res.wo)[w_pos]
    np.testing.assert_allclose(np.linalg.norm(wo, axis=-1), 1.0, atol=1e-3)


def test_diffuse_consistency():
    _consistency(D.Diffuse((0.6, 0.4, 0.2)))


def test_lambertian_consistency():
    _consistency(D.Lambertian(albedo=D.ConstantTexture((0.5, 0.5, 0.5))))


def test_ggx_consistency():
    _consistency(D.GGX(albedo=D.ConstantTexture((1.0, 1.0, 1.0)), roughness=0.4))


def test_roughconductor_consistency():
    # Beckmann-NDF (not VNDF) sampling: weights are higher-variance and the
    # pdf leaks a little mass below the horizon -- looser tolerances.
    _consistency(D.RoughConductor(material="Au", alpha=0.3), rtol=0.08)


def test_roughplastic_consistency():
    _consistency(D.RoughPlastic(alpha=0.3, kd=(0.4, 0.4, 0.4)), rtol=0.08)


def test_kiss_consistency():
    _consistency(
        D.KazenStandard(
            base_color=D.ConstantTexture((0.7, 0.5, 0.3)),
            roughness=D.ConstantTexture((0.4,) * 3),
            metallic=D.ConstantTexture((0.3,) * 3),
            clearcoat=0.5,
            sheen=0.5,
        ),
        rtol=0.06,
    )


def test_kiss_smooth_grazing_finite():
    arrays, static, mat_id, uv, frame, dpdu, accum = _setup(
        D.KazenStandard(roughness=D.ConstantTexture((0.05,) * 3))
    )
    wi = _wi(80.0)
    s1 = jnp.asarray(RNG.random(N, dtype=np.float32))
    s2 = jnp.asarray(RNG.random((N, 2), dtype=np.float32))
    res = bsdf_mod.sample(
        static, arrays, mat_id, uv, frame, dpdu, wi, s1, s2, accum
    )
    assert np.isfinite(np.asarray(res.weight)).all()


def test_mirror_law():
    arrays, static, mat_id, uv, frame, dpdu, accum = _setup(D.Mirror())
    wi = _wi(30.0)
    s1 = jnp.zeros(N)
    s2 = jnp.zeros((N, 2))
    res = bsdf_mod.sample(
        static, arrays, mat_id, uv, frame, dpdu, wi, s1, s2, accum
    )
    wo = np.asarray(res.wo)[0]
    wi0 = np.asarray(wi)[0]
    np.testing.assert_allclose(wo, [-wi0[0], -wi0[1], wi0[2]], atol=1e-6)
    assert bool(res.is_discrete[0])
    np.testing.assert_allclose(np.asarray(res.weight)[0], 1.0)


def test_dielectric_snell_and_fresnel_split():
    arrays, static, mat_id, uv, frame, dpdu, accum = _setup(D.Dielectric())
    theta_i = 40.0
    wi = _wi(theta_i)
    s1 = jnp.asarray(RNG.random(N, dtype=np.float32))
    s2 = jnp.zeros((N, 2))
    res = bsdf_mod.sample(
        static, arrays, mat_id, uv, frame, dpdu, wi, s1, s2, accum
    )
    wo = np.asarray(res.wo)
    reflected = wo[:, 2] > 0
    frac = reflected.mean()
    want_f = float(km.fresnel(jnp.cos(jnp.deg2rad(theta_i)), 1.000277, 1.5046))
    np.testing.assert_allclose(frac, want_f, atol=0.01)
    # Snell: sin(theta_t) = sin(theta_i) / (int/ext)
    tr = wo[~reflected]
    sin_t = np.linalg.norm(tr[:, :2], axis=-1)
    want = np.sin(np.deg2rad(theta_i)) / (1.5046 / 1.000277)
    np.testing.assert_allclose(sin_t, want, atol=1e-3)


def test_roughdielectric_energy():
    """Reflection+transmission weights stay bounded and finite."""
    arrays, static, mat_id, uv, frame, dpdu, accum = _setup(
        D.RoughDielectric(roughness=0.3)
    )
    wi = _wi(25.0)
    s1 = jnp.asarray(RNG.random(N, dtype=np.float32))
    s2 = jnp.asarray(RNG.random((N, 2), dtype=np.float32))
    res = bsdf_mod.sample(
        static, arrays, mat_id, uv, frame, dpdu, wi, s1, s2, accum
    )
    w = np.asarray(res.weight)
    assert np.isfinite(w).all()
    # Walter-style estimator is ~1 in expectation (energy preservation)
    assert 0.7 < w[w[:, 0] > 0, 0].mean() < 1.3
    # transmission present
    assert (np.asarray(res.wo)[:, 2] < 0).mean() > 0.3


def test_normalmap_wrapper():
    nm = D.NormalMap(
        nested=D.Diffuse((0.5, 0.5, 0.5)),
        normals=D.ConstantTexture((0.5, 0.5, 1.0)),  # flat map == identity
    )
    arrays, static, mat_id, uv, frame, dpdu, accum = _setup(nm)
    # material 0 is the normalmap wrapper? builder appends nested first
    nm_id = int(np.asarray(arrays.materials.btype).tolist().index(9))
    mat_id = jnp.full(N, nm_id, jnp.int32)
    wi = _wi(30.0)
    wo_u = _uniform_sphere(9)
    f = bsdf_mod.eval(static, arrays, mat_id, uv, frame, dpdu, wi, wo_u, accum)
    # flat normal map behaves like the nested diffuse
    want = 0.5 * km.INV_PI * jnp.maximum(wo_u[:, 2], 0.0)
    got = np.asarray(f)[:, 0]
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4)
