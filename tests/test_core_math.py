"""Core math + warp + dpdf tests: orthonormality, pdf consistency, moments."""
import numpy as np
import jax
import jax.numpy as jnp

from kazen_tpu.core import dpdf, math as km, warp


def rand_dirs(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_frame_orthonormal_roundtrip():
    n = jnp.asarray(rand_dirs(128))
    f = km.frame_from_normal(n)
    for a, b in [(f.s, f.t), (f.s, f.n), (f.t, f.n)]:
        np.testing.assert_allclose(np.asarray(km.dot(a, b)), 0.0, atol=1e-5)
    for a in (f.s, f.t):
        np.testing.assert_allclose(np.asarray(km.norm(a)), 1.0, atol=1e-5)
    v = jnp.asarray(rand_dirs(128, 1))
    back = f.to_world(f.to_local(v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_reflect_refract():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wi = km.normalize(jnp.asarray([[0.5, 0.2, 0.8]]))
    r = km.reflect(wi, n)
    np.testing.assert_allclose(float(km.norm(r)[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(r[0, 2]), float(wi[0, 2]), atol=1e-6)
    # refract at eta=1 is straight-through (negated direction convention)
    t = km.refract(wi, n, 1.0)
    np.testing.assert_allclose(np.asarray(t), np.asarray(-(-wi)), atol=1e-5)


def test_fresnel_limits():
    # normal incidence, glass: ((1-1.5)/(1+1.5))^2 = 0.04
    f = float(km.fresnel(jnp.float32(1.0), 1.0, 1.5))
    np.testing.assert_allclose(f, 0.04, atol=1e-4)
    # grazing -> 1
    f = float(km.fresnel(jnp.float32(1e-4), 1.0, 1.5))
    assert f > 0.98
    # TIR from inside
    f = float(km.fresnel(jnp.float32(-0.2), 1.0, 1.5))
    np.testing.assert_allclose(f, 1.0)
    # fresnel_dielectric agrees with fresnel for entering rays
    ci = jnp.linspace(0.05, 1.0, 32)
    f1 = km.fresnel(ci, 1.0, 1.5)
    f2, ct = km.fresnel_dielectric(ci, 1.5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
    assert (np.asarray(ct) <= 0).all()


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(
        np.asarray(km.to_linear_rgb(km.to_srgb(c))), np.asarray(c), atol=1e-5
    )


def _uniforms(n, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.random((n, 2), dtype=np.float32))


def test_cosine_hemisphere_moments():
    s = _uniforms(200_000)
    v = np.asarray(warp.square_to_cosine_hemisphere(s))
    assert (v[:, 2] > 0).all()
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)
    # E[cos theta] for pdf cos/pi is 2/3
    np.testing.assert_allclose(v[:, 2].mean(), 2.0 / 3.0, atol=5e-3)
    np.testing.assert_allclose(v[:, 0].mean(), 0.0, atol=5e-3)


def test_uniform_sphere_moments():
    s = _uniforms(200_000, 1)
    v = np.asarray(warp.square_to_uniform_sphere(s))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=6e-3)
    np.testing.assert_allclose((v[:, 2] ** 2).mean(), 1.0 / 3.0, atol=5e-3)


def test_warp_pdf_integrates_to_one():
    """MC check: for each warp, E_x~pdf [1] via importance = int pdf = 1 by
    integrating pdf over uniform sphere/hemisphere samples."""
    r = np.random.default_rng(2)
    n = 400_000
    v = rand_dirs(n, 3)
    # hemisphere-restricted pdfs integrate to 1 over the full sphere domain
    # (they are zero below) -- sample uniform sphere, weight by 4*pi.
    vj = jnp.asarray(v)
    for pdf_fn in (
        warp.square_to_cosine_hemisphere_pdf,
        warp.square_to_uniform_hemisphere_pdf,
        warp.square_to_uniform_sphere_pdf,
    ):
        p = np.asarray(pdf_fn(vj))
        if pdf_fn is warp.square_to_uniform_hemisphere_pdf:
            p = np.where(v[:, 2] > 0, p, 0.0)
        if pdf_fn is warp.square_to_cosine_hemisphere_pdf:
            p = np.maximum(p, 0.0) * (v[:, 2] > 0)
        est = (p * 4 * np.pi).mean()
        np.testing.assert_allclose(est, 1.0, atol=2e-2)


def test_beckmann_sample_pdf_consistency():
    """Histogram of sampled half-vectors' cos-theta matches pdf prediction."""
    alpha = 0.3
    s = _uniforms(300_000, 4)
    m = np.asarray(warp.square_to_beckmann(s, alpha))
    p = np.asarray(warp.square_to_beckmann_pdf(jnp.asarray(m), alpha))
    assert (p > 0).all()
    # E[1/pdf] over samples ~ solid angle measure consistency:
    # int_{hemisphere} pdf dOmega = 1 -> E_{m~pdf}[pdf/pdf] trivial; instead
    # check E[cos^3 * exp(tan2/a2)] normalization via mean of 1/(pi a^2) terms
    est = np.mean(1.0 / p * (np.pi * alpha**2) ** -1)
    assert est > 0  # smoke: pdf positive and finite
    # chi-square-lite on cos-theta marginal using exact CDF bin masses:
    # sampling sets tan(theta) = alpha*sqrt(-ln(1-u)), so
    # P(cos >= c) = exp(-tan^2(c)/alpha^2).
    ct = m[:, 2]
    hist, edges = np.histogram(ct, bins=20, range=(0.0, 1.0))

    def surv(c):
        c = np.maximum(c, 1e-9)
        t2 = (1 - c**2) / c**2
        return np.exp(-t2 / alpha**2)

    expected = surv(edges[1:]) - surv(edges[:-1])
    observed = hist / hist.sum()
    np.testing.assert_allclose(observed, expected, atol=3e-3)


def test_dpdf_sampling():
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    d = dpdf.build(w)
    np.testing.assert_allclose(float(d.normalization), 0.1, atol=1e-6)
    u = jnp.asarray(np.random.default_rng(5).random(100_000, dtype=np.float32))
    idx = np.asarray(dpdf.sample(d, u))
    freq = np.bincount(idx, minlength=4) / len(idx)
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=5e-3)
    # sample_reuse returns in-bin uniforms
    _, u2 = dpdf.sample_reuse(d, u)
    u2 = np.asarray(u2)
    assert (u2 >= 0).all() and (u2 <= 1).all()
    assert abs(u2.mean() - 0.5) < 5e-3


def test_hash_float():
    from kazen_tpu.core import rng as krng

    h = krng.hash_pixel_seed(np.uint32(3), np.uint32(7), 1)
    v = np.asarray(krng.hash_float(h))
    assert 0.0 <= float(v) < 1.0


def test_shadow_terminator_terms():
    from kazen_tpu.shade import ggx as kggx

    n = jnp.asarray([[0.0, 0.0, 1.0]])
    bent = km.normalize(jnp.asarray([[0.3, 0.0, 0.95]]))
    l_hi = km.normalize(jnp.asarray([[0.0, 0.0, 1.0]]))
    l_lo = km.normalize(jnp.asarray([[0.95, 0.0, 0.08]]))
    # grazing light gets attenuated, normal-incidence does not
    g_hi = float(kggx.shadow_terminator_chiang(l_hi, bent, n)[0])
    g_lo = float(kggx.shadow_terminator_chiang(l_lo, bent, n)[0])
    assert 0.99 <= g_hi <= 1.0 + 1e-6
    assert 0.0 <= g_lo < 1.0
    s_hi = float(kggx.shadow_terminator_soften(n, bent, l_hi)[0])
    s_lo = float(kggx.shadow_terminator_soften(n, bent, l_lo)[0])
    assert s_hi >= s_lo >= 0.0
