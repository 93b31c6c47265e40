"""Environment-map importance sampling (opt-in; Background.importance).

The reference never samples its environment (scene.cpp:54-79 evaluates the
background on ray escape only), so this feature is beyond-parity: it must
leave the expected image unchanged while reducing variance for scenes lit
by a concentrated environment.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.shade import lights as lights_mod
from kazen_tpu.integrate.render import render


def _blob_env(importance=True, eh=16, ew=32, bright=200.0):
    """Env image: dim everywhere, one bright blob."""
    img = np.full((eh, ew, 3), 0.05, np.float32)
    img[5:8, 20:24] = (bright, bright * 0.8, bright * 0.5)
    return D.Background(
        texture=D.ImageTexture(data=img, colorspace="linear"),
        intensity=1.0,
        importance=importance,
    )


def _floor_scene(bg, width=16, height=16, spp=16, max_depth=3, seed=1):
    v = np.array(
        [[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]], np.float32
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = np.tile(np.array([0, 1, 0], np.float32), (4, 1))
    return D.Scene(
        meshes=[
            D.Mesh(
                vertices=v, faces=f, normals=n, bsdf=D.Diffuse((0.8, 0.8, 0.8))
            )
        ],
        camera=D.PerspectiveCamera(
            width=width,
            height=height,
            fov=60.0,
            to_world=D.lookat([0, 2.5, -5], [0, 0, 0], [0, 1, 0]),
        ),
        sampler=D.Sampler(kind="independent", sample_count=spp, seed=seed),
        integrator=D.PathMis(max_depth=max_depth),
        rfilter=D.RFilter(kind="box"),
        background=bg,
    )


@pytest.fixture(scope="module")
def env_scene():
    return compile_scene(_floor_scene(_blob_env(True)))


def test_env_sample_integrates_solid_angle(env_scene):
    """E[1/pdf] over pdf-distributed samples = total solid angle 4*pi."""
    arrays, static = env_scene
    assert static.env_importance
    rng = np.random.default_rng(7)
    m = 20000
    u1 = jnp.asarray(rng.random(m, np.float32))
    u2 = jnp.asarray(rng.random(m, np.float32))
    s = lights_mod.sample_env_light(arrays, static, u1, u2)
    pdf = np.asarray(s.pdf)
    assert (pdf > 0).all()
    est = float(np.mean(1.0 / pdf))
    assert abs(est - 4 * np.pi) / (4 * np.pi) < 0.05, est
    # unit directions
    assert np.allclose(np.linalg.norm(np.asarray(s.wi), axis=-1), 1.0, atol=1e-5)


def test_env_sample_estimates_power(env_scene):
    """E[L/pdf] matches the numerically-integrated env radiance."""
    arrays, static = env_scene
    rng = np.random.default_rng(3)
    m = 40000
    u1 = jnp.asarray(rng.random(m, np.float32))
    u2 = jnp.asarray(rng.random(m, np.float32))
    s = lights_mod.sample_env_light(arrays, static, u1, u2)
    est = np.asarray(s.ls).mean(axis=0)  # E[L/pdf] ~= integral of L dOmega

    # brute-force quadrature on a fine lat-long grid
    gh, gw = 512, 1024
    v = (np.arange(gh) + 0.5) / gh
    u = (np.arange(gw) + 0.5) / gw
    lat = (v - 0.5) * np.pi
    phi = u * 2 * np.pi - np.pi
    y = np.broadcast_to(np.sin(lat)[:, None], (gh, gw))
    x = np.cos(lat)[:, None] * np.sin(phi)[None, :]
    z = np.cos(lat)[:, None] * np.cos(phi)[None, :]
    dirs = jnp.asarray(
        np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    )
    rad = np.asarray(
        lights_mod.background_radiance(arrays, static, dirs)
    ).reshape(gh, gw, 3)
    dw = (np.cos(lat)[:, None, None] * (np.pi / gh) * (2 * np.pi / gw))
    ref = (rad * dw).sum(axis=(0, 1))
    assert np.allclose(est, ref, rtol=0.08), (est, ref)


def test_env_pdf_matches_sampled_pdf(env_scene):
    arrays, static = env_scene
    rng = np.random.default_rng(11)
    m = 4096
    u1 = jnp.asarray(rng.random(m, np.float32))
    u2 = jnp.asarray(rng.random(m, np.float32))
    s = lights_mod.sample_env_light(arrays, static, u1, u2)
    pdf2 = np.asarray(lights_mod.pdf_env_dir(arrays, static, s.wi))
    pdf1 = np.asarray(s.pdf)
    # identical up to texel-boundary rounding in the inverse mapping
    match = np.isclose(pdf1, pdf2, rtol=1e-4)
    assert match.mean() > 0.98, match.mean()


def test_env_importance_same_image_lower_error():
    """IS on/off agree in expectation; IS converges faster on blob env."""
    ref_img = None
    imgs = {}
    for imp in (True, False):
        sc = _floor_scene(_blob_env(imp), spp=128, seed=5)
        arrays, static = compile_scene(sc)
        imgs[imp] = np.asarray(render(arrays, static))
    # ground truth: IS on at high spp (IS-on estimator is unbiased; the
    # blob subtends a tiny solid angle so BSDF-only needs huge spp)
    sc = _floor_scene(_blob_env(True), spp=1024, seed=99)
    arrays, static = compile_scene(sc)
    ref_img = np.asarray(render(arrays, static))

    err_on = np.abs(imgs[True] - ref_img).mean()
    err_off = np.abs(imgs[False] - ref_img).mean()
    # the images describe the same transport...
    assert np.allclose(
        imgs[True].mean(), ref_img.mean(), rtol=0.1
    ), (imgs[True].mean(), ref_img.mean())
    # ...and importance sampling is far more accurate at equal spp
    assert err_on < 0.5 * err_off, (err_on, err_off)


def test_env_importance_off_is_bit_identical_to_before():
    """The opt-out path must not perturb streams: with importance=False the
    image equals a render of the identical scene description (guards the
    n_strat plumbing in path_mis)."""
    a1, s1 = compile_scene(_floor_scene(_blob_env(False), spp=8))
    a2, s2 = compile_scene(_floor_scene(_blob_env(False), spp=8))
    assert not s1.env_importance
    i1 = np.asarray(render(a1, s1))
    i2 = np.asarray(render(a2, s2))
    assert np.array_equal(i1, i2)
