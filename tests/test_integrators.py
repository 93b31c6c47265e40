"""Debug-integrator sanity + analytic checks."""
import numpy as np

import scenes
from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.integrate.render import render


def _render(scene, spp=4):
    arrays, static = compile_scene(scene)
    return np.asarray(render(arrays, static, spp=spp))


def test_normals_integrator():
    scene = scenes.cornell_box(width=16, height=16, spp=1)
    scene.integrator = D.SimpleIntegrator(kind="normals")
    img = _render(scene, spp=1)
    assert (img >= 0).all() and (img <= 1.0 + 1e-6).all()
    # all camera rays hit the box; normals are axis-aligned -> each pixel is
    # a unit basis vector
    sums = img.sum(axis=-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_ao_integrator_open_vs_closed():
    scene = scenes.cornell_box(width=16, height=16, spp=8)
    scene.integrator = D.SimpleIntegrator(kind="ao")
    img = _render(scene, spp=8)
    assert np.isfinite(img).all()
    assert img.mean() > 0.05  # some visibility out the open front
    assert img.max() <= 2.0 / np.pi * 2 * np.pi + 1e-3  # bounded by 2


def test_path_mats_vs_path_mis_energy():
    """Both unbiased estimators of the same integral: means must agree."""
    # path_mats ignores lightPrimaryVisibility (integrator.cpp:151-155), so
    # make the light camera-visible in both for a like-for-like comparison.
    base = dict(
        width=24,
        height=24,
        max_depth=6,
        light_kwargs=dict(intensity=20.0, primary_visibility=True),
    )
    s1 = scenes.cornell_box(spp=64, **base)
    s2 = scenes.cornell_box(spp=64, **base)
    s2.integrator = D.SimpleIntegrator(kind="path_mats", max_depth=6)
    img_mis = _render(s1, spp=64)
    img_mats = _render(s2, spp=64)
    # path_mats is high-variance; compare global means loosely
    np.testing.assert_allclose(
        img_mis.mean(), img_mats.mean(), rtol=0.15
    )


def test_whitted_runs():
    scene = scenes.cornell_box(width=16, height=16, spp=4)
    scene.integrator = D.SimpleIntegrator(kind="whitted")
    img = _render(scene, spp=4)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
