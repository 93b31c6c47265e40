"""Golden parity: wavefront renderer vs the scalar oracle transliteration of
the reference pipeline, same sampler/spp/seed (BASELINE 'image allclose')."""
from _isolate import subprocess_isolated
import numpy as np
import pytest

from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.integrate.render import render

import scenes
from oracle_renderer import OracleRenderer


def _compare(scene, spp, atol=2e-3, max_bad_frac=0.002):
    arrays, static = compile_scene(scene)
    got = np.asarray(render(arrays, static, spp=spp))
    want = OracleRenderer(arrays, static).render(spp=spp)
    diff = np.abs(got - want)
    denom = np.maximum(np.abs(want), 0.05)
    rel = diff / denom
    bad = (rel > atol).mean()
    assert bad <= max_bad_frac, (
        f"{bad:.4%} pixels differ (max rel {rel.max():.4g}, "
        f"mean got {got.mean():.4g}, mean want {want.mean():.4g})"
    )
    # global energy agreement, tight
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=1e-3)


@pytest.mark.slow
@subprocess_isolated
def test_cornell_parity_independent():
    scene = scenes.cornell_box(width=16, height=16, spp=2, max_depth=4)
    _compare(scene, spp=2)


@pytest.mark.slow
@subprocess_isolated
def test_direct_light_parity():
    """Single bounce: floor + visible light, depth=2."""
    import kazen_tpu.scene.description as D

    scene = scenes.cornell_box(
        width=12,
        height=12,
        spp=2,
        max_depth=2,
        light_kwargs=dict(intensity=10.0, primary_visibility=True),
    )
    _compare(scene, spp=2)


@pytest.mark.slow
@subprocess_isolated
def test_kiss_cornell_parity():
    """Golden parity with the kiss BSDF on every wall (flagship material)."""
    import kazen_tpu.scene.description as D

    scene = scenes.cornell_box(
        width=12, height=12, spp=2, max_depth=3,
        wall_bsdf=D.KazenStandard(
            base_color=D.ConstantTexture((0.65, 0.55, 0.45)),
            roughness=D.ConstantTexture((0.35,) * 3),
            metallic=D.ConstantTexture((0.25,) * 3),
            clearcoat=0.4,
            sheen=0.3,
        ),
    )
    _compare(scene, spp=2, atol=5e-3, max_bad_frac=0.01)


@pytest.mark.slow
@subprocess_isolated
def test_stratified_cornell_parity():
    scene = scenes.cornell_box(
        width=12, height=12, spp=4, max_depth=3, sampler="stratified"
    )
    _compare(scene, spp=4)
