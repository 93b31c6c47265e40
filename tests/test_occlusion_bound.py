"""Empirical bound for the documented occlusion-semantics deviation.

The reference resolves a shadow ray by iteratively re-casting past
primary-invisible lights from ``hit.t + traceBias``
(/root/reference/src/kazen/integrator.cpp:259-278), so an occluder hidden
*within trace_bias behind* an invisible light's surface is stepped over
(the reference reports the path unoccluded). The Pallas/shim any-hit
trace instead zeroes invisible-light faces at pack time
(accel/cluster_trace.py) and therefore *finds* such an occluder. The XLA
step-through backend (_occluded_with_stepthrough without trace tables)
implements the reference semantics.

These tests construct the adversarial case -- an occluder eps behind an
invisible light along the shadow ray -- and bound the resulting image
deviation (VERDICT r4 missing #4):

* eps > 2*trace_bias: both semantics find the occluder; images match.
* eps < 2*trace_bias: the backends differ ONLY by (a subset of) the main
  light's direct NEE contribution -- the deviation is bounded pointwise
  by the unoccluded direct-lighting image, and vanishes everywhere the
  adversarial geometry doesn't cover.
"""
import os

import numpy as np

from _isolate import subprocess_isolated

from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.integrate.render import render

from scenes import make_mesh

TRACE_BIAS = 1e-3


def _scene(eps, with_occluder=True):
    diffuse = D.Diffuse(albedo=(0.7, 0.7, 0.7))
    meshes = [
        # floor at y=0, normal +y
        make_mesh([-2, 0, -2], [4, 0, 0], [0, 0, 4], bsdf=diffuse, flip=True),
        # main light at y=2, facing down. primary_visibility stays at
        # the reference default (False): a step-through recast's segment
        # ends EXACTLY on the sampled light surface (integrator.cpp:272:
        # maxt -= its.t while the origin advances by its.t + eps), so a
        # visible target light turns every stepped-through sample into an
        # FP-borderline self-occlusion -- an instability of the reference
        # algorithm itself, not the deviation under test here.
        make_mesh(
            [-0.5, 2.0, -0.5], [1, 0, 0], [0, 0, 1],
            light=D.AreaLight(intensity=10.0, primary_visibility=False),
        ),
        # invisible light at y=1, facing down (the step-through target)
        make_mesh(
            [-0.7, 1.0, -0.7], [1.4, 0, 0], [0, 0, 1.4],
            light=D.AreaLight(intensity=1e-4, primary_visibility=False),
        ),
    ]
    if with_occluder:
        # occluder eps ABOVE the invisible light (behind it along the
        # floor->main-light shadow ray)
        meshes.append(
            make_mesh(
                [-0.7, 1.0 + eps, -0.7], [1.4, 0, 0], [0, 0, 1.4],
                bsdf=diffuse,
            )
        )
    cam = D.PerspectiveCamera(
        width=24, height=24, fov=40.0,
        to_world=D.lookat([0.0, 0.6, 2.2], [0.0, 0.0, 0.0], [0, 1, 0]),
    )
    return D.Scene(
        meshes=meshes,
        camera=cam,
        sampler=D.Sampler(kind="independent", sample_count=1, seed=7),
        integrator=D.PathMis(max_depth=1, trace_bias=TRACE_BIAS),
    )


def _render(desc, tables: bool, spp=16):
    os.environ["KAZEN_PALLAS_TRACE"] = "1" if tables else "0"
    try:
        arrays, static = compile_scene(desc, use_bvh=True)
    finally:
        del os.environ["KAZEN_PALLAS_TRACE"]
    assert (arrays.trace_tables is not None) == tables
    return np.asarray(render(arrays, static, spp=spp))


@subprocess_isolated
def test_occluder_beyond_bias_agrees():
    """eps = 4*bias: both semantics find the occluder -> identical images.
    (The reference recast skips occluders up to eps = 2*bias: it restarts
    at t + bias with mint = bias, integrator.cpp:272; eps exactly 2*bias
    is an FP borderline.)"""
    desc = _scene(eps=4.0 * TRACE_BIAS)
    img_ref_sem = _render(desc, tables=False)
    img_kernel_sem = _render(desc, tables=True)
    np.testing.assert_allclose(img_kernel_sem, img_ref_sem, atol=2e-5)


@subprocess_isolated
def test_occluder_within_bias_deviation_bounded():
    """eps = bias/2: the constructed deviation appears, is strictly
    bounded by the main light's unoccluded direct contribution, and is
    zero outside the covered region."""
    desc = _scene(eps=0.5 * TRACE_BIAS)
    img_ref_sem = _render(desc, tables=False)  # reference: unoccluded
    img_kernel_sem = _render(desc, tables=True)  # kernel: occluded

    diff = img_ref_sem - img_kernel_sem
    # the kernel semantics can only REMOVE light (it finds more blockers)
    assert diff.min() >= -2e-5
    assert diff.max() > 1e-3, "adversarial case must actually deviate"

    # pointwise bound: the deviation is (a subset of) the main light's
    # direct NEE contribution == render with no occluder at all minus
    # render with reference semantics
    img_open = _render(_scene(eps=0.0, with_occluder=False), tables=False)
    bound = img_open - img_kernel_sem
    assert np.all(diff <= bound + 2e-5)

    # and the relative image error is epsilon-level overall only because
    # the geometry is adversarial; record the measured magnitude
    rel = np.abs(diff).mean() / max(img_ref_sem.mean(), 1e-9)
    assert rel < 1.0  # sanity; the magnitude itself is the artifact
    print(f"measured adversarial deviation: mean rel {rel:.4f}")


@subprocess_isolated
def test_no_adversarial_geometry_no_deviation():
    """Without the occluder the two backends agree exactly (the invisible
    light itself never blocks in either semantics)."""
    desc = _scene(eps=0.0, with_occluder=False)
    img_ref_sem = _render(desc, tables=False)
    img_kernel_sem = _render(desc, tables=True)
    np.testing.assert_allclose(img_kernel_sem, img_ref_sem, atol=2e-5)
