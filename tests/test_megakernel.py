"""Pallas megakernel (integrate/megakernel.py) vs the XLA wavefront.

The megakernel consumes identical per-lane random streams and mirrors
path_mis._bounce stage-for-stage, so at equal (sampler, spp, seed) the two
paths must agree lane-for-lane up to float reassociation. Runs in Pallas
interpret mode on the CPU test backend.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from kazen_tpu.integrate import camera as camera_mod
from kazen_tpu.integrate.megakernel import li_megakernel, supported
from kazen_tpu.integrate.path_mis import li_wavefront
from kazen_tpu.integrate.render import sampler_spec
from kazen_tpu.samplers import streams
from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene

from _isolate import subprocess_isolated
from scenes import cornell_box, make_mesh, sphere_mesh


def _li_pair(scene_desc, w=24, h=24, sample_index=0, interpret="shim"):
    """interpret="shim" (default) runs the kernel math as plain JAX, which
    compiles in seconds; interpret=True exercises the Pallas interpreter and
    is reserved for the slow-tier canary test."""
    arrays, static = compile_scene(scene_desc)
    assert supported(arrays, static), "scene should be in the fast-path class"
    spec = sampler_spec(static)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
    stream = streams.init_stream(spec, px, py, sample_index)
    stream, jitter = streams.next_pixel_2d(spec, stream)
    ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
    stream, ap = streams.next_2d(spec, stream)
    rays = camera_mod.sample_ray(arrays, static, ps, ap)
    _, li_ref, nr_ref = li_wavefront(arrays, static, spec, stream, rays)
    _, li_mk, nr_mk = li_megakernel(
        arrays, static, spec, stream, rays, interpret=interpret
    )
    return np.asarray(li_ref), np.asarray(li_mk), float(nr_ref), float(nr_mk)


def _assert_match(li_ref, li_mk, nr_ref, nr_mk):
    assert nr_ref == pytest.approx(nr_mk, abs=1.5)
    rel = np.abs(li_ref - li_mk) / (np.abs(li_ref) + 1e-3)
    assert rel.max() < 1e-3, (rel.max(), np.argmax(rel.max(1)))


@subprocess_isolated
def test_megakernel_matches_wavefront_diffuse():
    li_ref, li_mk, nr_ref, nr_mk = _li_pair(cornell_box(width=24, height=24))
    assert li_ref.mean() > 0.01  # non-trivial image
    _assert_match(li_ref, li_mk, nr_ref, nr_mk)


@pytest.mark.slow
@subprocess_isolated
def test_megakernel_matches_wavefront_mixed_materials():
    # kiss + mirror + ggx + dielectric panels exercise every dispatch branch
    extra = (
        make_mesh(
            [-0.8, 0.0, 0.6], [0.6, 0, 0], [0, 0.6, 0],
            bsdf=D.KazenStandard(
                base_color=(0.7, 0.3, 0.2), metallic=0.4, roughness=0.35,
                clearcoat=0.6, sheen=0.4,
            ),
        ),
        make_mesh([0.2, 0.0, 0.6], [0.6, 0, 0], [0, 0.6, 0], bsdf=D.Mirror()),
        make_mesh(
            [-0.8, 0.8, 0.6], [0.6, 0, 0], [0, 0.6, 0],
            bsdf=D.GGX(albedo=(0.9, 0.7, 0.4), roughness=0.2),
        ),
        make_mesh(
            [0.2, 0.8, 0.6], [0.6, 0, 0], [0, 0.6, 0], bsdf=D.Dielectric()
        ),
    )
    li_ref, li_mk, nr_ref, nr_mk = _li_pair(
        cornell_box(width=24, height=24, extra_meshes=extra)
    )
    _assert_match(li_ref, li_mk, nr_ref, nr_mk)


@pytest.mark.slow
@subprocess_isolated
def test_megakernel_matches_wavefront_regularization_and_bg():
    sc = cornell_box(
        width=16, height=16, regularization=True,
        wall_bsdf=D.KazenStandard(base_color=(0.6, 0.6, 0.6), roughness=0.4),
        background=D.Background(
            texture=D.ConstantTexture((0.2, 0.3, 0.4)), intensity=1.5
        ),
    )
    li_ref, li_mk, nr_ref, nr_mk = _li_pair(sc)
    _assert_match(li_ref, li_mk, nr_ref, nr_mk)


@subprocess_isolated
def test_megakernel_later_sample_index():
    li_ref, li_mk, nr_ref, nr_mk = _li_pair(
        cornell_box(width=16, height=16), sample_index=3
    )
    _assert_match(li_ref, li_mk, nr_ref, nr_mk)


@pytest.mark.slow
@subprocess_isolated
def test_megakernel_stratified_sampler():
    li_ref, li_mk, nr_ref, nr_mk = _li_pair(
        cornell_box(width=16, height=16, spp=9, sampler="stratified"),
        w=16, h=16, sample_index=2,
    )
    _assert_match(li_ref, li_mk, nr_ref, nr_mk)


@pytest.mark.slow
@subprocess_isolated
def test_megakernel_correlated_sampler():
    li_ref, li_mk, nr_ref, nr_mk = _li_pair(
        cornell_box(width=16, height=16, spp=8, sampler="correlated"),
        w=16, h=16, sample_index=1,
    )
    _assert_match(li_ref, li_mk, nr_ref, nr_mk)


@pytest.mark.slow
@subprocess_isolated
def test_megakernel_pallas_interpreter_canary():
    """One config through the real Pallas interpreter (masked-op emulation,
    BlockSpec plumbing); everything else uses the fast _ShimRef path."""
    li_ref, li_mk, nr_ref, nr_mk = _li_pair(
        cornell_box(width=16, height=16), w=16, h=16, interpret=True
    )
    _assert_match(li_ref, li_mk, nr_ref, nr_mk)


def test_supported_gating():
    arrays, static = compile_scene(cornell_box(sampler="pmj02bn"))
    assert not supported(arrays, static)  # pmj02bn needs per-lane gathers
    arrays, static = compile_scene(cornell_box())
    assert supported(arrays, static)
    # CPU test backend must keep the XLA wavefront as the default
    assert not static.use_megakernel
