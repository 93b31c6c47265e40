"""Inverse rendering on the reference's own hero content (VERDICT r4 #5).

Recovers the dominant kiss sweep material's roughness AND baseColor on
`scene/2022_q1/parameters/default_m0_r0.5.xml` (reduced resolution) from
a rendered target: the target is rendered at the scene's true values
(roughness 0.5, baseColor 0.5 grey), the optimizer starts from a
deliberately wrong initialization and must come back to within +-0.05.
Runs the differentiable XLA BVH-walk trace path on CPU.
"""
import os

import numpy as np
import pytest

from _isolate import subprocess_isolated

HERO_XML = "/root/reference/scene/2022_q1/parameters/default_m0_r0.5.xml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(HERO_XML), reason="reference scene tree not present"
)


@pytest.mark.slow
@subprocess_isolated
def test_recover_hero_kiss_roughness_and_basecolor():
    import jax.numpy as jnp

    from kazen_tpu.scene import xml_io
    from kazen_tpu.scene.compiler import compile_scene
    from kazen_tpu.integrate.render import render
    from kazen_tpu.diff.inverse import optimize

    desc = xml_io.load_xml(HERO_XML)
    desc.camera.width = 64
    desc.camera.height = 36
    # direct lighting only: the sampled-direction reparameterization is
    # exact for the NEE/emitter terms, while multi-bounce continuation
    # gradients are biased by the non-differentiable hit geometry (the
    # measured landscape min sits at the true roughness either way, but
    # the biased continuation term drags SGD toward r=0 at depth 3)
    desc.integrator.max_depth = 1
    arrays, static = compile_scene(desc)

    # the sweep material = the kiss material covering the most faces
    counts = np.bincount(
        np.asarray(arrays.mesh_material)[np.asarray(arrays.face_mesh)],
        minlength=int(np.asarray(arrays.materials.roughness).shape[0]),
    )
    mid = int(np.argmax(counts))
    true_rough = float(np.asarray(arrays.materials.roughness)[mid])
    true_base = np.asarray(arrays.materials.base_color)[mid].copy()
    assert true_rough == pytest.approx(0.5)

    # same-estimator target (identical 8 sample indices as the
    # optimization renders): the deterministic loss then has its global
    # minimum exactly at the true parameters -- with a 32-spp target the
    # fixed-index 8-spp estimator's MC offset shifted the argmin to
    # base ~0.61 (loss asymptote 0.01202, roughness still recovering)
    target = render(arrays, static, spp=8)

    # wrong init: shiny and green
    mats0 = arrays.materials._replace(
        roughness=arrays.materials.roughness.at[mid].set(0.15),
        base_color=arrays.materials.base_color.at[mid].set(
            jnp.asarray([0.15, 0.7, 0.2])
        ),
    )
    # Deterministic full-batch optimization over FIXED sample indices:
    # the AD gradient matches finite differences exactly (checked for
    # this scene: d/drough 3.89e-4 vs FD 3.8e-4, d/dbase -1.0231e-2 vs
    # -1.0231e-2), but the stochastic fresh-index loop in diff.inverse
    # cannot recover roughness here -- its gradient is ~26x smaller than
    # baseColor's while the per-step MC noise floor is ~10x the whole
    # roughness signal, so Adam random-walks that coordinate. Rendering
    # the SAME 8 sample indices each step makes the loss smooth and the
    # descent deterministic.
    import jax
    import optax

    from kazen_tpu.diff.inverse import apply_params, get_params

    arrays0 = arrays._replace(materials=mats0)
    params = get_params(arrays0, ("materials",))
    opt = optax.adam(0.05)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state):
        def loss_fn(p):
            img = render(apply_params(arrays0, p), static, spp=8)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        params = jax.tree_util.tree_map(
            lambda x: jnp.clip(x, 0.0, None), params
        )
        return params, opt_state, loss

    losses = []
    for _ in range(250):
        params, opt_state, loss = step_fn(params, opt_state)
        losses.append(float(loss))
    got_rough = float(np.asarray(params["materials"]["roughness"])[mid])
    got_base = np.asarray(params["materials"]["base_color"])[mid]
    print("loss curve:", losses[::4])
    print("recovered roughness", got_rough, "base", got_base.tolist())
    assert losses[-1] < losses[0] * 0.5
    assert abs(got_rough - true_rough) < 0.05
    np.testing.assert_allclose(got_base, true_base, atol=0.05)
