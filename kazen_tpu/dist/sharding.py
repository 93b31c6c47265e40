"""SPMD sharding: the TPU-native replacement for the reference's TBB tile
pool (renderer.cpp:94-127, SURVEY §2.8).

Model: one ``Mesh`` over all chips with a single ``'devices'`` axis; pixel
lanes are sharded along it, the scene (geometry, BVH, materials, textures,
light tables) is replicated, and the film is produced as a global
scatter-add -- XLA partitions the computation and inserts the all-reduce for
the film (and for parameter gradients in the inverse-rendering step). No
locks, no tile queue: ownership is the sharding, determinism comes from the
counter-based sampler streams (§3.4), which are pixel-keyed and therefore
identical under any lane placement.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import rng
from ..film import film as film_mod
from ..integrate import camera as camera_mod
from ..integrate.path_mis import li_wavefront
from ..samplers import streams


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("devices",))


def _pass_contributions(scene, static, spec, px, py, sample_index, jump):
    stream = streams.init_stream_jump(spec, px, py, sample_index, jump)
    stream, jitter = streams.next_pixel_2d(spec, stream)
    pixel_sample = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
    stream, aperture = streams.next_2d(spec, stream)
    rays = camera_mod.sample_ray(scene, static, pixel_sample, aperture)
    from ..integrate.render import li_fn_for

    _, li, _ = li_fn_for(static)(scene, static, spec, stream, rays)
    return pixel_sample, li


def sharded_render_pass(mesh: Mesh, scene, static, spec):
    """Builds a jitted one-sample render pass with pixel lanes sharded over
    the mesh and film/scene replicated. Lane count must be divisible by the
    device count (pad pixels to a multiple)."""
    lane_sharding = NamedSharding(mesh, P("devices"))
    repl = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        static_argnames=(),
        in_shardings=(repl, repl, lane_sharding, lane_sharding, None, None),
        out_shardings=repl,
    )
    def run(scene_arrays, film, px, py, sample_index, jump):
        pixel_sample, li = _pass_contributions(
            scene_arrays, static, spec, px, py, sample_index, jump
        )
        return film_mod.splat(static, film, pixel_sample, li)

    return run


def render_distributed(
    mesh: Mesh, scene, static, spec=None, spp: Optional[int] = None
):
    """Full-frame render with pixels sharded over the mesh."""
    if spec is None:
        from ..integrate.render import sampler_spec

        spec = sampler_spec(static)
    n_samples = spp if spp is not None else spec.effective_sample_count
    h, w = static.height, static.width
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = xs.reshape(-1).astype(np.uint32)
    py = ys.reshape(-1).astype(np.uint32)
    n_dev = mesh.size
    pad = (-len(px)) % n_dev
    if pad:
        # padded lanes target an off-image pixel: zero-weight splats
        px = np.concatenate([px, np.full(pad, 0x7FFFFF, np.uint32)])
        py = np.concatenate([py, np.zeros(pad, np.uint32)])

    run = sharded_render_pass(mesh, scene, static, spec)
    lane_sharding = NamedSharding(mesh, P("devices"))
    px_d = jax.device_put(jnp.asarray(px), lane_sharding)
    py_d = jax.device_put(jnp.asarray(py), lane_sharding)
    film = film_mod.make_film(static)
    for s in range(n_samples):
        a, c = rng.advance_constants(s * 65536)
        jump = (
            (jnp.uint32(a >> 32), jnp.uint32(a & 0xFFFFFFFF)),
            (jnp.uint32(c >> 32), jnp.uint32(c & 0xFFFFFFFF)),
        )
        film = run(scene, film, px_d, py_d, jnp.uint32(s), jump)
    return film_mod.to_bitmap(film)


def inverse_train_step(mesh: Mesh, scene, static, spec):
    """Differentiable sharded step: L2 image loss against a target, with
    gradients w.r.t. the material table + texel pool (the inverse-rendering
    parameter set). Gradients are produced replicated -- XLA all-reduces the
    per-device partial gradients (grad-of-psum structure) over ICI."""
    lane_sharding = NamedSharding(mesh, P("devices"))
    repl = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        in_shardings=(
            repl,
            repl,
            lane_sharding,
            lane_sharding,
            None,
            None,
        ),
        out_shardings=(repl, repl),
    )
    def step(scene_arrays, target, px, py, sample_index, jump):
        def loss_fn(params):
            texels = params.pop("texels")
            sc = scene_arrays._replace(
                materials=scene_arrays.materials._replace(**params),
                textures=scene_arrays.textures._replace(texels=texels),
            )
            film = film_mod.make_film(static)
            pixel_sample, li = _pass_contributions(
                sc, static, spec, px, py, sample_index, jump
            )
            film = film_mod.splat(static, film, pixel_sample, li)
            img = film_mod.to_bitmap(film)
            return jnp.mean((img - target) ** 2)

        params = dict(material_float_params(scene_arrays.materials))
        params["texels"] = scene_arrays.textures.texels
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    return step


MATERIAL_FLOAT_FIELDS = (
    "base_color",
    "metallic",
    "roughness",
    "anisotropy",
    "specular",
    "specular_tint",
    "clearcoat",
    "clearcoat_roughness",
    "sheen",
    "sheen_tint",
    "int_ior",
    "ext_ior",
    "alpha",
    "eta_c",
    "k_c",
)


def material_float_params(materials):
    """The differentiable subset of the material table."""
    return {k: getattr(materials, k) for k in MATERIAL_FLOAT_FIELDS}
