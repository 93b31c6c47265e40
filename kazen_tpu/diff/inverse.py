"""Inverse rendering: gradient-based recovery of scene parameters from
target images (BASELINE config 5 / north-star 'differentiable integrator').

The whole forward path (sampling, BSDFs, MIS weights, film splat) is
differentiable; discrete choices (lobe selection, RR, light pick) are
detached through their uniforms while the continuous factors (VNDF lobes,
MIS weights, textures) carry reparameterized gradients. Each optimizer step
renders one (or a few) sample passes at a fresh sample index, so the
stochastic gradient sweeps the full sampler stream over time.

Parameters: any subset of the material float table, the texel pool, and
light radiance. Uses optax Adam.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import rng
from ..film import film as film_mod
from ..integrate.render import _render_pass, sampler_spec


PARAM_KEYS = ("materials", "texels", "light_radiance", "bg_color")


def get_params(arrays, keys: Sequence[str]) -> Dict:
    from ..dist.sharding import material_float_params

    out = {}
    if "materials" in keys:
        out["materials"] = material_float_params(arrays.materials)
    if "texels" in keys:
        out["texels"] = arrays.textures.texels
    if "light_radiance" in keys:
        out["light_radiance"] = arrays.light_radiance
    if "bg_color" in keys:
        out["bg_color"] = arrays.bg_color
    return out


def apply_params(arrays, params: Dict):
    if "materials" in params:
        arrays = arrays._replace(
            materials=arrays.materials._replace(**params["materials"])
        )
    if "texels" in params:
        arrays = arrays._replace(
            textures=arrays.textures._replace(texels=params["texels"])
        )
    if "light_radiance" in params:
        arrays = arrays._replace(light_radiance=params["light_radiance"])
    if "bg_color" in params:
        arrays = arrays._replace(bg_color=params["bg_color"])
    return arrays


@dataclass
class OptimizeResult:
    params: Dict
    losses: np.ndarray
    arrays: object  # SceneArrays with optimized parameters applied


def optimize(
    arrays,
    static,
    target,
    param_keys: Sequence[str] = ("materials",),
    steps: int = 100,
    learning_rate: float = 5e-2,
    spp_per_step: int = 1,
    spec=None,
    clip_to_unit: bool = True,
    callback=None,
) -> OptimizeResult:
    """Minimize mean L2 between rendered image and target."""
    if spec is None:
        spec = sampler_spec(static)
    target = jnp.asarray(target)

    h, w = static.height, static.width
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))

    opt = optax.adam(learning_rate)
    params = get_params(arrays, param_keys)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, sample_indices, jumps):
        def loss_fn(p):
            sc = apply_params(arrays, p)
            film = film_mod.make_film(static)
            for i in range(spp_per_step):
                jump = (
                    (jumps[i, 0], jumps[i, 1]),
                    (jumps[i, 2], jumps[i, 3]),
                )
                film, _ = _render_pass.__wrapped__(
                    sc, static, spec, film, px, py, sample_indices[i], jump
                )
            img = film_mod.to_bitmap(film)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if clip_to_unit and "materials" in params:
            m = dict(params["materials"])
            for k in ("base_color", "metallic", "roughness"):
                if k in m:
                    m[k] = jnp.clip(m[k], 0.0, 1.0)
            params = dict(params, materials=m)
        if clip_to_unit and "texels" in params:
            params = dict(params, texels=jnp.clip(params["texels"], 0.0, 1.0))
        return params, opt_state, loss

    losses = []
    n_stream = spec.effective_sample_count
    for it in range(steps):
        sidx = []
        jmp = []
        for i in range(spp_per_step):
            s = (it * spp_per_step + i) % max(n_stream, 1)
            a, c = rng.advance_constants(s * 65536)
            sidx.append(s)
            jmp.append(
                [a >> 32, a & 0xFFFFFFFF, c >> 32, c & 0xFFFFFFFF]
            )
        params, opt_state, loss = step_fn(
            params,
            opt_state,
            jnp.asarray(sidx, jnp.uint32),
            jnp.asarray(np.asarray(jmp, np.uint32)),
        )
        losses.append(float(loss))
        if callback is not None:
            callback(it, losses[-1], params)

    return OptimizeResult(
        params=params,
        losses=np.asarray(losses),
        arrays=apply_params(arrays, params),
    )
