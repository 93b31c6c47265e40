#!/usr/bin/env python
"""Megakernel supported-class cliff measurement (VERDICT r4 #8).

A <=128-tri Cornell-style scene rides the fused megakernel; adding ONE
image texture drops it to the wavefront + cluster trace. This lab
measures both on the same hardware/scene so the cliff's size is a
committed number instead of a silent fallback. Writes
benchmarks/megakernel_cliff_r05.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
        ),
    )
    import scenes
    from kazen_tpu.scene import description as D
    from kazen_tpu.scene.compiler import compile_scene
    from kazen_tpu.core import rng
    from kazen_tpu.film import film as film_mod
    from kazen_tpu.integrate import camera as camera_mod
    from kazen_tpu.integrate.render import li_fn_for, sampler_spec
    from kazen_tpu.samplers import streams

    w, h = 960, 540
    out = {"resolution": f"{w}x{h}", "device": str(jax.devices()[0])}
    for variant in ("const", "image_texture"):
        desc = scenes.cornell_box(width=w, height=h, spp=1, max_depth=5)
        if variant == "image_texture":
            # one 64x64 image texture on the back wall's albedo
            tex = (
                np.linspace(0, 1, 64 * 64 * 3)
                .reshape(64, 64, 3)
                .astype(np.float32)
            )
            desc.meshes[2].bsdf = D.Lambertian(
                albedo=D.ImageTexture(data=tex)
            )
        arrays, static = compile_scene(desc)
        used_mk = bool(getattr(static, "use_megakernel", False))
        spec = sampler_spec(static)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
        py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
        a, c = rng.advance_constants(0)
        jump = (
            (jnp.uint32(a >> 32), jnp.uint32(a & 0xFFFFFFFF)),
            (jnp.uint32(c >> 32), jnp.uint32(c & 0xFFFFFFFF)),
        )

        @jax.jit
        def one_pass(scene, px, py, jump):
            stream = streams.init_stream_jump(
                spec, px, py, jnp.uint32(0), jump
            )
            stream, jitter = streams.next_pixel_2d(spec, stream)
            ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
            stream, ap = streams.next_2d(spec, stream)
            rays = camera_mod.sample_ray(scene, static, ps, ap)
            _, li, nrays = li_fn_for(static)(
                scene, static, spec, stream, rays
            )
            return jnp.sum(li), nrays

        res = one_pass(arrays, px, py, jump)
        jax.block_until_ready(res)
        t0 = time.time()
        n = 4
        for _ in range(n):
            res = one_pass(arrays, px, py, jump)
        jax.block_until_ready(res)
        dt = (time.time() - t0) / n
        out[variant] = {
            "use_megakernel": used_mk,
            "pass_seconds": dt,
            "rays_per_pass": float(res[1]),
            "rays_per_s": float(res[1]) / dt,
        }
        print(variant, out[variant])
    out["cliff_x"] = (
        out["image_texture"]["pass_seconds"] / out["const"]["pass_seconds"]
    )
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "megakernel_cliff_r05.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("cliff:", out["cliff_x"], "->", path)


if __name__ == "__main__":
    main()
