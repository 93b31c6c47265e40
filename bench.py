#!/usr/bin/env python
"""Benchmark: rays/s/chip on a 1080p Cornell-style scene (BASELINE metric).

Runs the jitted wavefront render pass on the default JAX device (the real
TPU chip under the driver), times steady-state sample passes, and reports
useful rays/s (primary + NEE shadow + path rays, counted per-lane inside
the integrator). vs_baseline compares our pixel-samples/s against the
reference's best published anchor (12.1 Mpixel-samples/s look-dev frame,
BASELINE.md) -- the reference publishes no rays/s.

Prints ONE json line.
"""
import json
import sys
import time

import numpy as np


def main():
    import os
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    # persistent compilation cache: the 1080p program takes minutes to
    # compile via the remote TPU compiler; cache across bench runs
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_scene
    from kazen_tpu.core import rng
    from kazen_tpu.film import film as film_mod
    from kazen_tpu.integrate import camera as camera_mod
    from kazen_tpu.integrate.render import li_fn_for, sampler_spec
    from kazen_tpu.samplers import streams

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    arrays, static = _tiny_scene(width=width, height=height)
    spec = sampler_spec(static)

    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))

    def one_pass(scene, film, px, py, sample_index, jump):
        stream = streams.init_stream_jump(spec, px, py, sample_index, jump)
        stream, jitter = streams.next_pixel_2d(spec, stream)
        pixel_sample = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
        stream, aperture = streams.next_2d(spec, stream)
        rays = camera_mod.sample_ray(scene, static, pixel_sample, aperture)
        # li_fn_for picks the Pallas megakernel fast path on TPU backends
        # (integrate/megakernel.py) and the XLA wavefront otherwise
        _, li, nrays = li_fn_for(static)(scene, static, spec, stream, rays)
        return film_mod.splat_grid(static, film, jitter, li), nrays

    run = jax.jit(one_pass)
    film = film_mod.make_film(static)

    def jump_for(s):
        a, c = rng.advance_constants(s * 65536)
        return (
            (jnp.uint32(a >> 32), jnp.uint32(a & 0xFFFFFFFF)),
            (jnp.uint32(c >> 32), jnp.uint32(c & 0xFFFFFFFF)),
        )

    # warmup / compile
    film, nrays = run(arrays, film, px, py, jnp.uint32(0), jump_for(0))
    nrays_f = float(nrays)

    n_timed = 4
    t0 = time.time()
    for s in range(1, 1 + n_timed):
        film, nrays = run(arrays, film, px, py, jnp.uint32(s), jump_for(s))
    _ = float(nrays)  # sync
    dt = (time.time() - t0) / n_timed

    lanes = width * height
    rays_per_s = nrays_f / dt
    pixel_samples_per_s = lanes / dt
    ref_anchor = 12.1e6  # Mpixel-samples/s, BASELINE.md look-dev frame
    out = {
        "metric": "rays/s/chip (primary+shadow+path) 1080p Cornell-style",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": pixel_samples_per_s / ref_anchor,
        "detail": {
            "pixel_samples_per_s": pixel_samples_per_s,
            "rays_per_pass": nrays_f,
            "pass_seconds": dt,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
