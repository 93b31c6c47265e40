#!/usr/bin/env python
"""Strong-scaling efficiency harness (BASELINE: >=85% efficiency 1->N).

Renders the same frame on 1 device and on N devices (pixel lanes sharded,
scene replicated) and reports wall-clock scaling efficiency. On a single
real chip this runs on the virtual CPU mesh (functional validation); on a
pod slice it measures real ICI scaling.

Usage: python benchmarks/scaling.py [--devices 8] [--width 512] [--spp 4]
"""
import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu" and args.devices and len(jax.devices()) < args.devices:
        print(
            "re-run with XLA_FLAGS=--xla_force_host_platform_device_count=N",
            file=sys.stderr,
        )
        sys.exit(1)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_scene
    from kazen_tpu.dist.sharding import make_mesh, render_distributed

    n_dev = args.devices or len(jax.devices())
    arrays, static = _tiny_scene(width=args.width, height=args.height)

    results = {}
    for nd in (1, n_dev):
        mesh = make_mesh(jax.devices()[:nd])
        # warmup/compile
        img = render_distributed(mesh, arrays, static, spp=1)
        jax.block_until_ready(img)
        t0 = time.time()
        img = render_distributed(mesh, arrays, static, spp=args.spp)
        jax.block_until_ready(img)
        results[nd] = time.time() - t0

    speedup = results[1] / results[n_dev]
    eff = speedup / n_dev
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency 1->{n_dev} devices",
                "value": eff,
                "unit": "fraction",
                "vs_baseline": eff / 0.85,
                "detail": {
                    "t1": results[1],
                    f"t{n_dev}": results[n_dev],
                    "speedup": speedup,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
