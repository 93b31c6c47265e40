"""Real multi-process jax.distributed coverage (VERDICT r3 #5).

Spawns TWO separate CPU processes that call
``dist.multihost.initialize`` (-> jax.distributed.initialize with a
localhost coordinator), build the global mesh via
``dist.multihost.global_mesh`` (4 local devices each -> 8 global), render
the pixel-sharded frame with the film all-reduce riding real cross-process
collectives, and write their images; the test compares process 0's global
image against a single-process render. This is the §5 distributed-backend
subsystem actually *executing* with num_processes > 1 -- previously the
initialize passthrough had never run multi-process anywhere.
"""
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_WORKER = r"""
import os, sys
port, pid, outdir, repo = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))
import jax
jax.config.update("jax_platforms", "cpu")
from kazen_tpu.dist import multihost
multihost.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
mesh = multihost.global_mesh()
assert mesh.devices.size == 8

import numpy as np
import scenes
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.dist.sharding import render_distributed

scene = scenes.cornell_box(width=16, height=16, spp=2)
arrays, static = compile_scene(scene)
# the film is fully replicated after the psum: every process holds the
# global image
img = render_distributed(mesh, arrays, static, spp=2)
np.save(os.path.join(outdir, f"img_{pid}.npy"), np.asarray(img))
print("WORKER_OK", pid, float(np.asarray(img).mean()))
"""


def test_two_process_render():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    with tempfile.TemporaryDirectory() as outdir:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _WORKER, str(port), str(pid), outdir,
                 repo],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for pid in (0, 1)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid}:\n{out[-3000:]}"
            assert f"WORKER_OK {pid}" in out, out[-2000:]
        img0 = np.load(os.path.join(outdir, "img_0.npy"))
        img1 = np.load(os.path.join(outdir, "img_1.npy"))

    # both processes hold the same all-reduced film
    np.testing.assert_allclose(img0, img1, atol=1e-6)

    # and it matches the single-process render exactly (counter-based
    # streams are placement-independent)
    import scenes

    from kazen_tpu.integrate.render import render
    from kazen_tpu.scene.compiler import compile_scene

    scene = scenes.cornell_box(width=16, height=16, spp=2)
    arrays, static = compile_scene(scene)
    single = np.asarray(render(arrays, static, spp=2))
    np.testing.assert_allclose(img0, single, atol=1e-5)
