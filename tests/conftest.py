import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. Note: this machine's sitecustomize imports jax at
# interpreter startup (before conftest), so setting os.environ alone is not
# enough -- use jax.config.update, which works any time before first backend
# use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

# Process-survival note (round 5): two in-suite failure modes are fatal to
# the whole process and cannot be mitigated by XLA flags on jaxlib 0.9
# (`--xla_cpu_use_thunk_runtime=false` is ignored with a removal warning):
#   (a) the XLA:CPU parallel thunk executor can abort() in a collective
#       rendezvous on the 8-virtual-device mesh (sharded inverse-step grad
#       test), and
#   (b) compiling the megakernel program late in a long-lived process can
#       segfault in backend_compile (accumulated process state; the same
#       compile succeeds in a fresh process).
# Both test groups therefore run in fresh subprocesses via
# tests/_isolate.py's decorator (the pattern test_multiprocess.py already
# uses), which keeps `python -m pytest tests/ -q` green in one process.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on CPU (big
# unrolled integrator graphs), so warm re-runs of unchanged code drop from
# minutes to seconds. Keyed by HLO, so source changes recompile as usual.
#
# The cache holds MACHINE-SPECIFIC XLA:CPU executables; entries written on
# a different host (the bench driver's machine shares this repo dir) load
# with mismatched codegen features and abort the process mid-suite
# ("Fatal Python error: Aborted", +prefer-no-scatter AOT warnings). Key
# the CPU test cache by a host CPU fingerprint to keep hosts separate.
import hashlib

# Round-5 finding: keying by /proc/cpuinfo flags alone is NOT enough --
# the bench driver's machine has an identical flags line but compiles
# XLA:CPU AOT results with different feature preferences
# (+prefer-no-scatter/+prefer-no-gather); loading its entries here
# produced SILENTLY WRONG renders (a 6x-darker image, found via
# test_occlusion_bound), not just the documented aborts. Key the cache by
# machine identity + jaxlib version as well.
_key = ""
for _f in ("/proc/cpuinfo", "/etc/machine-id"):
    try:
        with open(_f) as f:
            _key += next(
                (l for l in f if l.startswith("flags")), f.read()
            )
    except OSError:
        _key += "absent"
try:
    import jaxlib

    _key += getattr(jaxlib, "__version__", "")
except Exception:
    pass
import os as _os2

_key += _os2.uname().nodename
_fp = hashlib.sha1(_key.encode()).hexdigest()[:12]
_cache_dir = os.path.join(
    os.path.dirname(__file__), "..", ".jax_cache", f"cpu-{_fp}"
)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass
