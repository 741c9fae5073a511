"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the tunneled `axon` TPU backend at
interpreter start and pins JAX_PLATFORMS=axon, so plain env vars are
ignored; `jax.config.update` after import is the working override
(SURVEY.md §5: distribution logic must be testable without TPUs). Export
STARKS_TPU_TEST_PLATFORM=axon to run the suite on the real chip instead.
"""

import os
import resource

# XLA:CPU segfaults (SIGSEGV) compiling the large fused-prover graphs:
# a compiler pass overflows the default 8 MB stack (verified: the same
# compile succeeds under a 256 MB stack and crashes without it). Raise
# the soft limit before the backend initializes. This is also the root
# cause of the round-1 "suite segfaults at 84/102" failure mode.
try:
    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    want = 256 * 1024 * 1024
    if soft != resource.RLIM_INFINITY and soft < want:
        new_soft = want if hard == resource.RLIM_INFINITY else min(want,
                                                                   hard)
        resource.setrlimit(resource.RLIMIT_STACK, (new_soft, hard))
except (ValueError, OSError):
    pass

# Must precede first backend initialization for the 8-device CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

_platform = os.environ.get("STARKS_TPU_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)

# Persistent compilation cache: kernel compiles are one-time per shape.
# Dir is per-platform: cache entries produced under the axon backend come
# from a REMOTE compile service targeting that host's CPU features, and
# loading them in a local CPU process risks SIGILL/hangs (observed).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               f".jax_cache_{_platform}"))
# Cache-WRITE policy: xc.LoadedExecutable.serialize() segfaults
# (observed, deterministic) for some executables built for the forced
# 8-device CPU MESH, killing the run from inside the cache-write path
# (jax/_src/compilation_cache.py::put_executable_and_time). The mesh
# tests are subprocess-isolated (tests/test_parallel.py) and that
# subprocess keeps the cache read-only via an unreachable
# min-compile-time threshold; the main suite (single-device programs)
# writes the cache so repeat runs skip recompilation.
if os.environ.get("STARKS_TPU_MESH_SUBPROC"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
