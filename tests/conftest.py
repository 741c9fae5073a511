"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the tunneled `axon` TPU backend at
interpreter start and pins JAX_PLATFORMS=axon, so plain env vars are
ignored; `jax.config.update` after import is the working override
(SURVEY.md §5: distribution logic must be testable without TPUs). Export
STARKS_TPU_TEST_PLATFORM=axon to run the suite on the real chip instead.
"""

import os

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
# READ-ONLY cache: xc.LoadedExecutable.serialize() segfaults (observed,
# deterministic) for some executables built under the forced 8-device CPU
# platform, killing the whole suite from inside the cache-WRITE path
# (jax/_src/compilation_cache.py::put_executable_and_time). An unreachable
# min-compile-time threshold skips the write (compiler.py::_cache_write
# checks it BEFORE serializing) while existing entries still load.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
