"""Probe: does the tunneled runtime pre-issue a device_get RPC while
the producing computation is still running (fetch overlaps compute),
or is the RPC only sent after the buffer is ready (fetch serializes
after compute)?

Method: a dependent elementwise chain tuned to ~40-80 ms device time
with a tiny (4 kB) output. Compare:
  (a) immediate fetch: device_get right after dispatch
  (b) delayed fetch: host sleeps ~compute time, then device_get
If (a) ~= (b) + compute, the RPC is not pre-issued and early-issue
pipelining can't hide the transfer floor. If (a) < (b) markedly, the
out-leg of the RTT overlaps compute and a split-core pipeline wins.

Writes scripts/exp_fetch_overlap.json.
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache_axon"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

N = 1 << 20
DEPTH = 256      # dependent elementwise steps ~50-150us each


@jax.jit
def chain(x):
    def step(c, _):
        return c * c + jnp.uint32(1), None
    out, _ = jax.lax.scan(step, x, None, length=DEPTH)
    return out[:1024]                    # 4 kB output


x = jnp.asarray(np.arange(N, dtype=np.uint32))

# Warm + measure pure compute via post-hoc fetch of a warm result.
r = chain(x)
np.asarray(r[:1])

# (floor) 1-element fetch of an ALREADY-READY array
ready = chain(x)
np.asarray(ready[:1])
floors = []
for _ in range(5):
    t0 = time.perf_counter()
    np.asarray(ready[:1])
    floors.append(time.perf_counter() - t0)
floor = min(floors)

# (a) immediate fetch after dispatch
imm = []
for _ in range(5):
    t0 = time.perf_counter()
    out = chain(x)
    np.asarray(out)
    imm.append(time.perf_counter() - t0)

# (b) delayed fetch: sleep then fetch
# first estimate compute: immediate minus floor is an upper bound;
# bisect the sleep until fetch-after-sleep is ~floor.
est = min(imm) - floor
dl = []
for _ in range(5):
    t0 = time.perf_counter()
    out = chain(x)
    time.sleep(max(est, 0.001))
    t1 = time.perf_counter()
    np.asarray(out)
    dl.append((time.perf_counter() - t0, time.perf_counter() - t1))

row = {
    "depth": DEPTH,
    "n": N,
    "transfer_floor_s": floor,
    "immediate_total_s": imm,
    "est_compute_s": est,
    "delayed_total_and_postsleep_fetch_s": dl,
    "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
}
print(json.dumps(row, indent=2))
with open(os.path.join(_REPO, "scripts", "exp_fetch_overlap.json"),
          "w") as fh:
    json.dump(row, fh, indent=2)
