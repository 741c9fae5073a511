"""Round-4: characterize the tunneled D2H path.

exp_r4split saw: full fetch right after compute costs floor+payload
(42 ms for 557 kB), but a fetch of a buffer forced EARLIER was free.
Questions:
  1. Does a 1-element force make a later full fetch of the SAME buffer
     free (i.e. the tunnel moves whole buffers + caches host-side)?
  2. Do concurrent fetches pipeline (parallel slices from threads)?
  3. Is the streaming rate dtype/shape dependent?
"""

import json
import os
import sys
import time
import concurrent.futures as cf

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from starks_tpu.utils import timing

report = {}
floor = timing.transfer_floor()
report["floor_s"] = floor
print(f"floor: {floor*1e3:.1f} ms", flush=True)

N = 139264  # ~557 kB of uint32, same scale as the 2^13 proof payload
f = jax.jit(lambda x: x * jnp.uint32(2654435761) + jnp.uint32(1))
x = jnp.arange(N, dtype=jnp.uint32)
_ = np.asarray(f(x))  # compile

def fresh():
    return f(x + jnp.uint32(np.random.randint(1, 1 << 30)))

# -- 1a. full fetch immediately after a 1-element force of same buffer
y = fresh()
t0 = time.perf_counter(); np.asarray(y.ravel()[:1]); t_f1 = time.perf_counter() - t0
t0 = time.perf_counter(); np.asarray(y); t_full_after = time.perf_counter() - t0
report["force1_s"] = t_f1
report["full_after_force1_s"] = t_full_after
print(f"1-elem force: {t_f1*1e3:.1f} ms; full fetch right after: "
      f"{t_full_after*1e3:.1f} ms", flush=True)

# -- 1b. same, but wait 300 ms between (background transfer?)
y = fresh()
np.asarray(y.ravel()[:1])
time.sleep(0.3)
t0 = time.perf_counter(); np.asarray(y); t_full_delay = time.perf_counter() - t0
report["full_after_force1_delay_s"] = t_full_delay
print(f"full fetch 300ms after 1-elem force: {t_full_delay*1e3:.1f} ms",
      flush=True)

# -- 1c. full fetch of a NEVER-touched fresh buffer
y = fresh()
t0 = time.perf_counter(); np.asarray(y); t_cold = time.perf_counter() - t0
report["full_cold_s"] = t_cold
print(f"full cold fetch: {t_cold*1e3:.1f} ms "
      f"({N*4/max(t_cold-floor,1e-9)/1e6:.1f} MB/s stream)", flush=True)

# -- 1d. second full fetch of the same buffer (np caching?)
t0 = time.perf_counter(); np.asarray(y); t_again = time.perf_counter() - t0
report["full_again_s"] = t_again
print(f"full fetch again: {t_again*1e3:.1f} ms", flush=True)

# -- 2. parallel slice fetches of a fresh buffer (slices are new
#    device buffers; do the 4 RPCs pipeline?)
g = jax.jit(lambda x: [ (x[i*(N//4):(i+1)*(N//4)] * jnp.uint32(3) + jnp.uint32(i)) for i in range(4) ])
parts = g(x); [np.asarray(p.ravel()[:1]) for p in parts]  # compile+force
parts = g(x + jnp.uint32(7))
t0 = time.perf_counter()
with cf.ThreadPoolExecutor(4) as pool:
    list(pool.map(np.asarray, parts))
t_par = time.perf_counter() - t0
report["parallel4_fresh_s"] = t_par
print(f"4 parallel slice fetches (fresh): {t_par*1e3:.1f} ms", flush=True)

parts = g(x + jnp.uint32(11))
t0 = time.perf_counter()
for p in parts:
    np.asarray(p)
t_ser = time.perf_counter() - t0
report["serial4_fresh_s"] = t_ser
print(f"4 serial slice fetches (fresh): {t_ser*1e3:.1f} ms", flush=True)

# -- 3. dtype effect: same bytes as uint8
h = jax.jit(lambda x: jnp.tile((x * jnp.uint32(5)).astype(jnp.uint8), 4))
yb = h(x)
t0 = time.perf_counter(); np.asarray(yb); t_u8 = time.perf_counter() - t0
report["full_cold_u8_s"] = t_u8
print(f"u8 cold fetch same bytes: {t_u8*1e3:.1f} ms", flush=True)

# -- 4. bigger buffer: 4 MB streaming rate
M = 1 << 20
big = jax.jit(lambda x: x * jnp.uint32(9))(jnp.arange(M, dtype=jnp.uint32))
t0 = time.perf_counter(); np.asarray(big); t_big = time.perf_counter() - t0
report["cold_4mb_s"] = t_big
report["stream_mb_per_s"] = 4 * M / max(t_big - floor, 1e-9) / 1e6
print(f"4MB cold fetch: {t_big*1e3:.1f} ms -> "
      f"{report['stream_mb_per_s']:.1f} MB/s", flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_r4fetch.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps(report, indent=2))
