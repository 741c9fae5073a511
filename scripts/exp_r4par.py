"""Round-4: can the tunneled D2H path go faster than floor(25ms) +
17 MB/s?  Tests, on the real chip:
  1. pure np.asarray of an already-materialized buffer (is the 25 ms
     "floor" actually dispatch-of-a-slice overhead?)
  2. N-way parallel fetch of N separate jit outputs (N=1..32)
  3. jax.device_get on a list of arrays (batched RPC?)
  4. copy_to_host_async + gather
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

report = {}
N = 139264  # ~557 kB of uint32 — the 2^13 proof payload size

mix = jax.jit(lambda x, s: x * jnp.uint32(2654435761) + s)
x0 = jnp.arange(N, dtype=jnp.uint32)
jax.block_until_ready(mix(x0, jnp.uint32(1)))

def fresh(salt):
    y = mix(x0, jnp.uint32(salt))
    y.block_until_ready()   # materialized on device, never fetched
    return y

def best_of(fn, reps=3):
    best = None
    for _ in range(reps):
        dt = fn()
        best = dt if best is None else min(best, dt)
    return best

salt = [100]
def t_pure_fetch():
    salt[0] += 1
    y = fresh(salt[0])
    t0 = time.perf_counter()
    np.asarray(y)
    return time.perf_counter() - t0

report["pure_fetch_557k_s"] = best_of(t_pure_fetch)
print(f"pure fetch 557k (materialized, cold): "
      f"{report['pure_fetch_557k_s']*1e3:.1f} ms", flush=True)

# tiny pure fetch: true floor without slice dispatch
tiny = jax.jit(lambda s: jnp.full((8,), s, jnp.uint32))
jax.block_until_ready(tiny(jnp.uint32(1)))
def t_tiny():
    salt[0] += 1
    y = tiny(jnp.uint32(salt[0]))
    y.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(y)
    return time.perf_counter() - t0
report["pure_fetch_tiny_s"] = best_of(t_tiny, 5)
print(f"pure fetch tiny (materialized, cold): "
      f"{report['pure_fetch_tiny_s']*1e3:.1f} ms", flush=True)

# N-way parallel: N separate output buffers totalling 557 kB
for nway in (2, 4, 8, 16, 32):
    q = N // nway
    g = jax.jit(lambda x, s, nway=nway, q=q: [
        x[i * q:(i + 1) * q] * jnp.uint32(3) + s for i in range(nway)])
    jax.block_until_ready(g(x0, jnp.uint32(1)))
    def t_par(nway=nway, g=g):
        salt[0] += 1
        parts = g(x0, jnp.uint32(salt[0]))
        jax.block_until_ready(parts)
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(nway) as pool:
            list(pool.map(np.asarray, parts))
        return time.perf_counter() - t0
    report[f"par{nway}_s"] = best_of(t_par)
    print(f"{nway}-way parallel fetch 557k: "
          f"{report[f'par{nway}_s']*1e3:.1f} ms", flush=True)

# jax.device_get on the list (single call, runtime may batch)
g8 = jax.jit(lambda x, s: [x[i * (N // 8):(i + 1) * (N // 8)]
                           * jnp.uint32(3) + s for i in range(8)])
jax.block_until_ready(g8(x0, jnp.uint32(1)))
def t_devget():
    salt[0] += 1
    parts = g8(x0, jnp.uint32(salt[0]))
    jax.block_until_ready(parts)
    t0 = time.perf_counter()
    jax.device_get(parts)
    return time.perf_counter() - t0
report["device_get_list8_s"] = best_of(t_devget)
print(f"jax.device_get(list of 8): "
      f"{report['device_get_list8_s']*1e3:.1f} ms", flush=True)

def t_devget1():
    salt[0] += 1
    y = fresh(salt[0])
    t0 = time.perf_counter()
    jax.device_get(y)
    return time.perf_counter() - t0
report["device_get_single_s"] = best_of(t_devget1)
print(f"jax.device_get(single 557k): "
      f"{report['device_get_single_s']*1e3:.1f} ms", flush=True)

# copy_to_host_async then gather
def t_async():
    salt[0] += 1
    parts = g8(x0, jnp.uint32(salt[0]))
    jax.block_until_ready(parts)
    t0 = time.perf_counter()
    for p in parts:
        p.copy_to_host_async()
    out = [np.asarray(p) for p in parts]
    return time.perf_counter() - t0
report["async8_s"] = best_of(t_async)
print(f"copy_to_host_async x8 + gather: "
      f"{report['async8_s']*1e3:.1f} ms", flush=True)

# does fetch overlap with UNRELATED device compute in flight?
heavy = jax.jit(lambda x: ((x.astype(jnp.float32) @ x.astype(jnp.float32).T)
                           .sum()).astype(jnp.uint32))
m = jnp.ones((2048, 2048), jnp.float32)
hx = jnp.arange(2048 * 2048, dtype=jnp.uint32).reshape(2048, 2048)
jax.block_until_ready(heavy(hx))
def t_overlap():
    salt[0] += 1
    y = fresh(salt[0])
    t0 = time.perf_counter()
    fut = heavy(hx)          # async dispatch of heavy compute
    np.asarray(y)            # fetch while compute runs?
    t_fetch = time.perf_counter() - t0
    fut.block_until_ready()
    return t_fetch
report["fetch_during_compute_s"] = best_of(t_overlap)
print(f"fetch 557k while heavy compute in flight: "
      f"{report['fetch_during_compute_s']*1e3:.1f} ms", flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_r4par.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps(report, indent=2))
