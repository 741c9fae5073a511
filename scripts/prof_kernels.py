import sys, os, time, random
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from starks_tpu.ops import limbs as fl, kernels as kn
from starks_tpu.utils.conversions import ints_to_limbs
rng = random.Random(0)
print("device:", jax.devices()[0])

def mk(n):
    return jnp.asarray(ints_to_limbs([rng.randrange(fl.MODULUS) for _ in range(n)]))

def chain(f, x, b, reps):
    y = f(x, b); jax.block_until_ready(y)      # compile
    t0 = time.time()
    for _ in range(reps):
        x = f(x, b)
    x.block_until_ready()
    t1 = time.time()
    _ = np.asarray(x[:1])                       # force real fetch
    t2 = time.time()
    return (t1-t0)/reps, t2-t1

for n in (2**13, 2**16, 2**19):
    a, b = mk(n), mk(n)
    per, fetch = chain(kn.mul, a, b, 20)
    print(f"mul [{n:7d},16] chained: {per*1000:8.2f} ms/call  (fetch {fetch*1000:.1f} ms)")

a, b = mk(2**16), mk(2**16)
per, fetch = chain(kn.add, a, b, 20)
print(f"add [65536,16] chained:  {per*1000:8.2f} ms/call")
per, fetch = chain(lambda x, b: kn.batch_inv(x), a, b, 3)
print(f"batch_inv [65536]:       {per*1000:8.2f} ms/call")

# NTT end to end (steady state)
from starks_tpu.ops import ntt as ntt_mod
P = fl.MODULUS
n = 2**16
g = pow(7, (P-1)//n, P)
dom = ntt_mod.get_domain(n, g)
x = mk(n)
y = ntt_mod.ntt(x, dom); jax.block_until_ready(y)
t0 = time.time()
for _ in range(3):
    y = ntt_mod.ntt(y, dom)
y.block_until_ready()
print(f"ntt 2^16 steady:         {(time.time()-t0)/3*1000:8.1f} ms")
