"""Measure the CPU reference baseline (oracle stand-in) for BASELINE.md.

Configs from BASELINE.json: MiMC STARK at 2^13 steps single-threaded CPU
(forward, prove, verify, proof size) + forward NTT throughput at 2^20 points.
Emits JSON to stdout and baseline_cpu.json.
"""

import json
import sys
import time

sys.path.insert(0, '.')
sys.setrecursionlimit(10000)

from oracle.fft import fft
from oracle.mimc import mimc
from oracle.stark import mk_mimc_proof, verify_mimc_proof, MODULUS, GENERATOR
from oracle.compression import bin_length

results = {}

STEPS = 2**13
constants = [(i ** 7) ^ 42 for i in range(64)]
inp = 3

t0 = time.time()
output = mimc(inp, STEPS, constants)
results['mimc_forward_2e13_s'] = time.time() - t0

t0 = time.time()
proof = mk_mimc_proof(inp, STEPS, constants)
results['prove_2e13_s'] = time.time() - t0

t0 = time.time()
assert verify_mimc_proof(inp, STEPS, constants, output, proof)
results['verify_2e13_s'] = time.time() - t0

results['proof_size_2e13_bytes'] = bin_length(proof)

# Forward NTT at 2^20 points (coefficients -> evaluations).
N = 2**20
w = pow(GENERATOR, (MODULUS - 1) // N, MODULUS)
vals = [(i * 0x9E3779B97F4A7C15) % MODULUS for i in range(N)]
t0 = time.time()
fft(vals, MODULUS, w)
dt = time.time() - t0
results['ntt_2e20_s'] = dt
results['ntt_2e20_points_per_s'] = N / dt

print(json.dumps(results, indent=2))

# Default: record as `remeasured_idle` WITHOUT clobbering the pinned
# round-1 `prove_2e13_s` — every round's vs_baseline was computed
# against the pin, so replacing it silently would break cross-round
# comparability (see baseline_cpu.json note: the pin was taken under
# builder-session CPU contention; idle host measures ~1.7x faster).
# Pass --repin to overwrite the top-level keys instead.
import sys as _sys
if '--repin' in _sys.argv:
    with open('baseline_cpu.json', 'w') as fh:
        json.dump(results, fh, indent=2)
else:
    try:
        with open('baseline_cpu.json') as fh:
            prior = json.load(fh)
    except Exception:
        prior = {}
    if 'prove_2e13_s' not in prior:
        prior.update(results)
    results['date'] = time.strftime('%Y-%m-%d')
    prior['remeasured_idle'] = dict(
        prior.get('remeasured_idle', {}), **results)
    with open('baseline_cpu.json', 'w') as fh:
        json.dump(prior, fh, indent=2)
