"""Benchmark driver: full MiMC STARK proof generation vs the CPU reference.

Prints ONE JSON line:
  {"metric": "mimc_stark_prove_2e13_speedup", "value": <x faster than the
   measured single-thread CPU reference>, "unit": "x_vs_cpu_reference",
   "vs_baseline": <value / 100, i.e. fraction of the 100x target>}

bench_details.json carries the full report (BASELINE.md configs):
  - config 1: 2^13 e2e prove/verify + per-stage timings + proof size
  - config 2: 2^16 e2e prove (stress NTT + Merkle on one chip)
  - NTT throughput: 2^20-point forward NTT, points/sec/chip, compared
    against the written VPU roofline below
  - blake2s throughput (hashes/sec) vs its roofline

Roofline model (TPU v5e, one core):
  VPU = 4 ALU sets x (8 sublanes x 128 lanes) @ ~0.94 GHz
      ~= 3.9e12 int32 op/s speed-of-light.
  modmul (16x16-bit limbs, sparse-prime fold) ~= 700 int32 ops
  => ~5.5e9 modmul/s SOL.
  NTT(n): log2(n) stages x n/2 butterflies x (1 modmul + add + sub)
  => 2^20-pt NTT SOL ~= (20 * 2^19 * 700 + 20 * 2^19 * 200) / 3.9e12
     ~= 2.4 ms  => ~430M points/s SOL.
  blake2s compression ~= 1200 int32 ops => ~3.2e9 hashes/s SOL.
The CPU reference numbers come from scripts/measure_baseline.py ->
baseline_cpu.json (measured on this machine; see BASELINE.md).
"""

import json
import os
import resource
import sys
import threading
import time

# XLA:CPU overflows the default 8 MB stack compiling the fused-prover
# graphs (SIGSEGV; see tests/conftest.py). Raise it before jax loads.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 256 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        resource.setrlimit(resource.RLIMIT_STACK, (
            _want if _hard == resource.RLIM_INFINITY else min(_want, _hard),
            _hard))
except (ValueError, OSError):
    pass

STEPS = 2 ** 13
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

CPU_BASELINE_S = 4.7457   # measured: scripts/measure_baseline.py, this host
TARGET_SPEEDUP = 100.0

VPU_INT32_OPS = 3.9e12          # v5e speed-of-light (see module docstring)
MODMUL_OPS = 700
BUTTERFLY_EXTRA_OPS = 200
BLAKE2S_OPS = 1200


def _probe_device(timeout_s=600.0) -> bool:
    """Check the accelerator actually executes (the tunneled chip can
    wedge if a prior client died mid-grant); never hang the bench."""
    import jax
    import jax.numpy as jnp
    ok = []

    def run():
        try:
            x = jnp.ones((128, 128), jnp.float32)
            float(jnp.sum(x))
            ok.append(True)
        except Exception:
            pass

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout_s)
    return bool(ok)


def _time_best(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def _bench_ntt(n_points: int):
    """Forward NTT at n_points on device: points/sec + roofline ratio."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from starks_tpu.ops import fused, limbs as fl

    G = pow(7, (fl.MODULUS - 1) // n_points, fl.MODULUS)
    table = fused._power_table_np(G, n_points)
    tw = jnp.asarray(fused._stacked_twiddles(table))
    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.integers(0, 2 ** 16, (n_points, 16),
                                    dtype=np.uint32))
    f = jax.jit(fused.ntt_dif)
    jax.block_until_ready(f(vals, tw))            # compile
    t = _time_best(lambda: jax.block_until_ready(f(vals, tw)), reps=3)
    logn = n_points.bit_length() - 1
    sol_s = (logn * (n_points // 2) *
             (MODMUL_OPS + BUTTERFLY_EXTRA_OPS)) / VPU_INT32_OPS
    return {
        "n_points": n_points,
        "time_s": t,
        "points_per_s": n_points / t,
        "roofline_time_s": sol_s,
        "fraction_of_roofline": sol_s / t,
    }


def _bench_hash(n_msgs: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from starks_tpu.ops import blake2s as b2

    rng = np.random.default_rng(6)
    msgs = jnp.asarray(rng.integers(0, 2 ** 32, (n_msgs, 16),
                                    dtype=np.uint32))
    f = jax.jit(lambda m: b2.blake2s_words_t(m, 64))
    jax.block_until_ready(f(msgs))
    t = _time_best(lambda: jax.block_until_ready(f(msgs)), reps=3)
    sol_s = n_msgs * BLAKE2S_OPS / VPU_INT32_OPS
    return {
        "n_msgs": n_msgs,
        "time_s": t,
        "hashes_per_s": n_msgs / t,
        "roofline_time_s": sol_s,
        "fraction_of_roofline": sol_s / t,
    }


def main():
    platform = os.environ.get("STARKS_BENCH_PLATFORM", "")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     f".jax_cache_{platform or 'axon'}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if not platform and not _probe_device():
        # Device wedged/unavailable: re-exec on CPU so the bench still
        # reports a number (flagged in details).
        os.environ["STARKS_BENCH_PLATFORM"] = "cpu"
        os.execv(sys.executable, [sys.executable] + sys.argv)

    plat_name = jax.devices()[0].platform
    on_chip = plat_name != "cpu"
    import starks_tpu.prover as tp
    from starks_tpu import serialize as ser
    from starks_tpu import verifier as tv
    from starks_tpu.models.mimc import mimc_forward

    if os.path.exists("baseline_cpu.json"):
        with open("baseline_cpu.json") as fh:
            cpu = json.load(fh)
    else:
        cpu = {"prove_2e13_s": CPU_BASELINE_S}
    cpu_time = cpu["prove_2e13_s"]

    # --- config 1: 2^13 e2e (headline) --------------------------------
    t0 = time.time()
    proof = tp.mk_mimc_proof(INP, STEPS, CONSTANTS)
    warm_s = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        proof = tp.mk_mimc_proof(INP, STEPS, CONSTANTS)
        times.append(time.time() - t0)
    best = min(times)
    speedup = cpu_time / best

    output = mimc_forward(INP, STEPS, CONSTANTS)
    t0 = time.time()
    verified = tv.verify_mimc_proof(INP, STEPS, CONSTANTS, output, proof)
    verify_s = time.time() - t0

    details = {
        "platform": plat_name,
        "device": str(jax.devices()[0]),
        "steps": STEPS,
        "warmup_s": warm_s,
        "prove_s_best": best,
        "prove_s_all": times,
        "stage_timings_s": dict(tp.LAST_PROOF_TIMINGS),
        "cpu_reference_prove_s": cpu_time,
        "speedup_vs_cpu": speedup,
        "verify_s": verify_s,
        "verified": bool(verified),
        "proof_size_bytes": ser.bin_length(proof),
        "proof_size_raw_bytes": ser.raw_length(proof),
    }

    # --- config 2: 2^16 e2e (one chip) --------------------------------
    if on_chip or os.environ.get("STARKS_BENCH_FULL") == "1":
        try:
            steps2 = 2 ** 16
            t0 = time.time()
            proof2 = tp.mk_mimc_proof(INP, steps2, CONSTANTS)
            warm2 = time.time() - t0
            t0 = time.time()
            proof2 = tp.mk_mimc_proof(INP, steps2, CONSTANTS)
            prove2 = time.time() - t0
            out2 = mimc_forward(INP, steps2, CONSTANTS)
            ok2 = tv.verify_mimc_proof(INP, steps2, CONSTANTS, out2,
                                       proof2)
            details["config2_2e16"] = {
                "steps": steps2,
                "warmup_s": warm2,
                "prove_s": prove2,
                "verified": bool(ok2),
                "proof_size_bytes": ser.bin_length(proof2),
                "stage_timings_s": dict(tp.LAST_PROOF_TIMINGS),
            }
        except Exception as e:           # OOM etc: report, don't die
            details["config2_2e16"] = {"error": repr(e)}

        # --- NTT throughput + roofline (BASELINE.md row 5) ------------
        try:
            details["ntt_2e20"] = _bench_ntt(2 ** 20)
        except Exception as e:
            details["ntt_2e20"] = {"error": repr(e)}
        try:
            details["blake2s_2e16"] = _bench_hash(2 ** 16)
        except Exception as e:
            details["blake2s_2e16"] = {"error": repr(e)}

    with open("bench_details.json", "w") as fh:
        json.dump(details, fh, indent=2)

    print(json.dumps({
        "metric": "mimc_stark_prove_2e13_speedup",
        "value": round(speedup, 3),
        "unit": "x_vs_cpu_reference",
        "vs_baseline": round(speedup / TARGET_SPEEDUP, 4),
    }))


if __name__ == "__main__":
    main()
