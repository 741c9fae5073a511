"""Benchmark driver: full MiMC STARK proof generation vs the CPU reference.

Prints ONE JSON line:
  {"metric": "mimc_stark_prove_2e13_speedup", "value": <x faster than the
   measured single-thread CPU reference>, "unit": "x_vs_cpu_reference",
   "vs_baseline": <value / 100, i.e. fraction of the 100x target>}

Details (per-stage timings, proof size, NTT throughput, platform) go to
bench_details.json. The CPU reference numbers come from
scripts/measure_baseline.py -> baseline_cpu.json (measured on this
machine; see BASELINE.md).
"""

import json
import os
import sys
import threading
import time

STEPS = 2 ** 13
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

CPU_BASELINE_S = 4.7457   # measured: scripts/measure_baseline.py, this host
TARGET_SPEEDUP = 100.0


def _probe_device(timeout_s=180.0) -> bool:
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

    # Warmup: populates jit + persistent caches (compiles are one-time
    # costs, amortized across proofs in production).
    t0 = time.time()
    proof = tp.mk_mimc_proof(INP, STEPS, CONSTANTS)
    warm_s = time.time() - t0

    times = []
    for _ in range(2):
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
