import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import starks_tpu.prover as tp
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
for i in range(6):
    t0 = time.time()
    proof = tp.mk_mimc_proof(3, 2**13, CONSTANTS)
    dt = time.time() - t0
    print(f"prove #{i}: {dt:.3f}s  stages: " + " ".join(
        f"{k}={v:.2f}" for k, v in tp.LAST_PROOF_TIMINGS.items() if v > 0.05))
