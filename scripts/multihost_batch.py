"""Config-5 multi-host demo: DP batch proving across N real processes.

BASELINE.json config 5 ("64x 2^16 proofs across N>=2 hosts") scaled to
a CI-sized shape: this launcher spawns N child interpreters, each of
which calls `jax.distributed.initialize` against a shared coordinator
(the real multi-host bring-up path — the same call wires a v5p pod
slice over DCN), proves ITS contiguous slice of the claim batch with
the fused single-chip prover (`parallel.batch.local_slice` +
`prove_batch`), and ships only proof BYTES back (serialize.py wire
format — on a pod this is the host gather over DCN). The launcher
deserializes, checks slice disjointness/coverage, and verifies every
proof against the oracle-spec verifier.

Run: python scripts/multihost_batch.py [n_procs] [log2_steps] [n_claims]
Writes MULTIHOST.json at the repo root.
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONSTANTS = [(i ** 7) ^ 42 for i in range(16)]


def child(pid: int, n_procs: int, port: int, log2_steps: int,
          n_claims: int, outdir: str):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs, jax.process_count()
    assert jax.process_index() == pid

    from starks_tpu.parallel import batch as pbatch
    from starks_tpu import serialize as ser

    steps = 1 << log2_steps
    inputs = [3 + 2 * i for i in range(n_claims)]
    sl = pbatch.local_slice(len(inputs))           # uses process_index
    proofs = pbatch.prove_batch(inputs, steps, CONSTANTS)
    assert len(proofs) == sl.stop - sl.start

    # Only BYTES leave the process (the DCN gather analog).
    for j, proof in enumerate(proofs):
        with open(os.path.join(outdir, f"claim_{sl.start + j}.proof"),
                  "wb") as fh:
            fh.write(ser.serialize(proof))
    meta = {"process_id": pid, "slice": [sl.start, sl.stop],
            "n_local_devices": jax.local_device_count(),
            "n_global_devices": jax.device_count()}
    with open(os.path.join(outdir, f"proc_{pid}.json"), "w") as fh:
        json.dump(meta, fh)
    print(json.dumps(meta), flush=True)


def main(n_procs: int = 2, log2_steps: int = 6, n_claims: int = 4):
    outdir = os.path.join(REPO, ".multihost_out")
    os.makedirs(outdir, exist_ok=True)
    for f in os.listdir(outdir):
        os.remove(os.path.join(outdir, f))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, __file__, f"--child={pid}", str(n_procs),
         str(port), str(log2_steps), str(n_claims), outdir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(n_procs)]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out[-4000:])
            raise SystemExit(f"child {pid} failed rc={p.returncode}")
    wall = time.time() - t0

    # Gather + verify on the "launcher host".
    from starks_tpu import serialize as ser
    from oracle import stark as ostark
    from oracle.mimc import mimc as omimc

    steps = 1 << log2_steps
    inputs = [3 + 2 * i for i in range(n_claims)]
    slices = []
    for pid in range(n_procs):
        with open(os.path.join(outdir, f"proc_{pid}.json")) as fh:
            slices.append(json.load(fh)["slice"])
    covered = sorted(x for lo, hi in slices for x in range(lo, hi))
    assert covered == list(range(n_claims)), (slices, n_claims)
    for lo, hi in slices:
        for lo2, hi2 in slices:
            assert (lo, hi) == (lo2, hi2) or hi <= lo2 or hi2 <= lo

    ok = []
    for i, inp in enumerate(inputs):
        with open(os.path.join(outdir, f"claim_{i}.proof"), "rb") as fh:
            proof = ser.deserialize(fh.read())
        out = omimc(inp, steps, CONSTANTS)
        ok.append(bool(ostark.verify_mimc_proof(inp, steps, CONSTANTS,
                                                out, proof)))
    assert all(ok), ok

    report = {"n_processes": n_procs, "steps": steps,
              "n_claims": n_claims, "slices": slices,
              "all_verified": True, "wall_s": wall,
              "distributed_initialize": True}
    with open(os.path.join(REPO, "MULTIHOST.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1].startswith("--child="):
        child(int(sys.argv[1].split("=")[1]), int(sys.argv[2]),
              int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]),
              sys.argv[6])
    else:
        args = [int(a) for a in sys.argv[1:4]]
        main(*args)
