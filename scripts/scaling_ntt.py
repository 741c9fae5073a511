"""Scaling-efficiency harness for the sharded four-step NTT.

SURVEY §8 hard part #3 / BASELINE.md row "NTT scaling efficiency":
runs `fourstep_ntt_shmap` at 1/2/4/8 devices on a virtual CPU mesh
(each device count in a fresh interpreter — the forced host-device
count is fixed at backend init), times the jitted program, accounts the
collective bytes analytically (the schedule is explicit: exactly 3
all-to-alls, each moving N*64B*(s-1)/s across devices), and writes the
efficiency curve to SCALING.json.

A CPU mesh measures the SCHEDULE (local compute shrinks as 1/s, fixed
collective count), not ICI: virtual-device collectives are memcpys, so
the curve here is an upper bound on software overhead, while the ICI
roofline column states the modeled wire time on a real v5p slice
(ICI ~ 100 GB/s/link bidirectional).

Run: python scripts/scaling_ntt.py [log2_n] (default 16)
"""

import json
import os
import subprocess
import sys
import time

LOG2N_DEFAULT = 16
ICI_BYTES_PER_S = 100e9


def child(n_devices: int, log2n: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{n_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from starks_tpu.ops import limbs as fl
    from starks_tpu.parallel import ntt4step
    from starks_tpu.parallel.mesh import make_mesh

    n = 1 << log2n
    g = pow(7, (fl.MODULUS - 1) // n, fl.MODULUS)
    mesh = make_mesh(n_shard=n_devices)
    plan = ntt4step.get_plan(n, g, mesh)
    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.integers(0, 2 ** 16, (n, 16), dtype=np.uint32))

    out = ntt4step.fourstep_ntt_shmap(vals, plan)       # compile
    out.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        ntt4step.fourstep_ntt_shmap(vals, plan).block_until_ready()
        best = min(best, time.time() - t0)
    print(json.dumps({"devices": n_devices, "time_s": best}))


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else LOG2N_DEFAULT
    rows = []
    for d in (1, 2, 4, 8):
        env = dict(os.environ, STARKS_SCALING_CHILD=str(d))
        r = subprocess.run(
            [sys.executable, __file__, str(log2n), f"--child={d}"],
            capture_output=True, text=True, timeout=3600, env=env)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")][-1]
        rows.append(json.loads(line))
        print(line, flush=True)

    n = 1 << log2n
    t1 = rows[0]["time_s"]
    report = {"n_points": n, "rows": []}
    for row in rows:
        s = row["devices"]
        eff = t1 / (s * row["time_s"]) if s > 1 else 1.0
        a2a_bytes = 0 if s == 1 else 3 * n * 64 * (s - 1) // s
        report["rows"].append({
            "devices": s,
            "time_s": row["time_s"],
            "speedup": t1 / row["time_s"],
            "efficiency": eff,
            "collective_count": 0 if s == 1 else 3,
            "collective_bytes_total": a2a_bytes,
            "ici_wire_time_model_s": a2a_bytes / ICI_BYTES_PER_S,
        })
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    if any(a.startswith("--child=") for a in sys.argv):
        d = int([a for a in sys.argv if a.startswith("--child=")][0]
                .split("=")[1])
        child(d, int(sys.argv[1]))
    else:
        main()
