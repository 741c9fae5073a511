"""Mesh/sharding tests, subprocess-isolated.

The real tests live in `_parallel_impl.py` (not collected directly) and
run here under a FRESH interpreter: XLA's forced-8-device CPU platform
deterministically segfaults when these mesh tests execute after the rest
of the suite has built many executables in the same process (observed in
round 1: SIGSEGV at 84/102 tests, every file green in isolation). A
subprocess gives the mesh its own clean XLA runtime, so one
`pytest tests/` invocation is green end-to-end while keeping full
coverage of the sharded four-step NTT / sharded-prover transcript
identity / batch proving paths.
"""

import os
import subprocess
import sys


def test_parallel_suite_in_subprocess():
    impl = os.path.join(os.path.dirname(__file__), "_parallel_impl.py")
    env = dict(os.environ, STARKS_TPU_MESH_SUBPROC="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", impl],
        capture_output=True, text=True, timeout=3000, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, (
        f"mesh test subprocess failed (rc={r.returncode})\n"
        f"--- stdout ---\n{r.stdout[-8000:]}\n"
        f"--- stderr ---\n{r.stderr[-4000:]}")
