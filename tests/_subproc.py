"""Subprocess pod runner for compile-heavy test files.

XLA:CPU's in-process compiler state is not reliable across many large
compiles in ONE interpreter: round-3 root-causing produced a
deterministic 2-file repro (tests/_air_impl.py then _fused_impl.py →
`Fatal Python error: Aborted` inside backend_compile_and_load on the
NEXT big compile; each file green in isolation; 128 GB free RAM, 256 MB
stacks, persistent cache disabled). Mirroring tests/test_parallel.py's
mesh isolation, each compile-heavy file runs its tests in a fresh
interpreter so one `pytest tests/` invocation is deterministic and
green end-to-end with full coverage.
"""

import os
import subprocess
import sys


def run_pod(impl_basename: str, timeout: int = 3600):
    impl = os.path.join(os.path.dirname(__file__), impl_basename)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", impl],
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, (
        f"{impl_basename} pod failed (rc={r.returncode})\n"
        f"--- stdout ---\n{r.stdout[-8000:]}\n"
        f"--- stderr ---\n{r.stderr[-4000:]}")
