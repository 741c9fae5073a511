"""Pod runner: executes _fused_impl.py in a fresh interpreter (see
tests/_subproc.py for the XLA:CPU in-process compiler-state rationale)."""

from _subproc import run_pod


def test_fused_pod():
    run_pod("_fused_impl.py")
