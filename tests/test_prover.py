"""Pod runner: executes _prover_impl.py in a fresh interpreter (see
tests/_subproc.py for the XLA:CPU in-process compiler-state rationale)."""

from _subproc import run_pod


def test_prover_pod():
    run_pod("_prover_impl.py")
