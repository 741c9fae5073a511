"""Pod runner: executes _artifacts_impl.py in a fresh interpreter (see
tests/_subproc.py for the XLA:CPU in-process compiler-state rationale)."""

from _subproc import run_pod


def test_artifacts_pod():
    run_pod("_artifacts_impl.py")
