"""Pod runner: executes _air_impl.py in a fresh interpreter (see
tests/_subproc.py for the XLA:CPU in-process compiler-state rationale)."""

from _subproc import run_pod


def test_air_pod():
    run_pod("_air_impl.py")
