"""Examples smoke subset — the in-suite slice of tools/run_examples.py
(the full sweep mirrors the reference's tests/mpi/test_examples.sh).

Runs the cheapest example scripts end to end in subprocesses; the rest are
covered by the runner (kept out of the default suite for runtime)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAST_EXAMPLES = [
    "example_dahlquist.py",
    "example_brusselator.py",
    "example_multilevel_structure.py",
    "example_parameters.py",
]


@pytest.mark.parametrize("name", FAST_EXAMPLES)
def test_example_runs(name):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
