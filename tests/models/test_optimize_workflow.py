"""The geometry-optimization workflow example (reference
examples/optimize_geometry_im/optimization_workflow.py) on its surrogate
demo path: customized AT-MGRIT objective extraction plus the derivative-free
optimization loop."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "examples", "optimize_geometry_im"))

import optimization_workflow as ow  # noqa: E402


def test_surrogate_solve_reaches_steady_state():
    tr_arr, jl_arr, tr, jl = ow.run_mgrit_demo(rsl=0.0025, h2=0.012)
    # steady states of the surrogate at the loss-optimal geometry
    assert abs(tr - 19.0) < 1e-2
    assert abs(jl - 250.0) < 0.2
    assert len(tr_arr) == 2 ** 8 + 1 and len(jl_arr) == 2 ** 8 + 1
    # transient: early values below steady state
    assert tr_arr[1] < tr_arr[-1]


def test_objective_prefers_better_geometry():
    objx, evals = ow.make_objx("", "", t_stop=0.2, nt=0, demo=True)
    near = objx(np.array([0.0025, 0.012]))
    far = objx(np.array([0.0034, 0.008]))
    assert near < far  # lower = more efficient
    assert len(evals) == 2
    # efficiency bounded in (-1, 0)
    assert -1.0 < near < 0.0


@pytest.mark.slow
def test_full_demo_optimization_finds_interior_optimum():
    x, f = ow.main(["--demo"])
    assert abs(x[0] - 0.0025) < 3e-4
    assert abs(x[1] - 0.012) < 2e-3
    assert -f > 0.91
