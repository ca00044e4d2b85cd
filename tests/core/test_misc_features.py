"""Output hooks, local convergence criteria, random init, t_norms, plots."""

import os

import numpy as np
import pytest

from pymgrit_tpu import Mgrit, Dahlquist, simple_setup_problem
from pymgrit_tpu.utils.plots import MgritWithPlots


def _problem():
    return simple_setup_problem(problem=Dahlquist(t_start=0, t_stop=5, nt=101),
                                level=2, coarsening=2)


def test_output_fcn_levels():
    calls = []

    def output_fcn(solver):
        calls.append(solver.solve_iter)

    # output_lvl=2: called after setup + each iteration (reference
    # mgrit.py:242-243, 625-626)
    m = Mgrit(problem=_problem(), tol=1e-10, output_fcn=output_fcn, output_lvl=2,
              logging_lvl=30)
    m.solve()
    assert len(calls) == 1 + 5

    calls.clear()
    m = Mgrit(problem=_problem(), tol=1e-10, output_fcn=output_fcn, output_lvl=1,
              logging_lvl=30)
    m.solve()
    assert len(calls) == 1

    calls.clear()
    m = Mgrit(problem=_problem(), tol=1e-10, output_fcn=output_fcn, output_lvl=0,
              logging_lvl=30)
    m.solve()
    assert calls == []


def test_jump_criterion():
    """conv_crit=1 (global jump) converges on the README problem."""
    m = Mgrit(problem=_problem(), tol=1e-10, conv_crit=1, logging_lvl=30)
    conv = m.solve()['conv']
    assert conv[-1] < 1e-10
    assert len(conv) <= 7


def test_local_criteria():
    """conv_crit=2/3 stop when every C-point is below tol (reference
    mgrit.py:447-448 semantics, SPMD-reduced)."""
    for crit in (2, 3):
        m = Mgrit(problem=_problem(), tol=1e-9, conv_crit=crit, logging_lvl=30)
        conv = m.solve()['conv']
        assert len(conv) <= 8


def test_random_init_guess():
    m = Mgrit(problem=_problem(), tol=1e-10, random_init_guess=True,
              nested_iteration=False, logging_lvl=30)
    conv = m.solve()['conv']
    assert conv[-1] < 1e-10


def test_t_norms():
    for t_norm in (1, 2, 3):
        m = Mgrit(problem=_problem(), tol=1e-10, t_norm=t_norm, logging_lvl=30)
        conv = m.solve()['conv']
        assert conv[-1] < 1e-10


def test_plots(tmp_path):
    import matplotlib
    matplotlib.use('Agg')

    m = MgritWithPlots(problem=simple_setup_problem(
        problem=Dahlquist(t_start=0, t_stop=5, nt=101), level=3, coarsening=2),
        tol=1e-10, cycle_type='F', logging_lvl=30)
    m.solve()
    p1 = tmp_path / "conv.png"
    p2 = tmp_path / "dist.png"
    p3 = tmp_path / "cycle.png"
    m.plot_convergence(save_name=str(p1))
    m.plot_parallel_distribution(time_procs=4, save_name=str(p2))
    m.plot_cycle(iterations=1, save_name=str(p3))
    assert p1.exists() and p1.stat().st_size > 0
    assert p2.exists() and p2.stat().st_size > 0
    assert p3.exists() and p3.stat().st_size > 0


def test_solution_output():
    """The solved fine tube is the sequential solution at convergence."""
    import jax.numpy as jnp

    m = Mgrit(problem=_problem(), tol=1e-12, logging_lvl=30)
    m.solve()
    u = np.asarray(m.u[0])
    t = m.levels[0].t
    seq = [1.0]
    for i in range(1, len(t)):
        seq.append(seq[-1] / (1 - (t[i] - t[i - 1]) * -1))
    np.testing.assert_allclose(u, np.array(seq), atol=1e-10)
