"""Phase profiling, profiler traces, checkpoint/resume."""

import os

import numpy as np

from pymgrit_tpu import Mgrit, Dahlquist, simple_setup_problem


def _mgrit(**kw):
    return Mgrit(problem=simple_setup_problem(
        problem=Dahlquist(t_start=0, t_stop=5, nt=101), level=3, coarsening=2),
        logging_lvl=30, **kw)


def test_profile_phases():
    m = _mgrit(tol=1e-10)
    res = m.profile_phases(repeats=2)
    assert "f_relax[0]" in res and "full_iteration" in res
    assert all(v >= 0 for v in res.values())


def test_checkpoint_resume(tmp_path):
    m = _mgrit(tol=1e-10, max_iter=3)
    m.solve()
    path = str(tmp_path / "ckpt.npz")
    m.save_checkpoint(path)

    m2 = _mgrit(tol=1e-10, max_iter=3)
    m2.load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(m2.u[0]), np.asarray(m.u[0]), atol=0)
    np.testing.assert_allclose(m2.conv, m.conv)

    # resuming continues convergence
    m2.iter_max = 10
    m2.conv = np.zeros(11)
    conv = m2.solve()['conv']
    assert conv[-1] < 1e-10


def test_solve_profiled(tmp_path):
    m = _mgrit(tol=1e-8)
    info = m.solve_profiled(str(tmp_path / "trace"))
    assert info['conv'][-1] < 1e-8
    assert os.path.isdir(str(tmp_path / "trace"))
