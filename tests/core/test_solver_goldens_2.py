"""More golden parity tests: heat_2d, weighted Jacobi, spatial coarsening,
varying/non-uniform coarsening, AT-MGRIT, large-m hierarchies."""

import numpy as np
import jax.numpy as jnp
import pytest

from pymgrit_tpu import (Mgrit, AtMgrit, Dahlquist, Heat1D, Heat2D,
                         GridTransferCopy, simple_setup_problem)
from pymgrit_tpu.models.grid_transfer_heat import GridTransferHeat


def _heat1d_rhs(x, t):
    return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))


def _heat1d_ic(x):
    return np.sin(np.pi * x)


def test_heat2d_polynomial_exact():
    """heat_2d example: nx=55, ny=125, nt=33, 2-level V FCF converges in one
    iteration to roundoff (reference examples/example_heat_2d.py:63-70;
    golden tests/mpi/results/heat_2d: 5.372e-15)."""
    x_end, y_end, a = 0.75, 1.5, 3.5

    def rhs(x, y, t):
        return 5 * x * (x_end - x) * y * (y_end - y) + 10 * a * t * (y * (y_end - y) + x * (x_end - x))

    heat0 = Heat2D(x_start=0, x_end=x_end, y_start=0, y_end=y_end, nx=55, ny=125,
                   a=a, rhs=rhs, t_start=0, t_stop=1, nt=33)
    heat1 = Heat2D(x_start=0, x_end=x_end, y_start=0, y_end=y_end, nx=55, ny=125,
                   a=a, rhs=rhs, t_interval=heat0.t[::2])
    mgrit = Mgrit(problem=[heat0, heat1], cycle_type='V', logging_lvl=30)
    info = mgrit.solve()
    assert len(info['conv']) == 1
    assert info['conv'][0] < 1e-12

    # Solution accuracy vs exact polynomial solution 5*t*x*(xe-x)*y*(ye-y)
    t_final = heat0.t[-1]
    xx = heat0.x[:, None]
    yy = heat0.y[None, :]
    exact = 5 * t_final * xx * (x_end - xx) * yy * (y_end - yy)
    err = np.abs(np.asarray(mgrit.u[0])[-1] - exact).max()
    assert err < 1e-10


@pytest.mark.slow   # 26 s golden; weight_c stays core via test_condensed kw3
def test_weighted_jacobi():
    """weight_c=1.3 saves one iteration: 8 iters (w=1.0) vs 7 (w=1.3)
    (reference examples/example_weighted_jacobi.py:55-60; golden
    tests/mpi/results/weighted_jacobi)."""
    def build():
        return [Heat1D(x_start=0, x_end=1, nx=1001, a=1, init_cond=_heat1d_ic,
                       rhs=_heat1d_rhs, t_start=0, t_stop=2, nt=nt)
                for nt in (65, 33, 17, 9, 5)]

    m1 = Mgrit(problem=build(), tol=1e-8, cf_iter=1, cycle_type='F',
               nested_iteration=False, max_iter=10, logging_lvl=30)
    conv1 = m1.solve()['conv']
    expected1 = np.array([1.674e0, 8.233e-2, 4.141e-3, 2.080e-4, 1.024e-5,
                          4.841e-7, 2.134e-8, 8.402e-10])
    assert len(conv1) == 8
    assert np.allclose(conv1, expected1, rtol=2e-3)

    m2 = Mgrit(problem=build(), weight_c=1.3, tol=1e-8, cf_iter=1, cycle_type='F',
               nested_iteration=False, max_iter=10, logging_lvl=30)
    conv2 = m2.solve()['conv']
    expected2 = np.array([1.3795, 5.379e-2, 2.144e-3, 8.411e-5, 3.136e-6,
                          1.058e-7, 2.969e-9])
    assert len(conv2) == 7
    assert np.allclose(conv2, expected2, rtol=2e-3)


def test_spatial_coarsening():
    """4-level heat_1d with spatial coarsening on the first two level pairs:
    7 iterations (reference examples/example_spatial_coarsening.py; golden
    tests/mpi/results/spatial_coarsening)."""
    heat0 = Heat1D(x_start=0, x_end=2, nx=2 ** 4 + 1, a=1, rhs=_heat1d_rhs,
                   init_cond=_heat1d_ic, t_start=0, t_stop=2, nt=2 ** 7 + 1)
    heat1 = Heat1D(x_start=0, x_end=2, nx=2 ** 3 + 1, a=1, rhs=_heat1d_rhs,
                   init_cond=_heat1d_ic, t_interval=heat0.t[::2])
    heat2 = Heat1D(x_start=0, x_end=2, nx=2 ** 2 + 1, a=1, rhs=_heat1d_rhs,
                   init_cond=_heat1d_ic, t_interval=heat1.t[::2])
    heat3 = Heat1D(x_start=0, x_end=2, nx=2 ** 2 + 1, a=1, rhs=_heat1d_rhs,
                   init_cond=_heat1d_ic, t_interval=heat2.t[::2])
    transfer = [GridTransferHeat(), GridTransferHeat(), GridTransferCopy()]
    mgrit = Mgrit(problem=[heat0, heat1, heat2, heat3], transfer=transfer, logging_lvl=30)
    conv = mgrit.solve()['conv']
    expected = np.array([3.3795e-2, 2.9794e-3, 3.2555e-4, 4.0429e-5, 4.9316e-6,
                         6.1785e-7, 7.7088e-8])
    assert len(conv) == 7
    assert np.allclose(conv, expected, rtol=2e-3)


def test_varying_coarsening():
    """Non-uniform coarsening via fancy indexing: 6 iterations (reference
    tests/mpi/varying_coarsening.py:12-20; golden
    tests/mpi/results/varying_coarsening)."""
    d0 = Dahlquist(t_start=0, t_stop=5, nt=65)
    d1 = Dahlquist(t_interval=d0.t[[0, 3, 10, 12, 14, 17, 23, 27, 33, 34, 55, 57, 59, 61, 63, 64]])
    d2 = Dahlquist(t_interval=d1.t[::2])
    d3 = Dahlquist(t_interval=d2.t[::2])
    d4 = Dahlquist(t_interval=d3.t[::2])
    mgrit = Mgrit(problem=[d0, d1, d2, d3, d4], tol=1e-10, nested_iteration=False,
                  logging_lvl=30)
    conv = mgrit.solve()['conv']
    expected = np.array([3.7312e-2, 3.1242e-3, 3.1292e-5, 1.8515e-7, 4.9959e-10, 4.8216e-13])
    assert len(conv) == 6
    assert np.allclose(conv, expected, rtol=2e-3)


def test_large_coarsening_factor():
    """5-level hierarchy with m=16 on the first pair: 4 iterations
    (reference tests/mpi/procs_without_points.py:10-19; golden
    tests/mpi/results/procs_without_points)."""
    d0 = Dahlquist(t_start=0, t_stop=5, nt=129)
    d1 = Dahlquist(t_interval=d0.t[::16])
    d2 = Dahlquist(t_interval=d1.t[::2])
    d3 = Dahlquist(t_interval=d2.t[::2])
    d4 = Dahlquist(t_interval=d3.t[::2])
    mgrit = Mgrit(problem=[d0, d1, d2, d3, d4], tol=1e-10, logging_lvl=30)
    conv = mgrit.solve()['conv']
    expected = np.array([7.6931e-3, 5.0699e-4, 1.2469e-5, 1.7860e-17])
    assert len(conv) == 4
    assert np.allclose(conv[:3], expected[:3], rtol=2e-3)
    assert conv[3] < 1e-12


def test_at_mgrit_golden():
    """AT-MGRIT 3-level heat_1d with k=2, 2 iterations: [0.1767778,
    0.01223507] (reference tests/core/test_at_mgrit.py:33-44)."""
    heat0 = Heat1D(x_start=0, x_end=2, nx=5, a=1, rhs=_heat1d_rhs,
                   init_cond=_heat1d_ic, t_start=0, t_stop=2, nt=65)
    heat1 = Heat1D(x_start=0, x_end=2, nx=5, a=1, rhs=_heat1d_rhs,
                   init_cond=_heat1d_ic, t_start=0, t_stop=2, nt=17)
    heat2 = Heat1D(x_start=0, x_end=2, nx=5, a=1, rhs=_heat1d_rhs,
                   init_cond=_heat1d_ic, t_start=0, t_stop=2, nt=5)
    mgrit = AtMgrit(k=2, problem=[heat0, heat1, heat2], cf_iter=1,
                    nested_iteration=False, max_iter=2, random_init_guess=False,
                    logging_lvl=30)
    conv = mgrit.solve()['conv']
    expected = np.array([0.1767778, 0.01223507])
    assert np.allclose(conv, expected, rtol=1e-3)


def test_custom_convergence_criterion():
    """Subclassed convergence criterion (reference
    examples/example_convergence_criterion.py): relative jump at C-points."""
    class MgritCustomized(Mgrit):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.last_it = np.zeros((len(self.levels[0].cpts),) +
                                    np.asarray(self.u[0]).shape[1:])
            self.convergence_criterion(iteration=0)

        def convergence_criterion(self, iteration):
            cpts = self.levels[0].cpts
            new = np.asarray(self.u[0])[cpts]
            tmp = 100 * np.max(
                np.abs(np.abs(np.divide((new - self.last_it), new,
                                        out=np.zeros_like(self.last_it),
                                        where=new != 0))))
            self.conv[iteration] = tmp
            self.last_it = np.copy(new)

    d0 = Dahlquist(t_start=0, t_stop=5, nt=101)
    d1 = Dahlquist(t_interval=d0.t[::2])
    mgrit = MgritCustomized(problem=[d0, d1], tol=1, logging_lvl=30)
    conv = mgrit.solve()['conv']
    # Stops when max relative change at C-points < 1%
    assert conv[-1] < 1.0
    assert len(conv) <= 4
