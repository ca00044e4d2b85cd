"""The fully-compiled solve loop must match the host-driven loop."""

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu import Mgrit, Dahlquist, Heat1D, simple_setup_problem


def test_compiled_matches_host_loop():
    def build():
        return simple_setup_problem(problem=Dahlquist(t_start=0, t_stop=5, nt=101),
                                    level=2, coarsening=2)

    conv_host = Mgrit(problem=build(), tol=1e-10, logging_lvl=30).solve()['conv']
    conv_dev = Mgrit(problem=build(), tol=1e-10, logging_lvl=30).solve_compiled()['conv']
    assert len(conv_host) == len(conv_dev)
    np.testing.assert_allclose(conv_dev, conv_host, rtol=1e-10)


def test_compiled_jump_criterion():
    def build():
        return simple_setup_problem(problem=Dahlquist(t_start=0, t_stop=5, nt=101),
                                    level=2, coarsening=2)

    conv_host = Mgrit(problem=build(), tol=1e-10, conv_crit=1, logging_lvl=30).solve()['conv']
    conv_dev = Mgrit(problem=build(), tol=1e-10, conv_crit=1,
                     logging_lvl=30).solve_compiled()['conv']
    np.testing.assert_allclose(conv_dev, conv_host, rtol=1e-10)


def test_compiled_fcycle_heat():
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))

    def build():
        return [Heat1D(x_start=0, x_end=1, nx=129, a=1, rhs=rhs,
                       init_cond=lambda x: np.sin(np.pi * x),
                       t_start=0, t_stop=2, nt=nt) for nt in (65, 33, 17, 9, 5)]

    kw = dict(tol=1e-8, cf_iter=1, cycle_type='F', nested_iteration=False,
              max_iter=10, logging_lvl=30)
    conv_host = Mgrit(problem=build(), **kw).solve()['conv']
    conv_dev = Mgrit(problem=build(), **kw).solve_compiled()['conv']
    np.testing.assert_allclose(conv_dev, conv_host, rtol=1e-10)
