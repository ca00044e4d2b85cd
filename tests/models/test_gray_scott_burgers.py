"""Gray-Scott and Burgers models: stepper sanity + MGRIT convergence."""

import numpy as np
import jax.numpy as jnp
import pytest

from pymgrit_tpu import Mgrit
from pymgrit_tpu.models.gray_scott_2d import GrayScott2D
from pymgrit_tpu.models.burgers import Burgers1D, Burgers2D


def test_gray_scott_imex_vs_expl():
    """For small dt the IMEX and EXPL updates agree to O(dt^2)."""
    kw = dict(nx=32, t_start=0, t_stop=1.0, nt=11)
    imex = GrayScott2D(method='IMEX', **kw)
    expl = GrayScott2D(method='EXPL', **kw)
    s0 = jnp.asarray(imex.vector_t_start)
    dt = 1e-3
    a = np.asarray(imex.step(s0, 0.0, dt))
    b = np.asarray(expl.step(s0, 0.0, dt))
    assert np.abs(a - b).max() < 1e-4


def test_gray_scott_impl_matches_imex_small_dt():
    kw = dict(nx=24, t_start=0, t_stop=1.0, nt=11)
    impl = GrayScott2D(method='IMPL', **kw)
    imex = GrayScott2D(method='IMEX', **kw)
    s0 = jnp.asarray(impl.vector_t_start)
    dt = 1e-3
    a = np.asarray(impl.step(s0, 0.0, dt))
    b = np.asarray(imex.step(s0, 0.0, dt))
    assert np.abs(a - b).max() < 1e-5


def test_gray_scott_mgrit():
    def build(nt):
        return GrayScott2D(nx=24, method='IMEX', t_start=0, t_stop=20.0, nt=nt)

    g0 = build(33)
    g1 = GrayScott2D(nx=24, method='IMEX', t_interval=g0.t[::4])
    m = Mgrit(problem=[g0, g1], tol=1e-7, max_iter=10, logging_lvl=30)
    conv = m.solve()['conv']
    assert conv[-1] < 1e-7


def test_burgers1d_step_conservation():
    """BE Newton step: residual of the implicit equation is tiny."""
    app = Burgers1D(nx=64, nu=0.05, t_start=0, t_stop=1, nt=11)
    u0 = jnp.asarray(app.vector_t_start)
    dt = 0.05
    u1 = app.step(u0, 0.0, dt)
    D1 = jnp.asarray(app.D1)
    D2 = jnp.asarray(app.D2)
    res = u1 - u0 + dt * (u1 * (D1 @ u1) - app.nu * (D2 @ u1))
    assert float(jnp.abs(res).max()) < 1e-10


def test_burgers1d_mgrit():
    b0 = Burgers1D(nx=64, nu=0.05, t_start=0, t_stop=1, nt=33)
    b1 = Burgers1D(nx=64, nu=0.05, t_interval=b0.t[::4])
    m = Mgrit(problem=[b0, b1], tol=1e-8, max_iter=10, logging_lvl=30)
    conv = m.solve()['conv']
    assert conv[-1] < 1e-8


def test_burgers2d_step_residual():
    app = Burgers2D(nx=24, nu=0.05, t_start=0, t_stop=1, nt=11)
    s0 = jnp.asarray(app.vector_t_start)
    dt = 0.02
    s1 = app.step(s0, 0.0, dt)
    res = s1 - s0 + dt * (app._conv(s1) - app.nu * app._lap(s1))
    assert float(jnp.abs(res).max()) < 1e-8


@pytest.mark.slow   # 16 s; burgers1d keeps the family in core
def test_burgers2d_mgrit():
    b0 = Burgers2D(nx=16, nu=0.05, t_start=0, t_stop=0.5, nt=17)
    b1 = Burgers2D(nx=16, nu=0.05, t_interval=b0.t[::4])
    m = Mgrit(problem=[b0, b1], tol=1e-8, max_iter=10, logging_lvl=30)
    conv = m.solve()['conv']
    assert conv[-1] < 1e-8
