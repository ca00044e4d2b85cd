"""Stepper parity: our jittable steppers vs the reference implementations.

The reference package is importable here (numpy/scipy only, MPI satisfied by
the serial stub in tools/mpi4py_stub), so every model's step() is compared
directly against the reference's on the same inputs — much stronger than
golden histories alone.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "tools", "mpi4py_stub"))
sys.path.insert(0, "/root/reference/src")

rng = np.random.default_rng(42)


def test_dahlquist_methods():
    from pymgrit.dahlquist.dahlquist import Dahlquist as RefDahlquist
    from pymgrit_tpu import Dahlquist

    for method in ("BE", "FE", "TR", "MR"):
        ref = RefDahlquist(t_start=0, t_stop=5, nt=11, method=method)
        ours = Dahlquist(t_start=0, t_stop=5, nt=11, method=method)
        u0 = 0.731
        ref_v = ref.vector_template.clone_zero()
        ref_v.set_values(u0)
        r = ref.step(ref_v, 0.3, 0.8).get_values()
        o = ours.step(jnp.asarray(u0), 0.3, 0.8)
        assert abs(float(o) - r) < 1e-14, method


def test_heat_1d_step():
    from pymgrit.heat.heat_1d import Heat1D as RefHeat1D, VectorHeat1D
    from pymgrit_tpu import Heat1D

    def rhs_np(x, t):
        return -np.sin(np.pi * x) * (np.sin(t) - np.pi ** 2 * np.cos(t))

    def rhs_j(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - jnp.pi ** 2 * jnp.cos(t))

    ref = RefHeat1D(x_start=0, x_end=2, nx=65, a=1.3, rhs=rhs_np,
                    t_start=0, t_stop=2, nt=11)
    ours = Heat1D(x_start=0, x_end=2, nx=65, a=1.3, rhs=rhs_j,
                  t_start=0, t_stop=2, nt=11)
    u0 = rng.standard_normal(63)
    rv = VectorHeat1D(63)
    rv.set_values(u0.copy())
    r = ref.step(rv, 0.2, 0.45).get_values()
    o = np.asarray(ours.step(jnp.asarray(u0), 0.2, 0.45))
    np.testing.assert_allclose(o, r, atol=1e-11)


@pytest.mark.parametrize("method", ["BE", "CN", "FE"])
def test_heat_2d_step(method):
    from pymgrit.heat.heat_2d import Heat2D as RefHeat2D, VectorHeat2D
    from pymgrit_tpu import Heat2D

    def rhs_np(x, y, t):
        return 3 * x * y + t * (x + y)

    kw = dict(x_start=0, x_end=0.75, y_start=0, y_end=1.5, nx=21, ny=31, a=3.5,
              method=method, bc_left=1.25, bc_right=-0.5, bc_bottom=2.0, bc_top=0.75,
              t_start=0, t_stop=1, nt=11)
    ref = RefHeat2D(rhs=rhs_np, **kw)
    ours = Heat2D(rhs=rhs_np, **kw)

    u0 = rng.standard_normal((21, 31))
    rv = VectorHeat2D(21, 31)
    rv.set_values(u0.copy())
    r = ref.step(rv, 0.2, 0.3).get_values()
    o = np.asarray(ours.step(jnp.asarray(u0), 0.2, 0.3))
    np.testing.assert_allclose(o, r, atol=1e-10)

    # initial condition construction parity
    np.testing.assert_allclose(np.asarray(ours.vector_t_start),
                               ref.vector_t_start.get_values(), atol=1e-14)


def test_advection_step():
    from pymgrit.advection.advection_1d import Advection1D as RefAdv, VectorAdvection1D
    from pymgrit_tpu import Advection1D

    ref = RefAdv(c=1.0, x_start=-2, x_end=2, nx=65, t_start=0, t_stop=2, nt=11)
    ours = Advection1D(c=1.0, x_start=-2, x_end=2, nx=65, t_start=0, t_stop=2, nt=11)
    u0 = rng.standard_normal(64)
    rv = VectorAdvection1D(64)
    rv.set_values(u0.copy())
    r = ref.step(rv, 0.0, 0.23).get_values()
    o = np.asarray(ours.step(jnp.asarray(u0), 0.0, 0.23))
    np.testing.assert_allclose(o, r, atol=1e-11)
    np.testing.assert_allclose(np.asarray(ours.vector_t_start),
                               ref.vector_t_start.get_values(), atol=1e-14)


def test_brusselator_step():
    from pymgrit.brusselator.brusselator import Brusselator as RefBruss, VectorBrusselator
    from pymgrit_tpu import Brusselator

    ref = RefBruss(t_start=0, t_stop=12, nt=11)
    ours = Brusselator(t_start=0, t_stop=12, nt=11)
    u0 = np.array([0.5, 1.7])
    rv = VectorBrusselator()
    rv.set_values(u0.copy())
    r = ref.step(rv, 1.0, 1.4).get_values()
    o = np.asarray(ours.step(jnp.asarray(u0), 1.0, 1.4))
    np.testing.assert_allclose(o, r, atol=1e-13)


def test_arenstorf_step_vs_scipy():
    """Adaptive DOPRI45 vs scipy's RK45 (same pair, same controller): the
    per-interval integration should agree to well below the local tolerance
    (rtol=1e-3, atol=1e-6)."""
    from pymgrit.arenstorf_orbit.arenstorf_orbit import ArenstorfOrbit as RefAren, \
        VectorArenstorfOrbit
    from pymgrit_tpu import ArenstorfOrbit

    ref = RefAren(t_start=0, t_stop=17.0652165601579625588917206249, nt=10001)
    ours = ArenstorfOrbit(t_start=0, t_stop=17.0652165601579625588917206249, nt=10001)
    u0 = np.array([0.994, 0.0, 0.0, -2.00158510637908])
    rv = VectorArenstorfOrbit()
    rv.set_values(u0.copy())
    t0, t1 = 0.0, ref.t[100]
    r = ref.step(rv, t0, t1).get_values()
    o = np.asarray(ours.step(jnp.asarray(u0), t0, t1))
    np.testing.assert_allclose(o, r, rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("method", ["IMEX", "IMPL", "CN"])
def test_allen_cahn_step(method):
    from pymgrit.allen_cahn.allen_cahn import AllenCahn as RefAC, VectorAllenCahn2D
    from pymgrit_tpu import AllenCahn

    kw = dict(nx=32, eps=0.04, radius=0.25, method=method, t_start=0, t_stop=0.032, nt=9)
    ref = RefAC(**kw)
    ours = AllenCahn(**kw)

    np.testing.assert_allclose(np.asarray(ours.vector_t_start),
                               ref.vector_t_start.get_values(), atol=1e-12)

    u0 = ref.vector_t_start.get_values() + 0.01 * rng.standard_normal((32, 32))
    rv = VectorAllenCahn2D(32, 32)
    rv.set_values(u0.copy())
    r = ref.step(rv, 0.0, 0.004).get_values()
    o = np.asarray(ours.step(jnp.asarray(u0), 0.0, 0.004))
    np.testing.assert_allclose(o, r, atol=5e-9)


def test_heat_1d_bdf_steps():
    from pymgrit.heat.heat_1d_2pts_bdf1 import Heat1DBDF1 as RefBDF1
    from pymgrit.heat.heat_1d_2pts_bdf2 import Heat1DBDF2 as RefBDF2
    from pymgrit.heat.vector_heat_1d_2pts import VectorHeat1D2Pts
    from pymgrit_tpu import Heat1DBDF1, Heat1DBDF2, PairState

    def rhs_np(x, t):
        return -np.sin(np.pi * x) * (np.sin(t) - np.pi ** 2 * np.cos(t))

    def rhs_j(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - jnp.pi ** 2 * jnp.cos(t))

    def ic(x):
        return np.sin(np.pi * x)

    t = np.linspace(0, 2, 33)
    dtau = (t[1] - t[0]) / 2
    for RefCls, OurCls in ((RefBDF1, Heat1DBDF1), (RefBDF2, Heat1DBDF2)):
        ref = RefCls(x_start=0, x_end=2, nx=17, a=1.0, dtau=dtau, rhs=rhs_np,
                     init_cond=ic, t_interval=t[::2])
        ours = OurCls(x_start=0, x_end=2, nx=17, a=1.0, dtau=dtau, rhs=rhs_j,
                      init_cond=ic, t_interval=t[::2])
        # IC bootstrap parity
        rf, rs, _ = ref.vector_t_start.get_values()
        np.testing.assert_allclose(np.asarray(ours.vector_t_start["first"]), rf, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours.vector_t_start["second"]), rs, atol=1e-12)

        first = rng.standard_normal(15)
        second = rng.standard_normal(15)
        rv = VectorHeat1D2Pts(15, dtau)
        rv.set_values(first.copy(), second.copy(), dtau)
        rout = ref.step(rv, t[0], t[2])
        oout = ours.step(PairState(first, second), t[0], t[2])
        rf, rs, _ = rout.get_values()
        np.testing.assert_allclose(np.asarray(oout["first"]), rf, atol=1e-11)
        np.testing.assert_allclose(np.asarray(oout["second"]), rs, atol=1e-11)


def test_heat_2d_callable_bcs():
    """Callable per-edge Dirichlet data (reference heat_2d.py:204-231)."""
    from pymgrit.heat.heat_2d import Heat2D as RefHeat2D, VectorHeat2D
    from pymgrit_tpu import Heat2D

    kw = dict(x_start=0, x_end=1, y_start=0, y_end=2, nx=13, ny=17, a=2.0,
              method='BE',
              bc_left=lambda x: np.sin(x), bc_right=lambda x: x ** 2,
              bc_bottom=lambda y: 1 + y, bc_top=lambda y: np.cos(y),
              t_start=0, t_stop=1, nt=5)
    ref = RefHeat2D(**kw)
    ours = Heat2D(**kw)
    np.testing.assert_allclose(np.asarray(ours.vector_t_start),
                               ref.vector_t_start.get_values(), atol=1e-14)
    u0 = rng.standard_normal((13, 17))
    rv = VectorHeat2D(13, 17)
    rv.set_values(u0.copy())
    r = ref.step(rv, 0.1, 0.35).get_values()
    o = np.asarray(ours.step(jnp.asarray(u0), 0.1, 0.35))
    np.testing.assert_allclose(o, r, atol=1e-10)


def test_dahlquist_custom_lambda():
    from pymgrit.dahlquist.dahlquist import Dahlquist as RefDahlquist
    from pymgrit_tpu import Dahlquist

    for method in ("BE", "FE", "TR"):
        ref = RefDahlquist(constant_lambda=-2.5, method=method, t_start=0, t_stop=5, nt=11)
        ours = Dahlquist(constant_lambda=-2.5, method=method, t_start=0, t_stop=5, nt=11)
        rv = ref.vector_template.clone_zero()
        rv.set_values(0.4)
        r = ref.step(rv, 0.0, 0.5).get_values()
        o = float(ours.step(jnp.asarray(0.4), 0.0, 0.5))
        assert abs(o - r) < 1e-14
