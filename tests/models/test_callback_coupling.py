"""Black-box host-stepper coupling: a scipy sparse solver (the PETSc-style
external stack stand-in) driven from inside the jitted MGRIT solver."""

import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import spsolve

from pymgrit_tpu import Mgrit, Heat1D
from pymgrit_tpu.coupling import CallbackApplication


def _make_heat_host_app(nx, nt, t_stop=2.0):
    """1D heat BE stepper implemented entirely with scipy on the host."""
    x = np.linspace(0, 2, nx)[1:-1]
    n = nx - 2
    dx = x[1] - x[0]
    fac = 1.0 / dx ** 2
    L = sp.diags([2 * fac * np.ones(n), -fac * np.ones(n - 1), -fac * np.ones(n - 1)],
                 [0, -1, 1], format='csc')
    eye = sp.identity(n, format='csc')

    def host_step(u, t_start, t_stop):
        return spsolve((t_stop - t_start) * L + eye, u)

    return CallbackApplication(host_step=host_step,
                               vector_template=np.zeros(n),
                               vector_t_start=np.sin(np.pi * x),
                               t_start=0, t_stop=t_stop, nt=nt)


def test_callback_app_matches_native():
    """MGRIT over the host-callback stepper reproduces the native jittable
    stepper's residual history."""
    apps_cb = [_make_heat_host_app(33, nt) for nt in (33, 9, 3)]
    mgrit_cb = Mgrit(problem=apps_cb, max_iter=4, logging_lvl=30, tol=1e-9)
    conv_cb = mgrit_cb.solve()['conv']

    apps_native = [Heat1D(x_start=0, x_end=2, nx=33, a=1,
                          init_cond=lambda x: np.sin(np.pi * x),
                          t_start=0, t_stop=2, nt=nt) for nt in (33, 9, 3)]
    mgrit_nat = Mgrit(problem=apps_native, max_iter=4, logging_lvl=30, tol=1e-9)
    conv_nat = mgrit_nat.solve()['conv']

    assert len(conv_cb) == len(conv_nat)
    np.testing.assert_allclose(conv_cb, conv_nat, rtol=1e-6, atol=1e-14)


def test_callback_subprocess_stepper():
    """The GetDP pattern (induction_machine.py:96-195): the stepper shells
    out to an external process per step."""
    import subprocess
    import sys

    def host_step(u, t_start, t_stop):
        # External "solver": a subprocess computing u / (1 + dt), stdlib only
        code = ("import sys; dt, u = map(float, sys.stdin.read().split()); "
                "print(repr(u / (1 + dt)))")
        out = subprocess.run([sys.executable, "-S", "-c", code],
                             input=f"{t_stop - t_start} {float(u)}",
                             capture_output=True, text=True, check=True)
        return np.float64(out.stdout.strip())

    app0 = CallbackApplication(host_step=host_step, vector_template=np.zeros(1)[0],
                               vector_t_start=np.ones(1)[0], t_start=0, t_stop=5, nt=9)
    app1 = CallbackApplication(host_step=host_step, vector_template=np.zeros(1)[0],
                               vector_t_start=np.ones(1)[0], t_interval=app0.t[::2])
    m = Mgrit(problem=[app0, app1], tol=1e-10, max_iter=5, logging_lvl=30)
    m.solve()
    # The host stepper reproduces values bit-exactly, so the converged
    # residual is exactly 0.0 (hidden by the conv != 0 filter, a quirk
    # shared with reference mgrit.py:645) — assert on the solution instead.
    u = np.asarray(m.u[0])
    dt = app0.t[1] - app0.t[0]
    expected = (1.0 / (1.0 + dt)) ** np.arange(9)
    np.testing.assert_allclose(u, expected, atol=1e-12)
