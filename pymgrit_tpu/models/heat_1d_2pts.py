"""1D heat equation with two-points-per-vector states (BDF1 / BDF2).

Parity target: reference src/pymgrit/heat/vector_heat_1d_2pts.py:17-140 (the
pair state), heat_1d_2pts_bdf1.py:33-117 (two BE sub-steps per MGRIT step)
and heat_1d_2pts_bdf2.py:35-138 (variable-step two-step BDF2 with a
trapezoidal bootstrap of the second IC value).

The pair state is a pytree dict {'first': (nx,), 'second': (nx,)}; the
intra-pair spacing dtau is *static* (an application attribute), matching the
reference where dtau rides along but never participates in the vector
algebra or the norm (vector_heat_1d_2pts.py:60-66: norm over both points,
dtau excluded).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu.core.application import Application
from pymgrit_tpu.ops.dirichlet_spectral import (sine_eigenbasis, solve_shifted_1d,
                                                solve_helmholtz_1d)


def PairState(first, second):
    """Two consecutive time values grouped as one state."""
    return {"first": first, "second": second}


class _HeatPairBase(Application):
    def __init__(self, x_start: float, x_end: float, nx: int, dtau: float, a: float,
                 init_cond: Callable = lambda x: x * 0,
                 rhs: Callable = lambda x, t: x * 0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        x = np.linspace(x_start, x_end, nx)
        self.x = x[1:-1]
        self.nx = nx - 2
        self.dx = self.x[1] - self.x[0]
        self.a = a
        self.dtau = dtau
        self.rhs = rhs
        self.init_cond = init_cond
        fac = a / self.dx ** 2
        self.S, self.lam = sine_eigenbasis(self.nx, fac)
        self._x_j = self.x
        self.vector_template = PairState(np.zeros(self.nx), np.zeros(self.nx))

    def _rhs_at(self, t):
        return self.rhs(self._x_j, t)


class Heat1DBDF1(_HeatPairBase):
    """Pairwise BDF1: two backward-Euler sub-steps per MGRIT step
    (reference heat_1d_2pts_bdf1.py:90-117)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        tmp1 = np.asarray(self.init_cond(self.x), dtype=np.float64)
        # One BDF1 step to get the value at t0 + dtau (bdf1.py:65-68)
        tmp2 = solve_shifted_1d(self.S, self.lam, self.dtau,
                                tmp1 + self._rhs_at(self.t[0] + self.dtau) * self.dtau)
        self.vector_t_start = PairState(tmp1, tmp2)

    def step(self, u_start, t_start, t_stop):
        second = u_start["second"]
        dt1 = t_stop - t_start - self.dtau
        tmp1 = solve_shifted_1d(self.S, self.lam, dt1,
                                second + self._rhs_at(t_stop) * dt1)
        tmp2 = solve_shifted_1d(self.S, self.lam, self.dtau,
                                tmp1 + self._rhs_at(t_stop + self.dtau) * self.dtau)
        return PairState(tmp1, tmp2)


class Heat1DBDF2(_HeatPairBase):
    """Pairwise variable-step BDF2 (reference heat_1d_2pts_bdf2.py:92-138):
    the solve is (L + coeff*I) x = rhs -> a Helmholtz sine-eigenbasis solve."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        tmp1 = np.asarray(self.init_cond(self.x), dtype=np.float64)
        # Trapezoidal bootstrap for the second IC value (bdf2.py:65-69)
        dtau = self.dtau
        lap_tmp1 = self.S @ ((self.S @ tmp1) * self.lam)
        b = tmp1 - (dtau / 2) * lap_tmp1 + (dtau / 2) * (
            self._rhs_at(self.t[0]) + self._rhs_at(self.t[0] + dtau))
        tmp2 = solve_shifted_1d(self.S, self.lam, dtau / 2, b)
        self.vector_t_start = PairState(tmp1, tmp2)

    def step(self, u_start, t_start, t_stop):
        first = u_start["first"]
        second = u_start["second"]
        dtau = self.dtau

        # Update at t_stop from (t_start, t_start + dtau)
        tau_i = t_stop - t_start - dtau
        tau_im1 = dtau
        r_i = tau_i / tau_im1
        coeffm2 = (r_i ** 2) / (tau_i * (1 + r_i))
        coeffm1 = (1 + r_i) / tau_i
        coeff = (1 + 2 * r_i) / (tau_i * (1 + r_i))
        rhs = self._rhs_at(t_stop) - coeffm2 * first + coeffm1 * second
        tmp1 = solve_helmholtz_1d(self.S, self.lam, coeff, rhs)

        # Update at t_stop + dtau from (t_start + dtau, t_stop)
        tau_im1 = tau_i
        tau_i = dtau
        r_i = tau_i / tau_im1
        coeffm2 = (r_i ** 2) / (tau_i * (1 + r_i))
        coeffm1 = (1 + r_i) / tau_i
        coeff = (1 + 2 * r_i) / (tau_i * (1 + r_i))
        rhs = self._rhs_at(t_stop + dtau) - coeffm2 * second + coeffm1 * tmp1
        tmp2 = solve_helmholtz_1d(self.S, self.lam, coeff, rhs)

        return PairState(tmp1, tmp2)
