"""Brusselator nonlinear 2-component ODE system.

Parity target: reference src/pymgrit/brusselator/brusselator.py:86-132 —
x' = A + x^2 y - (B+1) x, y' = B x - x^2 y with A=1, B=3, ICs (0, 1),
classic RK4 stepper.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu.core.application import Application
from pymgrit_tpu.ops.runge_kutta import rk4_step


class Brusselator(Application):
    """Brusselator system with RK4 time integration."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.a = 1.0
        self.b = 3.0
        self.vector_template = np.zeros(2)
        self.vector_t_start = np.array([0.0, 1.0])

    def _f(self, t, y):
        return jnp.array([
            self.a + (y[0] ** 2) * y[1] - (self.b + 1) * y[0],
            self.b * y[0] - (y[0] ** 2) * y[1],
        ])

    def step(self, u_start, t_start, t_stop):
        return rk4_step(self._f, u_start, t_start, t_stop)
