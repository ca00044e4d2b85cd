"""1D heat equation with homogeneous Dirichlet BCs.

Parity target: reference src/pymgrit/heat/heat_1d.py:131-217 — interior-point
grid (heat_1d.py:152-157), 3-point Laplacian, backward-Euler step
``u_i = (I + dt L)^-1 (u_{i-1} + dt b(x, t_i))`` (heat_1d.py:198-217).

TPU-native stepper: the sparse LU of the reference becomes a sine-eigenbasis
solve (two dense (nx,nx) matmuls on the MXU), exact to roundoff and batched
over all C-intervals by vmap.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu.core.application import Application
from pymgrit_tpu.ops.dirichlet_spectral import sine_eigenbasis, solve_shifted_1d


class Heat1D(Application):
    """u_t - a*u_xx = b(x,t) on [x_start, x_end], homogeneous Dirichlet BCs."""

    def __init__(self, x_start: float, x_end: float, nx: int, a: float,
                 init_cond: Callable = lambda x: x * 0, rhs: Callable = lambda x, t: x * 0,
                 precision: str = None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.x_start = x_start
        self.x_end = x_end
        x = np.linspace(x_start, x_end, nx)
        self.x = x[1:-1]                      # interior points only
        self.nx = nx - 2
        self.dx = self.x[1] - self.x[0]
        self.a = a
        self.rhs = rhs
        self.init_cond = init_cond

        fac = self.a / self.dx ** 2
        self.S, self.lam = sine_eigenbasis(self.nx, fac)
        self._x_j = self.x

        # precision='dd': state and spectral constants become double-double
        # float32 pairs (ops/dd.py); the eigenbasis matmuls dispatch to the
        # Ozaki MXU kernel (ops/ozaki.py), reaching fp64-class residual
        # floors on hardware without fp64.  The step body is unchanged.
        self._dd = precision == 'dd'
        if self._dd:
            from pymgrit_tpu.ops import dd
            self.S = dd.from_f64(self.S)
            self.lam = dd.from_f64(self.lam)
            self.vector_template = dd.from_f64(np.zeros(self.nx))
            self.vector_t_start = dd.from_f64(
                np.asarray(init_cond(self.x), dtype=np.float64))
        else:
            self.vector_template = np.zeros(self.nx)
            self.vector_t_start = np.asarray(init_cond(self.x), dtype=np.float64)

    def _rhs_at(self, t):
        """b(x, t) evaluated with jnp so traced t works.  User callables must
        be jnp-compatible (numpy ufuncs on jnp arrays trace fine).  In DD
        mode the callable sees the rounded f32 time value: the rhs samples
        are *data* of the discrete system — as long as they are consistent
        across levels (they are: same t grid), histories are unaffected —
        while all arithmetic around them stays DD."""
        from pymgrit_tpu.ops.dd import DD
        return self.rhs(self._x_j, t.to_float() if isinstance(t, DD) else t)

    def step(self, u_start, t_start, t_stop):
        dt = t_stop - t_start
        b = u_start + dt * self._rhs_at(t_stop)
        return solve_shifted_1d(self.S, self.lam, dt, b)
