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
            self._build_rhs_table()
        else:
            self.vector_template = np.zeros(self.nx)
            self.vector_t_start = np.asarray(init_cond(self.x), dtype=np.float64)

    def _build_rhs_table(self):
        """Tabulate rhs(x, t) over this level's grid times in ONE batched
        jitted evaluation.  Needed for DD correctness: transcendentals like
        jnp.sin(t) round DIFFERENTLY in vectorized vs scalar XLA contexts
        (observed on CPU: f_relax's vmapped rhs vs forward_solve's scalar
        rhs differ by ~1 ulp), which de-synchronizes the solver phases and
        floors the DD residual at ~|u|*eps_f32.  A single evaluation context
        makes every phase consume bitwise-identical samples."""
        import jax
        ts = jnp.asarray(np.asarray(self.t, dtype=np.float32))
        tbl = jax.jit(jax.vmap(lambda tt: self.rhs(self._x_j, tt) *
                               jnp.ones(self.nx, dtype=jnp.float32)))(ts)
        if bool(jax.jit(lambda a: jnp.all(a == a[0:1]))(tbl)):
            # time-independent rhs: keep one slice (big-nt memory saver)
            self._rhs_tbl, self._rhs_tbl_times = tbl[:1], ts[:1]
        else:
            self._rhs_tbl, self._rhs_tbl_times = tbl, ts

    def _rhs_at(self, t):
        """b(x, t) evaluated with jnp so traced t works.  User callables must
        be jnp-compatible (numpy ufuncs on jnp arrays trace fine).  In DD
        mode, grid times hit the precomputed table (see _build_rhs_table);
        off-grid times fall back to a runtime evaluation."""
        from pymgrit_tpu.ops.dd import DD
        if not isinstance(t, DD):
            return self.rhs(self._x_j, t)
        tv = t.to_float()
        idx = jnp.clip(jnp.searchsorted(self._rhs_tbl_times, tv),
                       0, self._rhs_tbl.shape[0] - 1)
        idx = jnp.where((idx > 0) &
                        (jnp.abs(self._rhs_tbl_times[idx - 1] - tv) <
                         jnp.abs(self._rhs_tbl_times[idx] - tv)),
                        idx - 1, idx)
        on_grid = self._rhs_tbl_times[idx] == tv
        if self._rhs_tbl.shape[0] == 1:
            on_grid = jnp.asarray(True)   # time-independent rhs
        runtime = self.rhs(self._x_j, tv) * jnp.ones(self.nx, dtype=jnp.float32)
        return jnp.where(on_grid, self._rhs_tbl[idx], runtime)

    def step(self, u_start, t_start, t_stop):
        dt = t_stop - t_start
        b = u_start + dt * self._rhs_at(t_stop)
        return solve_shifted_1d(self.S, self.lam, dt, b)
