"""2D heat equation with Dirichlet BCs and BE/FE/CN integrators.

Parity target: reference src/pymgrit/heat/heat_2d.py:139-366 — state of shape
(nx, ny) *including* the boundary ring, 5-point Laplacian whose boundary rows
are zeroed (heat_2d.py:250-287), theta-method with theta in {0, 1/2, 1}
(heat_2d.py:194-202), constant-or-callable Dirichlet data per edge
(heat_2d.py:204-231), rhs assembly (compute_rhs, heat_2d.py:289-320).

TPU-native stepper: the implicit solve on the interior block is a two-sided
sine-eigenbasis solve — four dense matmuls (MXU) instead of a sparse LU —
with a boundary lift for the Dirichlet coupling.  Batched over C-points via
vmap, this is the framework's flagship benchmark problem (BASELINE.json:
heat_2d nt=4097).
"""

from __future__ import annotations

from typing import Callable, Union

import numpy as np
import jax
import jax.numpy as jnp

from pymgrit_tpu.core.application import Application
from pymgrit_tpu.ops.dirichlet_spectral import sine_eigenbasis


class Heat2D(Application):
    """u_t - a*(u_xx + u_yy) = b(x,y,t) with Dirichlet BCs."""

    def __init__(self, x_start: float, x_end: float, y_start: float, y_end: float,
                 nx: int, ny: int, a: float,
                 rhs: Callable = lambda x, y, t: 0 * x * y,
                 init_cond: Callable = lambda x, y: x * y * 0, method: str = 'BE',
                 bc_left: Union[int, float, Callable] = 0,
                 bc_right: Union[int, float, Callable] = 0,
                 bc_bottom: Union[int, float, Callable] = 0,
                 bc_top: Union[int, float, Callable] = 0,
                 precision: str = None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # precision='dd': double-double float32 state + Ozaki MXU spectral
        # solves (ops/dd.py, ops/ozaki.py) — fp64-class residual floors on
        # hardware without fp64.
        # (A fused Pallas variant of the batched spectral solve was built,
        # A/B'd on chip at n in {63,127,255} x batch in {64,512}, and
        # removed: it only beat XLA at small batches, never in the large-
        # batch relaxation sweeps MGRIT actually runs — docs/performance.md.)
        self._dd = precision == 'dd'
        self.x = np.linspace(x_start, x_end, nx)
        self.y = np.linspace(y_start, y_end, ny)
        self.x_2d = self.x[:, np.newaxis]
        self.y_2d = self.y[np.newaxis, :]
        self.nx = nx
        self.ny = ny
        self.dx = self.x[1] - self.x[0]
        self.dy = self.y[1] - self.y[0]
        self.a = a
        self.rhs = rhs

        if method == 'BE':
            self.theta = 1.0
        elif method == 'FE':
            self.theta = 0.0
        elif method == 'CN':
            self.theta = 0.5
        else:
            raise Exception("Unknown method. Choose BE (Backward Euler), FE (Forward Euler) or CN (Crank-Nicolson")

        def _bc_arr(bc, coords, name):
            if isinstance(bc, (float, int)):
                return np.full(len(coords), float(bc))
            if callable(bc):
                return np.asarray(bc(coords), dtype=np.float64) * np.ones(len(coords))
            raise Exception("Choose float, int or function for boundary condition " + name)

        # Edge conventions follow the reference exactly (heat_2d.py:243-248):
        # values[:, 0]=left(x), values[:, -1]=right(x), values[-1, :]=bottom(y),
        # values[0, :]=top(y).
        self.bc_left_arr = _bc_arr(bc_left, self.x, 'bc_left')
        self.bc_right_arr = _bc_arr(bc_right, self.x, 'bc_right')
        self.bc_bottom_arr = _bc_arr(bc_bottom, self.y, 'bc_bottom')
        self.bc_top_arr = _bc_arr(bc_top, self.y, 'bc_top')

        self.fx = a / self.dx ** 2
        self.fy = a / self.dy ** 2
        # Interior eigenbasis: axis 0 (x) couples with fx, axis 1 (y) with fy.
        self.Sx, self.lamx = sine_eigenbasis(nx - 2, self.fx)
        self.Sy, self.lamy = sine_eigenbasis(ny - 2, self.fy)

        self._xi = self.x_2d[1:-1]       # (nx-2, 1)
        self._yi = self.y_2d[:, 1:-1]    # (1, ny-2)

        # State axis 0 (x) may be sharded over the mesh 'space' axis.
        self.space_sharding_axis = 0

        self.vector_template = np.zeros((nx, ny))
        init = np.asarray(init_cond(self.x_2d, self.y_2d), dtype=np.float64) * np.ones((nx, ny))
        init[:, 0] = self.bc_left_arr
        init[:, -1] = self.bc_right_arr
        init[-1, :] = np.asarray(self.bc_bottom_arr)
        init[0, :] = np.asarray(self.bc_top_arr)
        self.vector_t_start = init

        if self._dd:
            from pymgrit_tpu.ops import dd
            self.Sx = dd.from_f64(self.Sx)
            self.Sy = dd.from_f64(self.Sy)
            self.lamx = dd.from_f64(self.lamx)
            self.lamy = dd.from_f64(self.lamy)
            self.vector_template = dd.from_f64(self.vector_template)
            self.vector_t_start = dd.from_f64(init)
            self._build_rhs_table()

    # ------------------------------------------------------------------

    def _zeros_like(self, u):
        if self._dd:
            from pymgrit_tpu.ops import dd
            return dd.zeros_like(u)
        return jnp.zeros_like(u)

    def _build_rhs_table(self):
        """Tabulate rhs over this level's grid times in ONE batched jitted
        evaluation.  DD correctness requirement: transcendentals in user rhs
        callables (jnp.sin(t), ...) round differently in vectorized vs
        scalar XLA contexts, de-synchronizing the solver phases and flooring
        the DD residual at ~|u|*eps_f32; a single evaluation context makes
        every phase consume bitwise-identical samples."""
        import jax
        shp = (self.nx - 2, self.ny - 2)
        ts = jnp.asarray(np.asarray(self.t, dtype=np.float32))
        tbl = jax.jit(jax.vmap(
            lambda tt: self.rhs(x=self._xi, y=self._yi, t=tt) *
            jnp.ones(shp, dtype=jnp.float32)))(ts)
        if bool(jax.jit(lambda a: jnp.all(a == a[0:1]))(tbl)):
            self._rhs_tbl, self._rhs_tbl_times = tbl[:1], ts[:1]
        else:
            self._rhs_tbl, self._rhs_tbl_times = tbl, ts

    def _rhs_at(self, t):
        """rhs(x, y, t) for a (possibly DD) time value; DD grid times hit
        the precomputed table (see _build_rhs_table)."""
        from pymgrit_tpu.ops.dd import DD
        if not isinstance(t, DD):
            return self.rhs(x=self._xi, y=self._yi, t=t)
        tv = t.to_float()
        idx = jnp.clip(jnp.searchsorted(self._rhs_tbl_times, tv),
                       0, self._rhs_tbl.shape[0] - 1)
        idx = jnp.where((idx > 0) &
                        (jnp.abs(self._rhs_tbl_times[idx - 1] - tv) <
                         jnp.abs(self._rhs_tbl_times[idx] - tv)),
                        idx - 1, idx)
        on_grid = self._rhs_tbl_times[idx] == tv
        if self._rhs_tbl.shape[0] == 1:
            on_grid = jnp.asarray(True)
        runtime = self.rhs(x=self._xi, y=self._yi, t=tv) * \
            jnp.ones((self.nx - 2, self.ny - 2), dtype=jnp.float32)
        return jnp.where(on_grid, self._rhs_tbl[idx], runtime)

    def _apply_L(self, u):
        """Apply the reference's zeroed-boundary-row 5-point operator
        (heat_2d.py:250-287): (L u) is zero on the boundary ring and the
        standard stencil on interior rows (using boundary neighbors)."""
        fx, fy = self.fx, self.fy
        interior = (2 * (fx + fy) * u[1:-1, 1:-1]
                    - fy * u[1:-1, :-2] - fy * u[1:-1, 2:]
                    - fx * u[:-2, 1:-1] - fx * u[2:, 1:-1])
        return self._zeros_like(u).at[1:-1, 1:-1].set(interior)

    def _set_bc(self, u):
        """Overwrite the boundary ring with the Dirichlet data."""
        u = u.at[:, 0].set(self.bc_left_arr)
        u = u.at[:, -1].set(self.bc_right_arr)
        u = u.at[-1, :].set(self.bc_bottom_arr)
        u = u.at[0, :].set(self.bc_top_arr)
        return u

    def _solve_interior(self, shift, b):
        """(I + shift*L_interior) x = b_int with boundary lift baked into b."""
        bh = self.Sx @ b @ self.Sy
        denom = 1.0 + shift * (self.lamx[:, None] + self.lamy[None, :])
        return self.Sx @ (bh / denom) @ self.Sy

    def step(self, u_start, t_start, t_stop):
        dt = t_stop - t_start
        if self.theta == 0.0:
            # FE (heat_2d.py:330-346).  Note the reference *adds* the BC data
            # onto the carried-over boundary values (new = bc_array + (I-dtL)u,
            # heat_2d.py:333-343) instead of overwriting — replicated here.
            bc_ring = self._set_bc(self._zeros_like(u_start))
            new = bc_ring + u_start - dt * self._apply_L(u_start)
            new = new.at[1:-1, 1:-1].add(dt * self._rhs_at(t_start))
            return new

        # Implicit rhs (compute_rhs, heat_2d.py:289-320)
        if self.theta == 1.0:
            b = self._zeros_like(u_start)
            b = b.at[1:-1, 1:-1].set(u_start[1:-1, 1:-1]
                                     + dt * self._rhs_at(t_stop))
        else:
            b = u_start - self.theta * dt * self._apply_L(u_start)
            b = b.at[1:-1, 1:-1].add(
                self.theta * dt * self._rhs_at(t_stop)
                + (1 - self.theta) * dt * self._rhs_at(t_start))
        b = self._set_bc(b)

        # Interior solve with Dirichlet boundary lift: the interior equations
        # couple to the (known) boundary values with -fx/-fy coefficients, so
        # move those terms to the rhs before diagonalizing.
        shift = dt * self.theta
        b_int = b[1:-1, 1:-1]
        b_int = b_int.at[:, 0].add(shift * self.fy * b[1:-1, 0])
        b_int = b_int.at[:, -1].add(shift * self.fy * b[1:-1, -1])
        b_int = b_int.at[0, :].add(shift * self.fx * b[0, 1:-1])
        b_int = b_int.at[-1, :].add(shift * self.fx * b[-1, 1:-1])
        new_int = self._solve_interior(shift, b_int)
        new = self._set_bc(self._zeros_like(u_start).at[1:-1, 1:-1].set(new_int))
        return new
