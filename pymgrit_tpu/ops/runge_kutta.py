"""Runge-Kutta integrators (classic RK4 and adaptive Dormand-Prince 5(4)).

The reference integrates Arenstorf orbits with ``scipy.integrate.solve_ivp
(method='RK45')`` per MGRIT interval (reference:
src/pymgrit/arenstorf_orbit/arenstorf_orbit.py:111-117).  This module
re-implements the same Dormand-Prince 5(4) pair with scipy's step-size
controller semantics (safety 0.9, factor clamp [0.2, 10], RMS error norm
with scale = atol + rtol*max(|y0|,|y1|), Hairer initial-step selection) as a
pure-JAX ``lax.while_loop`` — jittable and vmappable over many time
intervals at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Dormand-Prince 5(4) tableau (same pair as scipy.integrate.RK45)
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = jnp.array([
    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    [1 / 5, 0.0, 0.0, 0.0, 0.0, 0.0],
    [3 / 40, 9 / 40, 0.0, 0.0, 0.0, 0.0],
    [44 / 45, -56 / 15, 32 / 9, 0.0, 0.0, 0.0],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0.0, 0.0],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656, 0.0],
])
_B = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84])
# Error weights: b5 - b4 including the FSAL k7 contribution
_E = jnp.array([71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200, 22 / 525, -1 / 40])

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ERR_EXP = -1.0 / 5.0  # error_estimator_order 4 -> exponent -1/(4+1)


def rk4_step(f, y, t0, t1):
    """One classic RK4 step (reference brusselator.py:105-132 tableau)."""
    dt = t1 - t0
    k1 = f(t0, y)
    k2 = f(t0 + dt / 2, y + dt / 2 * k1)
    k3 = f(t0 + dt / 2, y + dt / 2 * k2)
    k4 = f(t0 + dt, y + dt * k3)
    return y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def _initial_step(f, t0, y0, f0, rtol, atol):
    """Hairer's initial step selection (scipy _ivp/common.py semantics)."""
    scale = atol + jnp.abs(y0) * rtol
    d0 = _rms_norm(y0 / scale)
    d1 = _rms_norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = f(t0 + h0, y1)
    d2 = _rms_norm((f1 - f0) / scale) / h0
    h1 = jnp.where((d1 <= 1e-15) & (d2 <= 1e-15),
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / jnp.maximum(d1, d2)) ** 0.2)
    return jnp.minimum(100 * h0, h1)


def dopri45_integrate(f, y0, t0, t1, rtol=1e-3, atol=1e-6, max_steps=10_000):
    """Adaptively integrate y' = f(t, y) from t0 to t1 (t1 > t0).

    jittable/vmappable; semantics follow scipy.integrate.RK45.
    """
    f0 = f(t0, y0)
    h_init = jnp.minimum(_initial_step(f, t0, y0, f0, rtol, atol), t1 - t0)

    def one_attempt(t, y, fy, h):
        ks = [fy]
        for i in range(1, 6):
            dy = jnp.zeros_like(y)
            for j in range(i):
                dy = dy + _A[i, j] * ks[j]
            ks.append(f(t + _C[i] * h, y + h * dy))
        dy5 = jnp.zeros_like(y)
        for j in range(6):
            dy5 = dy5 + _B[j] * ks[j]
        y_new = y + h * dy5
        f_new = f(t + h, y_new)
        ks.append(f_new)
        err = jnp.zeros_like(y)
        for j in range(7):
            err = err + _E[j] * ks[j]
        err = err * h
        scale = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
        err_norm = _rms_norm(err / scale)
        return y_new, f_new, err_norm

    def cond(state):
        t, y, fy, h_abs, n, rejected = state
        return (t < t1) & (n < max_steps)

    def body(state):
        t, y, fy, h_abs, n, rejected = state
        h = jnp.minimum(h_abs, t1 - t)
        y_new, f_new, err_norm = one_attempt(t, y, fy, h)
        accept = err_norm < 1.0
        factor_acc = jnp.where(err_norm == 0.0, _MAX_FACTOR,
                               jnp.minimum(_MAX_FACTOR, _SAFETY * err_norm ** _ERR_EXP))
        factor_acc = jnp.where(rejected, jnp.minimum(1.0, factor_acc), factor_acc)
        factor_rej = jnp.maximum(_MIN_FACTOR, _SAFETY * err_norm ** _ERR_EXP)
        h_abs_new = jnp.where(accept, h_abs * factor_acc, h_abs * factor_rej)
        t_new = jnp.where(accept, t + h, t)
        y_out = jnp.where(accept, y_new, y)
        f_out = jnp.where(accept, f_new, fy)
        return (t_new, y_out, f_out, h_abs_new, n + 1, ~accept)

    state = (t0, y0, f0, h_init, jnp.array(0), jnp.array(False))
    t, y, fy, h_abs, n, rejected = jax.lax.while_loop(cond, body, state)
    return y
