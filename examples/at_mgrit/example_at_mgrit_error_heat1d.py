"""Error study of AT-MGRIT's truncation distance k on 1D heat (mirrors
reference examples/at_mgrit/runme_error_heat1d.py): compare the final
space-time error of 2-level F-relaxation AT-MGRIT at several k against
sequential time stepping and the analytical solution.

All AT-MGRIT runs share one jitted solver program per k; the time-stepping
baseline is a single lax.scan over the fine grid.  Run with
``PYMGRIT_TPU_PLOT=1`` to write the error plot.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from pymgrit_tpu import AtMgrit, Heat1D

NT = 2 ** 12          # reference uses 2**14; scaled for a quick demo run
M = 64                # coarsening (reference: 128)
KS = (8, 12, 16, 64)  # truncation distances (reference: 8, 12, 16, 128)


def build():
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))

    heat0 = Heat1D(x_start=0, x_end=3, nx=1025, a=1,
                   init_cond=lambda x: np.sin(np.pi * x), rhs=rhs,
                   t_start=0, t_stop=np.pi, nt=NT)
    heat1 = Heat1D(x_start=0, x_end=3, nx=1025, a=1,
                   init_cond=lambda x: np.sin(np.pi * x), rhs=rhs,
                   t_interval=heat0.t[::M])
    return heat0, heat1


def time_stepping_solution(heat0):
    """Sequential fine-grid solve as one compiled scan (the reference's
    per-point python loop, runme_error_heat1d.py:18-24)."""
    t = jnp.asarray(heat0.t)

    def body(u, ts):
        u = heat0.step(u, ts[0], ts[1])
        return u, u

    _, tail = jax.lax.scan(body, jnp.asarray(heat0.vector_t_start),
                           jnp.stack([t[:-1], t[1:]], axis=1))
    return np.concatenate([np.asarray(heat0.vector_t_start)[None],
                           np.asarray(tail)], axis=0)


def analytical_solution(heat0):
    x = np.linspace(0, 3, 1025)[1:-1]
    return np.sin(np.pi * x)[None, :] * np.cos(heat0.t)[:, None]


def main():
    heat0, heat1 = build()
    sol_exact = analytical_solution(heat0)
    sol_ts = time_stepping_solution(heat0)

    errors = {}
    for k in KS:
        solver = AtMgrit(k=k, problem=build(), random_init_guess=True,
                         nested_iteration=False, tol=1e-07, cf_iter=0,
                         logging_lvl=30)
        solver.solve()
        sol = np.asarray(solver.u[0])
        errors[k] = np.max(np.abs(sol - sol_exact), axis=1)
        print(f"k={k:4d}: max error {errors[k].max():.3e}")
    err_ts = np.max(np.abs(sol_ts - sol_exact), axis=1)
    print(f"time-stepping: max error {err_ts.max():.3e}")

    if os.environ.get("PYMGRIT_TPU_PLOT"):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for k, e in errors.items():
            plt.plot(heat0.t, e, label=f"2-level, F, k={k}")
        plt.plot(heat0.t, err_ts, label="time-stepping", ls="--")
        plt.xlabel("time")
        plt.ylabel("L-infinity norm of error")
        plt.legend()
        plt.savefig("at_mgrit_heat_error.png", bbox_inches="tight")
    return errors


if __name__ == '__main__':
    main()
