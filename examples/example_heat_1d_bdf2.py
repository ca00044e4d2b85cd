"""Multi-step methods inside one-step MGRIT: BDF2 on the fine level and BDF1
on the coarse level with two-points-per-vector pair states (mirrors
reference examples/example_heat_1d_bdf2.py)."""

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu import Heat1DBDF1, Heat1DBDF2, Mgrit


def main():
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))

    def init_cond(x):
        return np.sin(np.pi * x)

    t_start, t_stop, nt = 0, 2, 512
    dtau = t_stop / nt
    # Pair grid: one MGRIT point per two consecutive time points, each pair
    # associated with its first point's time value (reference
    # examples/example_heat_1d_bdf2.py:60-73)
    t_interval = np.linspace(t_start, t_stop, int(nt / 2 + 1))

    heat0 = Heat1DBDF2(x_start=0, x_end=1, nx=1001, a=1, dtau=dtau, rhs=rhs,
                       init_cond=init_cond, t_interval=t_interval)
    heat1 = Heat1DBDF1(x_start=0, x_end=1, nx=1001, a=1, dtau=dtau, rhs=rhs,
                       init_cond=init_cond, t_interval=t_interval[::2])
    heat2 = Heat1DBDF1(x_start=0, x_end=1, nx=1001, a=1, dtau=dtau, rhs=rhs,
                       init_cond=init_cond, t_interval=t_interval[::4])

    mgrit = Mgrit(problem=[heat0, heat1, heat2])
    return mgrit.solve()


if __name__ == '__main__':
    main()
