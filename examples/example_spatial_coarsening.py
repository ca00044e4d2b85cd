"""Four-level MGRIT V-cycles for the 1D heat equation with additional
spatial coarsening on coarse levels.

Mirrors reference examples/example_spatial_coarsening.py: grid transfer with
full-weighting restriction and linear interpolation between levels 0-1 and
1-2, identity transfer between levels 2-3.
"""

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu import Heat1D, Mgrit, GridTransferCopy
from pymgrit_tpu.models.grid_transfer_heat import GridTransferHeat


def main():
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))

    def init_cond(x):
        return np.sin(np.pi * x)

    heat0 = Heat1D(x_start=0, x_end=2, nx=2 ** 4 + 1, a=1, rhs=rhs, init_cond=init_cond,
                   t_start=0, t_stop=2, nt=2 ** 7 + 1)
    heat1 = Heat1D(x_start=0, x_end=2, nx=2 ** 3 + 1, a=1, rhs=rhs, init_cond=init_cond,
                   t_interval=heat0.t[::2])
    heat2 = Heat1D(x_start=0, x_end=2, nx=2 ** 2 + 1, a=1, rhs=rhs, init_cond=init_cond,
                   t_interval=heat1.t[::2])
    heat3 = Heat1D(x_start=0, x_end=2, nx=2 ** 2 + 1, a=1, rhs=rhs, init_cond=init_cond,
                   t_interval=heat2.t[::2])

    problem = [heat0, heat1, heat2, heat3]
    transfer = [GridTransferHeat(), GridTransferHeat(), GridTransferCopy()]

    mgrit = Mgrit(problem=problem, transfer=transfer)
    return mgrit.solve()


if __name__ == '__main__':
    main()
