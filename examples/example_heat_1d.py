"""Five-level MGRIT F-cycles with FCF-relaxation for the 1D heat equation
(mirrors reference examples/example_heat_1d.py; exact solution
u(x,t) = sin(pi*x)*cos(t))."""

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu import Heat1D, Mgrit


def main():
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))

    def init_cond(x):
        return np.sin(np.pi * x)

    problem = [Heat1D(x_start=0, x_end=1, nx=1001, a=1, init_cond=init_cond,
                      rhs=rhs, t_start=0, t_stop=2, nt=nt)
               for nt in (65, 33, 17, 9, 5)]

    mgrit = Mgrit(problem=problem, cf_iter=1, cycle_type='F', nested_iteration=False,
                  max_iter=10, random_init_guess=False)
    return mgrit.solve()


if __name__ == '__main__':
    main()
