"""Weighted C-relaxation: w=1.3 saves one iteration over w=1.0 on the
five-level heat_1d F-cycle (mirrors reference examples/example_weighted_jacobi.py)."""

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu import Heat1D, Mgrit


def main():
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))

    def init_cond(x):
        return np.sin(np.pi * x)

    def build():
        return [Heat1D(x_start=0, x_end=1, nx=1001, a=1, init_cond=init_cond,
                       rhs=rhs, t_start=0, t_stop=2, nt=nt)
                for nt in (65, 33, 17, 9, 5)]

    Mgrit(problem=build(), tol=1e-8, cf_iter=1, cycle_type='F',
          nested_iteration=False, max_iter=10).solve()

    Mgrit(problem=build(), weight_c=1.3, tol=1e-8, cf_iter=1, cycle_type='F',
          nested_iteration=False, max_iter=10).solve()


if __name__ == '__main__':
    main()
