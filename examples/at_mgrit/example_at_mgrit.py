"""AT-MGRIT: truncated local coarse grids of distance k instead of the
sequential coarsest-level solve (mirrors reference
examples/at_mgrit/runme_heat1d_m_k.py, Hahne et al. distance-k algorithm)."""

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu import AtMgrit, Heat1D


def main():
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))

    heat_0 = Heat1D(x_start=0, x_end=3, nx=1025, a=1,
                    init_cond=lambda x: np.sin(np.pi * x), rhs=rhs,
                    t_start=0, t_stop=np.pi, nt=2 ** 12)
    heat_1 = Heat1D(x_start=0, x_end=3, nx=1025, a=1,
                    init_cond=lambda x: np.sin(np.pi * x), rhs=rhs,
                    t_interval=heat_0.t[::64])

    solver = AtMgrit(k=8, problem=[heat_0, heat_1], random_init_guess=True,
                     nested_iteration=False, tol=1e-07, cf_iter=0)
    return solver.solve()


if __name__ == '__main__':
    main()
