"""AT-MGRIT iteration count as a function of the truncation distance k
(mirrors reference examples/at_mgrit/runme_heat1d_m_k.py): 2-level
F-relaxation AT-MGRIT on 1D heat, sweeping k for one coarsening factor.

The reference sweeps k on a cluster and saves .npy result files; here each
run is one compiled device-resident solve, so the sweep runs inline.
"""

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu import AtMgrit, Heat1D

NT = 2 ** 10   # reference uses 2**14 with m in {64, 128, 256}
M = 32
KS = range(2, 33, 6)


def build():
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))

    heat0 = Heat1D(x_start=0, x_end=3, nx=513, a=1,
                   init_cond=lambda x: np.sin(np.pi * x), rhs=rhs,
                   t_start=0, t_stop=np.pi, nt=NT)
    heat1 = Heat1D(x_start=0, x_end=3, nx=513, a=1,
                   init_cond=lambda x: np.sin(np.pi * x), rhs=rhs,
                   t_interval=heat0.t[::M])
    return [heat0, heat1]


def main():
    results = {}
    for k in KS:
        solver = AtMgrit(k=k, problem=build(), random_init_guess=True,
                         nested_iteration=False, tol=1e-07, cf_iter=0,
                         logging_lvl=30)
        info = solver.solve()
        results[k] = len(info['conv'])
        print(f"k={k:3d}: {results[k]} iterations "
              f"(final residual {info['conv'][-1]:.3e})")
    return results


if __name__ == '__main__':
    main()
