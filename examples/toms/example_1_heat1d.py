"""TOMS paper, example 1: cycle-type / relaxation comparison on 1D heat
(mirrors reference examples/toms/example_1_heat1d.py): run V- and F-cycles
with F, FCF and FCFCF relaxation, compare iteration counts and the final
space-time error against the exact solution sin(pi x) cos(t), and draw the
observability plots (cycle diagram, time-point distribution, convergence).
"""

import os

import numpy as np
import jax.numpy as jnp

from pymgrit_tpu import Heat1D
from pymgrit_tpu.utils.plots import MgritWithPlots

NT = 2 ** 10 + 1   # reference: 2**14+1 (cluster-scale)
NX = 129
LEVELS = 4
M = 4


def build():
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - 1 * jnp.pi ** 2 * jnp.cos(t))

    def init_cond(x):
        return np.sin(np.pi * x)

    problem = [Heat1D(x_start=0, x_end=1, nx=NX, a=1, rhs=rhs,
                      init_cond=init_cond, t_start=0, t_stop=np.pi, nt=NT)]
    for _ in range(LEVELS - 1):
        problem.append(Heat1D(x_start=0, x_end=1, nx=NX, a=1, rhs=rhs,
                              init_cond=init_cond,
                              t_interval=problem[-1].t[::M]))
    return problem


def exact(x, t):
    return np.sin(np.pi * x)[None, :] * np.cos(t)[:, None]


def main():
    configs = [
        ('V', 1, 'V-cycle, FCF'),
        ('V', 2, 'V-cycle, FCFCF'),
        ('F', 0, 'F-cycle, F'),
        ('F', 1, 'F-cycle, FCF'),
        ('F', 2, 'F-cycle, FCFCF'),
    ]
    results = {}
    plotted = False
    for cycle, cf, label in configs:
        problem = build()
        solver = MgritWithPlots(problem=problem, cycle_type=cycle, cf_iter=cf,
                                tol=1e-8, logging_lvl=30)
        if os.environ.get("PYMGRIT_TPU_PLOT") and not plotted:
            solver.plot_cycle(save_name='toms_cycle.png')
            solver.plot_parallel_distribution(time_procs=4,
                                              save_name='toms_dist.png')
            plotted = True
        info = solver.solve()
        sol = np.asarray(solver.u[0])
        err = np.max(np.abs(sol - exact(problem[0].x, problem[0].t)))
        results[label] = (len(info['conv']), err)
        print(f"{label:18s}: {len(info['conv'])} iterations, "
              f"max space-time error {err:.3e}")
        if os.environ.get("PYMGRIT_TPU_PLOT"):
            solver.plot_convergence(save_name=f'toms_conv_{cycle}_{cf}.png')
    return results


if __name__ == '__main__':
    main()
