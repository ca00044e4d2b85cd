"""Save and plot the final MGRIT approximation of the solution (mirrors
reference examples/example_output_fcn_serial.py: output_lvl=1 writes once
after convergence; assumes a single-host run)."""

import os
import pathlib

import numpy as np

from pymgrit_tpu import Dahlquist, Mgrit, simple_setup_problem


def main():
    def output_fcn(self):
        path = 'results/dahlquist'
        pathlib.Path(path).mkdir(parents=True, exist_ok=True)
        # Solution values at the local fine-grid time points; on a device
        # mesh each host saves its addressable shard (reference writes one
        # file per MPI rank, docs/source/usage/parallelism.rst).
        np.save(path + '/dahlquist',
                np.asarray(self.u[0])[self.index_local[0]])

    dahlquist = Dahlquist(t_start=0, t_stop=5, nt=101)
    structure = simple_setup_problem(problem=dahlquist, level=2, coarsening=2)
    # output_lvl=1 (default): output function runs once, after the solve
    mgrit = Mgrit(problem=structure, output_fcn=output_fcn, output_lvl=1)
    info = mgrit.solve()

    sol = np.load('results/dahlquist/dahlquist.npy')
    print("saved solution:", sol.shape, "u(T) =", sol[-1])
    if os.environ.get("PYMGRIT_TPU_PLOT"):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(dahlquist.t, sol)
        plt.xlabel('t')
        plt.ylabel('u(t)')
        plt.savefig('results/dahlquist/solution.png', bbox_inches='tight')
    return info


if __name__ == '__main__':
    main()
