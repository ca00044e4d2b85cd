"""Output function hook: save the fine-grid solution per iteration and plot
it (mirrors reference examples/example_output_fcn.py and
example_output_fcn_serial.py)."""

import pathlib

import numpy as np

from pymgrit_tpu import Dahlquist, Mgrit, simple_setup_problem


def main():
    def output_fcn(self):
        path = 'results/dahlquist'
        pathlib.Path(path).mkdir(parents=True, exist_ok=True)
        np.save(path + f'/iter_{self.solve_iter}',
                np.asarray(self.u[0])[self.index_local[0]])

    dahlquist = Dahlquist(t_start=0, t_stop=5, nt=101)
    structure = simple_setup_problem(problem=dahlquist, level=2, coarsening=2)
    # output_lvl=2: save after every iteration
    mgrit = Mgrit(problem=structure, output_fcn=output_fcn, output_lvl=2)
    return mgrit.solve()


if __name__ == '__main__':
    main()
