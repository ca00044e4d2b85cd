"""Two-level MGRIT for the 2D heat equation with a time-dependent source
whose exact solution is the polynomial 5tx(x_end-x)y(y_end-y) (mirrors
reference examples/example_heat_2d.py) - converges in one iteration.
Demonstrates the output function hook for saving solutions."""

import pathlib

import numpy as np

from pymgrit_tpu import Heat2D, Mgrit


def main():
    x_end, y_end, a = 0.75, 1.5, 3.5

    def rhs(x, y, t):
        return 5 * x * (x_end - x) * y * (y_end - y) + \
            10 * a * t * (y * (y_end - y) + x * (x_end - x))

    def output_fcn(self):
        path = 'results/heat_equation_2d'
        pathlib.Path(path).mkdir(parents=True, exist_ok=True)
        np.savez(path + '/solution', t=self.t[0],
                 u=np.asarray(self.u[0])[self.index_local[0]])

    heat0 = Heat2D(x_start=0, x_end=x_end, y_start=0, y_end=y_end, nx=55, ny=125,
                   a=a, rhs=rhs, t_start=0, t_stop=1, nt=33)
    heat1 = Heat2D(x_start=0, x_end=x_end, y_start=0, y_end=y_end, nx=55, ny=125,
                   a=a, rhs=rhs, t_interval=heat0.t[::2])

    mgrit = Mgrit(problem=[heat0, heat1], cycle_type='V', output_fcn=output_fcn)
    return mgrit.solve()


if __name__ == '__main__':
    main()
