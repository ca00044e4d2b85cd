"""Customized MGRIT solver with a user-defined stopping criterion: maximum
relative change at C-points between successive iterates (mirrors reference
examples/example_convergence_criterion.py)."""

import numpy as np

from pymgrit_tpu import ArenstorfOrbit, Mgrit


class MgritCustomized(Mgrit):
    """Stops when the maximum relative C-point change drops below tol (%)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.last_it = np.zeros((len(self.levels[0].cpts),) +
                                np.asarray(self.u[0]).shape[1:])
        self.convergence_criterion(iteration=0)

    def convergence_criterion(self, iteration):
        new = np.asarray(self.u[0])[self.levels[0].cpts]
        self.conv[iteration] = 100 * np.max(
            np.abs(np.abs(np.divide((new - self.last_it), new,
                                    out=np.zeros_like(self.last_it),
                                    where=new != 0))))
        self.last_it = np.copy(new)


def main():
    arenstorf_lvl_0 = ArenstorfOrbit(t_start=0, t_stop=17.06521656015796, nt=10001)
    arenstorf_lvl_1 = ArenstorfOrbit(t_interval=arenstorf_lvl_0.t[::100])

    # tol=1 -> stop when every variable changes by < 1% between iterations
    mgrit = MgritCustomized(problem=[arenstorf_lvl_0, arenstorf_lvl_1], tol=1)
    return mgrit.solve()


if __name__ == '__main__':
    main()
