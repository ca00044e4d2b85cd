"""Four ways of building the time-multigrid hierarchy (mirrors reference
examples/example_multilevel_structure.py) - all four give identical
residual histories."""

import numpy as np

from pymgrit_tpu import Dahlquist, Mgrit, simple_setup_problem


def main():
    # Option 1: simple_setup_problem()
    s1 = simple_setup_problem(problem=Dahlquist(t_start=0, t_stop=5, nt=101),
                              level=3, coarsening=2)
    Mgrit(problem=s1, tol=1e-10).solve()

    # Option 2: t_start, t_stop, nt per level
    s2 = [Dahlquist(t_start=0, t_stop=5, nt=101),
          Dahlquist(t_start=0, t_stop=5, nt=51),
          Dahlquist(t_start=0, t_stop=5, nt=26)]
    Mgrit(problem=s2, tol=1e-10).solve()

    # Option 3: explicit t_interval per level
    t_interval = np.linspace(0, 5, 101)
    s3 = [Dahlquist(t_interval=t_interval),
          Dahlquist(t_interval=t_interval[::2]),
          Dahlquist(t_interval=t_interval[::4])]
    Mgrit(problem=s3, tol=1e-10).solve()

    # Option 4: mix
    lvl0 = Dahlquist(t_start=0, t_stop=5, nt=101)
    s4 = [lvl0, Dahlquist(t_interval=lvl0.t[::2]), Dahlquist(t_start=0, t_stop=5, nt=26)]
    Mgrit(problem=s4, tol=1e-10).solve()


if __name__ == '__main__':
    main()
