"""Different time integrators on different levels: implicit mid-point rule
on the fine grid, backward Euler on the coarse grid (mirrors reference
examples/example_time_integrators.py)."""

from pymgrit_tpu import Dahlquist, Mgrit


def main():
    dahlquist_lvl0 = Dahlquist(t_start=0, t_stop=5, nt=101, method='MR')
    dahlquist_lvl1 = Dahlquist(t_start=0, t_stop=5, nt=51, method='BE')

    mgrit = Mgrit(problem=[dahlquist_lvl0, dahlquist_lvl1])
    return mgrit.solve()


if __name__ == '__main__':
    main()
