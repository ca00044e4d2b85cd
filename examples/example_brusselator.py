"""Two-level MGRIT with FCF-relaxation for the Brusselator system (mirrors
reference examples/example_brusselator.py)."""

from pymgrit_tpu import Brusselator, Mgrit


def main():
    brusselator_lvl_0 = Brusselator(t_start=0, t_stop=12, nt=641)
    brusselator_lvl_1 = Brusselator(t_interval=brusselator_lvl_0.t[::20])

    mgrit = Mgrit(problem=[brusselator_lvl_0, brusselator_lvl_1], cf_iter=1)
    return mgrit.solve()


if __name__ == '__main__':
    main()
