"""Two-level MGRIT with FCF-relaxation for 1D advection (mirrors reference
examples/example_advection.py)."""

from pymgrit_tpu import Advection1D, Mgrit


def main():
    advection_lvl_0 = Advection1D(c=1, x_start=-1, x_end=1, nx=129, t_start=0, t_stop=2, nt=129)
    advection_lvl_1 = Advection1D(c=1, x_start=-1, x_end=1, nx=129, t_start=0, t_stop=2, nt=65)

    mgrit = Mgrit(problem=[advection_lvl_0, advection_lvl_1], cf_iter=1,
                  nested_iteration=False)
    return mgrit.solve()


if __name__ == '__main__':
    main()
