"""Two-level MGRIT for the Arenstorf orbit with the adaptive DOPRI45 stepper
(mirrors reference examples/example_arenstorf.py)."""

from pymgrit_tpu import ArenstorfOrbit, Mgrit


def main():
    arenstorf_lvl_0 = ArenstorfOrbit(t_start=0, t_stop=17.06521656015796, nt=80001)
    arenstorf_lvl_1 = ArenstorfOrbit(t_interval=arenstorf_lvl_0.t[::320])

    mgrit = Mgrit(problem=[arenstorf_lvl_0, arenstorf_lvl_1], cf_iter=0, tol=1e-2)
    return mgrit.solve()


if __name__ == '__main__':
    main()
