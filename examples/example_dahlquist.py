"""Quickstart: two-level MGRIT for Dahlquist's test problem.

Mirrors the reference README example (reference README.rst:80-109): nt=101,
two levels, coarsening 2, tol=1e-10 -> converges in 5 iterations with the
published residual history.
"""

from pymgrit_tpu import Dahlquist, Mgrit, simple_setup_problem


def main():
    # Create Dahlquist's test problem with 101 time points in [0, 5]
    dahlquist = Dahlquist(t_start=0, t_stop=5, nt=101)

    # Construct a two-level multigrid hierarchy with coarsening factor 2
    dahlquist_multilevel_structure = simple_setup_problem(problem=dahlquist, level=2, coarsening=2)

    # Set up the MGRIT solver and solve the problem
    mgrit = Mgrit(problem=dahlquist_multilevel_structure, tol=1e-10)
    info = mgrit.solve()
    return info


if __name__ == '__main__':
    main()
