"""Two-level MGRIT for 1D viscous Burgers (the reference's Firedrake demo,
burgers_firedrake.py, rebuilt natively with periodic FD + dense Newton)."""

from pymgrit_tpu import Mgrit
from pymgrit_tpu.models.burgers import Burgers1D


def main():
    b0 = Burgers1D(nx=128, nu=0.02, t_start=0, t_stop=1, nt=65)
    b1 = Burgers1D(nx=128, nu=0.02, t_interval=b0.t[::4])

    mgrit = Mgrit(problem=[b0, b1], tol=1e-8)
    return mgrit.solve()


if __name__ == '__main__':
    main()
