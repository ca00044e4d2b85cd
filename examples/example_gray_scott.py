"""Two-level MGRIT for the 2D Gray-Scott reaction-diffusion system (the
reference's space-time-parallel PETSc demo, gray_scott_2d_petsc.py +
examples/at_mgrit/runme_grayscott.py, rebuilt natively with FFT-diagonalized
IMEX diffusion)."""

from pymgrit_tpu import Mgrit
from pymgrit_tpu.models.gray_scott_2d import GrayScott2D


def main():
    gs0 = GrayScott2D(nx=64, method='IMEX', t_start=0, t_stop=100.0, nt=65)
    gs1 = GrayScott2D(nx=64, method='IMEX', t_interval=gs0.t[::4])

    mgrit = Mgrit(problem=[gs0, gs1], tol=1e-7)
    return mgrit.solve()


if __name__ == '__main__':
    main()
