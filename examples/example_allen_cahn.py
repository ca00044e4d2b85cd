"""Two-level MGRIT for the 2D Allen-Cahn equation with the fully implicit
Newton stepper (reference src/pymgrit/allen_cahn/allen_cahn.py; the
BASELINE space-time-parallel configuration runs this on a
('time','space') device mesh - pass mesh=make_time_space_mesh(...))."""

from pymgrit_tpu import AllenCahn, Mgrit


def main():
    ac0 = AllenCahn(nx=128, eps=0.04, radius=0.25, method='IMPL',
                    t_start=0, t_stop=0.024, nt=33)
    ac1 = AllenCahn(nx=128, eps=0.04, radius=0.25, method='IMPL',
                    t_interval=ac0.t[::4])

    mgrit = Mgrit(problem=[ac0, ac1], tol=1e-7, max_iter=10)
    info = mgrit.solve()

    import numpy as np
    u_final = np.asarray(mgrit.u[0])[-1]
    print('computed radius:', ac0.compute_radius(u_final),
          ' exact radius:', ac0.exact_radius(ac0.t[-1]))
    return info


if __name__ == '__main__':
    main()
