"""Every solver knob documented in one place (mirrors reference
examples/example_parameters.py; the MPI communicators are replaced by an
optional jax device mesh)."""

from pymgrit_tpu import Dahlquist, Mgrit, simple_setup_problem


def main():
    dahlquist = Dahlquist(t_start=0, t_stop=5, nt=101)
    structure = simple_setup_problem(problem=dahlquist, level=2, coarsening=2)

    mgrit = Mgrit(problem=structure,        # Problem structure (one per level)
                  transfer=None,            # Spatial transfers; identity if None
                  max_iter=10,              # Maximum number of iterations (default: 100)
                  tol=1e-10,                # Stopping tolerance (default: 1e-7)
                  nested_iteration=True,    # Nested iteration initialization (default: True)
                  cf_iter=1,                # CF-relaxations per level: int or list
                  cycle_type='V',           # 'V' or 'F' cycles
                  mesh=None,                # jax ('time','space') device mesh;
                                            # replaces comm_time/comm_space
                  weight_c=1,               # C-relaxation weight (weighted Jacobi)
                  logging_lvl=20,           # 10 debug / 20 info / 30 quiet
                  output_fcn=None,          # Solution output hook
                  output_lvl=1,             # 0 never / 1 at end / 2 per iteration
                  t_norm=2,                 # 1 one-norm / 2 two-norm / 3 inf-norm
                  random_init_guess=False,  # Random initial guess
                  conv_crit=0)              # 0/1 global, 2/3 local criteria
    return mgrit.solve()


if __name__ == '__main__':
    main()
