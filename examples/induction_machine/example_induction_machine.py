"""MGRIT for the im_3kW induction machine driven by the external GetDP FEM
solver (mirrors reference examples/induction_machine/induction_machine.py).

Requires the GetDP binary and the im_3kW mesh/pro data, neither of which
ships with this repository (reference keeps them in
src/pymgrit/induction_machine/im_3kW/).  Point the environment variables

  PYMGRIT_TPU_IM3KW   -> directory with im_3kW.pro / *.msh / *.pre files
  PYMGRIT_TPU_GETDP   -> path to the getdp executable

at a local installation.  The stepper runs on the host through
``jax.pure_callback`` (pymgrit_tpu/models/induction_machine/application.py);
the MGRIT outer loop, transfers and convergence logic are unchanged.
"""

import os
import pathlib
import sys

import numpy as np

from pymgrit_tpu import GridTransferCopy
from pymgrit_tpu.models.induction_machine import (
    InductionMachine, GridTransferMachine, MgritMachineConvJl)


def main():
    path_im3kw = os.environ.get("PYMGRIT_TPU_IM3KW", "")
    path_getdp = os.environ.get("PYMGRIT_TPU_GETDP", "")
    if not path_im3kw or not os.path.isdir(path_im3kw):
        # Graceful skip (exit 0): this example needs the external GetDP
        # binary + im_3kW mesh set, which are not bundled; a nonzero exit
        # would read as a failure to harnesses like tools/run_examples.py.
        print("SKIP: set PYMGRIT_TPU_IM3KW to the im_3kW data directory "
              "(GetDP + meshes are not bundled; see module docstring)")
        return
    if not path_im3kw.endswith(os.sep):
        path_im3kw += os.sep

    # Two time levels on the same mesh + one spatially coarsened level,
    # exactly the reference driver's hierarchy (induction_machine.py:...):
    machine_0 = InductionMachine(grid='im_3kW_4k', path_im3kw=path_im3kw,
                                 path_getdp=path_getdp, imposed_speed=1,
                                 nonlinear=False, pwm=False,
                                 t_start=0, t_stop=0.02, nt=2 ** 8 + 1)
    machine_1 = InductionMachine(grid='im_3kW_4k', path_im3kw=path_im3kw,
                                 path_getdp=path_getdp, imposed_speed=1,
                                 nonlinear=False, pwm=False,
                                 t_interval=machine_0.t[::4])
    machine_2 = InductionMachine(grid='im_3kW_1k', path_im3kw=path_im3kw,
                                 path_getdp=path_getdp, imposed_speed=1,
                                 nonlinear=False, pwm=False,
                                 t_interval=machine_1.t[::4])

    transfer = [GridTransferCopy(),
                GridTransferMachine(coarse_grid='im_3kW_1k',
                                    fine_grid='im_3kW_4k',
                                    path_meshes=path_im3kw)]

    def output_fcn(self):
        path = 'results/machine'
        pathlib.Path(path).mkdir(parents=True, exist_ok=True)
        # scalars leaf is ordered [jl, ia, ib, ic, ua, ub, uc, tr]
        jl = np.asarray(self.u[0]['scalars'])[self.index_local[0], 0]
        np.save(path + '/joule_losses', jl)

    mgrit = MgritMachineConvJl(compute_f_after_convergence=True,
                               problem=[machine_0, machine_1, machine_2],
                               transfer=transfer, tol=1.0,
                               output_fcn=output_fcn)
    return mgrit.solve()


if __name__ == '__main__':
    main()
