"""AT-MGRIT for the im_3kW induction machine (GetDP-driven).

Parity target: reference examples/at_mgrit/runme_machine.py — AT-MGRIT
(distance-k truncated coarsest grids) combined with the machine solvers'
joule-loss relative-change convergence criterion, driving the external
GetDP FEM stepper.

Like the plain machine example, this needs the GetDP binary and the im_3kW
mesh set (not bundled; the reference keeps them in
src/pymgrit/induction_machine/im_3kW/).  Point

  PYMGRIT_TPU_IM3KW   -> directory with im_3kW.pro / *.msh / *.pre files
  PYMGRIT_TPU_GETDP   -> path to the getdp executable

at a local installation; without them the script skips with exit 0.
"""

import os

import numpy as np

from pymgrit_tpu.core.at_mgrit import AtMgrit
from pymgrit_tpu.models.induction_machine import InductionMachine


class AtMgritMachine(AtMgrit):
    """AT-MGRIT with the machine's convergence measure: maximum relative
    change of the joule-loss output over all C-points, in percent
    (reference runme_machine.py:21-40)."""

    def __init__(self, *args, **kwargs):
        self._last_jl = None
        super().__init__(*args, **kwargs)

    def convergence_criterion(self, iteration: int) -> None:
        cpts = self.levels[0].cpts
        # machine state: scalars leaf ordered [jl, ia, ib, ic, ua, ub, uc, tr]
        new = np.asarray(self.u[0]["scalars"])[cpts, 0]
        if self._last_jl is None:
            self._last_jl = np.zeros_like(new)
        rel = np.abs(np.divide(new - self._last_jl, new,
                               out=np.zeros_like(new), where=new != 0))
        self.conv[iteration] = 100.0 * float(np.max(rel))
        self._last_jl = new.copy()
        self._all_below = self.conv[iteration] < self.tol


def main():
    path_im3kw = os.environ.get("PYMGRIT_TPU_IM3KW", "")
    path_getdp = os.environ.get("PYMGRIT_TPU_GETDP", "")
    if not path_im3kw or not os.path.isdir(path_im3kw):
        print("SKIP: set PYMGRIT_TPU_IM3KW to the im_3kW data directory "
              "(GetDP + meshes are not bundled; see module docstring)")
        return
    if not path_im3kw.endswith(os.sep):
        path_im3kw += os.sep

    # Reference hierarchy: two levels on the 4k mesh, distance k=10
    machine_0 = InductionMachine(grid='im_3kW_4k', path_im3kw=path_im3kw,
                                 path_getdp=path_getdp, imposed_speed=1,
                                 nonlinear=False, pwm=False,
                                 t_start=0, t_stop=0.02, nt=2 ** 7 + 1)
    machine_1 = InductionMachine(grid='im_3kW_4k', path_im3kw=path_im3kw,
                                 path_getdp=path_getdp, imposed_speed=1,
                                 nonlinear=False, pwm=False,
                                 t_interval=machine_0.t[::64])

    solver = AtMgritMachine(k=10, problem=[machine_0, machine_1],
                            tol=1.0, nested_iteration=False, max_iter=10)
    info = solver.solve()
    print("conv history (joule-loss % change):", info['conv'])
    return info


if __name__ == '__main__':
    main()
