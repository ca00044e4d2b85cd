"""Induction machine model family "im_3kW" (GetDP coupling).

Parity targets: reference src/pymgrit/induction_machine/* — the machine
state (vector_machine.py), GetDP file-format IO + mesh utilities
(helper.py), mesh-to-mesh spatial transfer (grid_transfer_machine.py),
machine-specific solvers (mgrit_machine.py, mgrit_machine_conv_jl.py), and
the application shelling out to the GetDP FEM binary
(induction_machine.py).
"""

from pymgrit_tpu.models.induction_machine.machine_state import MachineState, machine_norm
from pymgrit_tpu.models.induction_machine.grid_transfer_machine import GridTransferMachine
from pymgrit_tpu.models.induction_machine.solvers import MgritMachine, MgritMachineConvJl
from pymgrit_tpu.models.induction_machine.application import InductionMachine

__all__ = ["MachineState", "machine_norm", "GridTransferMachine",
           "MgritMachine", "MgritMachineConvJl", "InductionMachine"]
