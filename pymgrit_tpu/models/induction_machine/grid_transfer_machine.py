"""Mesh-to-mesh spatial transfer for the machine model.

Parity target: reference src/pymgrit/induction_machine/
grid_transfer_machine.py:21-83 — restriction truncates the middle DOF block
to the coarse mesh's unknowns (injection: coarse unknowns are a prefix of
the fine ones); interpolation keeps the coarse DOFs and fills the new fine
unknowns by Delaunay barycentric interpolation, split into rotor (inner) and
stator (outer) regions.
"""

from __future__ import annotations

import jax.numpy as jnp

from pymgrit_tpu.core.grid_transfer import GridTransfer
from pymgrit_tpu.models.induction_machine.io_getdp import (
    check_version, compute_data, compute_mesh_transfer, interpolation_factors)
from pymgrit_tpu.models.induction_machine.machine_state import MachineState


class GridTransferMachine(GridTransfer):
    """Injection restriction / FE interpolation between two machine meshes."""

    def __init__(self, coarse_grid: str, fine_grid: str, path_meshes: str):
        check_version(msh_file=path_meshes + coarse_grid + '.msh')
        data_coarse = compute_data(path_meshes + coarse_grid + '.pre',
                                   path_meshes + coarse_grid + '.msh', 0)
        check_version(msh_file=path_meshes + fine_grid + '.msh')
        data_fine = compute_data(path_meshes + fine_grid + '.pre',
                                 path_meshes + fine_grid + '.msh',
                                 len(data_coarse['corToUn']))
        self.transfer_data = interpolation_factors(data_coarse=data_coarse,
                                                   data_fine=data_fine)

    def restriction(self, u):
        td = self.transfer_data
        return MachineState(u["front"], u["middle"][:td['sizeLvlStart']],
                            u["back"], u["scalars"])

    def interpolation(self, u):
        td = self.transfer_data
        middle = u["middle"]
        new_middle = jnp.zeros(td['sizeLvlStop'] - td['sizeLvlStart'],
                               dtype=middle.dtype)
        new_u_inner = compute_mesh_transfer(
            middle[jnp.asarray(td['mappingInner'])], td['vtxInner'],
            td['wtsInner'], td['addBoundInner'], 0)
        new_u_outer = compute_mesh_transfer(
            middle[jnp.asarray(td['mappingOuter'])], td['vtxOuter'],
            td['wtsOuter'], td['addBoundOuter'], 0)
        new_middle = new_middle.at[:middle.shape[0]].set(middle)
        new_middle = new_middle.at[jnp.asarray(td['mappingInnerNew'])].set(new_u_inner)
        new_middle = new_middle.at[jnp.asarray(td['mappingOuterNew'])].set(new_u_outer)
        return MachineState(u["front"], jnp.concatenate([middle, new_middle]),
                            u["back"], u["scalars"])
