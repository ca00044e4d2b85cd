"""Spatial grid transfer between consecutive MGRIT levels.

Mirrors the reference ``GridTransfer`` ABC / ``GridTransferCopy`` (reference:
src/pymgrit/core/grid_transfer.py:15-55, grid_transfer_copy.py:12-47).

``restriction`` / ``interpolation`` act on a *single* pytree state; the
solver vmaps them over the time axis, so implementations should be pure
jittable functions of jnp arrays.
"""

from __future__ import annotations

import abc

import jax


class GridTransfer(abc.ABC):
    """Transfer operators between the spatial grids of two consecutive
    time levels."""

    @abc.abstractmethod
    def restriction(self, u):
        """Restrict fine state u to the coarse spatial grid."""

    @abc.abstractmethod
    def interpolation(self, u):
        """Interpolate coarse state u to the fine spatial grid."""


class GridTransferCopy(GridTransfer):
    """Identity transfer (reference: grid_transfer_copy.py:25-47)."""

    def restriction(self, u):
        return jax.tree_util.tree_map(lambda x: x, u)

    def interpolation(self, u):
        return jax.tree_util.tree_map(lambda x: x, u)
