"""1D full-weighting restriction / linear interpolation spatial transfer.

Parity target: the documented spatial-coarsening example transfer (reference
examples/example_spatial_coarsening.py:18-86 and
docs/source/usage/advanced.rst): full-weighting restriction
[1/4, 1/2, 1/4] and linear interpolation between nested Dirichlet
interior-point grids (fine n -> coarse (n-1)/2).

The reference loops over entries; here both operators are vectorized slices
(pure VPU ops, vmapped over the time axis by the solver).
"""

from __future__ import annotations

import jax.numpy as jnp

from pymgrit_tpu.core.grid_transfer import GridTransfer


class GridTransferHeat(GridTransfer):
    """Full-weighting / linear-interpolation transfer for interior-point
    Dirichlet grids."""

    def restriction(self, u):
        # ret[i] = u[2i]/4 + u[2i+1]/2 + u[2i+2]/4
        return u[:-2:2] * 0.25 + u[1:-1:2] * 0.5 + u[2::2] * 0.25

    def interpolation(self, u):
        # ret[2i] += u[i]/2; ret[2i+1] = u[i]; ret[2i+2] += u[i]/2
        n = u.shape[0]
        even = jnp.zeros(n + 1, dtype=u.dtype)
        even = even.at[:-1].add(0.5 * u)
        even = even.at[1:].add(0.5 * u)
        out = jnp.zeros(2 * n + 1, dtype=u.dtype)
        out = out.at[1::2].set(u)
        out = out.at[::2].set(even)
        return out
