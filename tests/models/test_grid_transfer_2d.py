"""2D spatial grid transfer (GridTransferHeat2D — the native analogue of the
reference's GridTransferPetsc, petsc/heat_2D_petsc.py:196-232).

Tier 1: hand-computed injection/bilinear stencils on a tiny grid.
Tier 2: a spatially-coarsened heat_2d MGRIT hierarchy cross-validated against
the live reference running the *same* transfer semantics via a numpy
GridTransfer subclass (the reference's PETSc DMDA operators are exactly
injection + tensor-product bilinear interpolation on a vertex-centered
grid, so this numpy twin is faithful)."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "tools", "mpi4py_stub"))
sys.path.insert(0, "/root/reference/src")

from pymgrit_tpu import GridTransferHeat2D


def test_restriction_is_injection():
    tr = GridTransferHeat2D(nx_fine=5, ny_fine=7)
    u = jnp.arange(35.0).reshape(5, 7)
    np.testing.assert_array_equal(np.asarray(tr.restriction(u)),
                                  np.asarray(u)[::2, ::2])


def test_interpolation_bilinear_stencil():
    tr = GridTransferHeat2D(nx_fine=5, ny_fine=5)
    u = jnp.array([[1.0, 2.0, 3.0],
                   [4.0, 5.0, 6.0],
                   [7.0, 8.0, 9.0]])
    out = np.asarray(tr.interpolation(u))
    # coincident vertices copy
    np.testing.assert_array_equal(out[::2, ::2], np.asarray(u))
    # x-edge midpoints: average of vertical neighbors
    np.testing.assert_allclose(out[1, 0], (1.0 + 4.0) / 2)
    np.testing.assert_allclose(out[3, 2], (5.0 + 8.0) / 2)
    # y-edge midpoints: average of horizontal neighbors
    np.testing.assert_allclose(out[0, 1], (1.0 + 2.0) / 2)
    np.testing.assert_allclose(out[2, 3], (5.0 + 6.0) / 2)
    # cell centers: 4-point average
    np.testing.assert_allclose(out[1, 1], (1.0 + 2.0 + 4.0 + 5.0) / 4)
    np.testing.assert_allclose(out[3, 3], (5.0 + 6.0 + 8.0 + 9.0) / 4)


def test_restrict_after_interpolate_is_identity():
    tr = GridTransferHeat2D(nx_fine=9, ny_fine=9)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((5, 5)))
    np.testing.assert_allclose(np.asarray(tr.restriction(tr.interpolation(u))),
                               np.asarray(u), rtol=1e-14)


def test_even_fine_dims_rejected():
    with pytest.raises(Exception, match="odd fine dimensions"):
        GridTransferHeat2D(nx_fine=6, ny_fine=5)


# ---------------------------------------------------------------------------


def _build_hierarchy(heat_cls, rhs, init_cond, sizes, nts):
    return [heat_cls(x_start=0, x_end=1, y_start=0, y_end=1,
                     nx=n, ny=n, a=1.0, rhs=rhs, init_cond=init_cond,
                     t_start=0, t_stop=1, nt=nt)
            for n, nt in zip(sizes, nts)]


def test_mgrit_spatial_coarsening_matches_reference():
    """3-level heat_2d with combined time + space coarsening: residual
    history must match the live reference running identical injection /
    bilinear operators (the GridTransferPetsc semantics,
    petsc/heat_2D_petsc.py:196-232, re-expressed in numpy on the
    reference's VectorHeat2D)."""
    from pymgrit.core.mgrit import Mgrit as RefMgrit
    from pymgrit.core.grid_transfer import GridTransfer as RefGridTransfer
    from pymgrit.core.grid_transfer_copy import GridTransferCopy as RefCopy
    from pymgrit.heat.heat_2d import Heat2D as RefHeat2D
    from pymgrit.heat.heat_2d import VectorHeat2D as RefVectorHeat2D
    from pymgrit_tpu import Mgrit, Heat2D, GridTransferCopy, GridTransferHeat2D

    class RefTransfer2D(RefGridTransfer):
        """Numpy twin of GridTransferHeat2D for the reference solver."""

        def restriction(self, u):
            vals = u.get_values()[::2, ::2]
            out = RefVectorHeat2D(*vals.shape)
            out.set_values(vals)
            return out

        def interpolation(self, u):
            vals = u.get_values()

            def interp_axis(a):
                n = a.shape[0]
                out = np.zeros((2 * n - 1,) + a.shape[1:])
                out[::2] = a
                out[1::2] = 0.5 * (a[:-1] + a[1:])
                return out

            fine = interp_axis(interp_axis(vals).T).T
            out = RefVectorHeat2D(*fine.shape)
            out.set_values(fine)
            return out

    def rhs_np(x, y, t):
        return np.sin(np.pi * x) * np.sin(np.pi * y) * np.ones_like(t * x * y)

    def rhs_j(x, y, t):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.ones_like(t * x * y)

    def ic(x, y):
        return np.sin(np.pi * x) * np.sin(np.pi * y)

    sizes = (33, 17, 17)      # coarsen space on the first pair only
    nts = (65, 17, 5)
    kw = dict(tol=1e-9, max_iter=8, logging_lvl=30)
    ref = RefMgrit(problem=_build_hierarchy(RefHeat2D, rhs_np, ic, sizes, nts),
                   transfer=[RefTransfer2D(), RefCopy()], **kw)
    ours = Mgrit(problem=_build_hierarchy(Heat2D, rhs_j, ic, sizes, nts),
                 transfer=[GridTransferHeat2D(nx_fine=33, ny_fine=33),
                           GridTransferCopy()], **kw)
    ref_conv = ref.solve()["conv"]
    our_conv = ours.solve()["conv"]
    assert len(ref_conv) == len(our_conv), (ref_conv, our_conv)
    np.testing.assert_allclose(our_conv, ref_conv, rtol=1e-5, atol=1e-12)
