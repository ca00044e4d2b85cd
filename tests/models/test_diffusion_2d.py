"""P1-DG SIPG diffusion model (Firedrake-coupling analogue).

Reference: src/pymgrit/firedrake/diffusion_2d_firedrake.py:19-103 +
examples/firedrake/example_diffusion_2d_firedrake.py (PeriodicSquareMesh
(20,20,10), kappa=0.1, mu=5).  Firedrake is not installed anywhere (it is
an optional coupling in the reference too), so correctness is pinned to
physics and discretization theory instead of golden numbers: operator
invariants, spectral convergence to the periodic Laplacian, mass
conservation, decay rates, and MGRIT-vs-sequential equivalence.
"""

import numpy as np
import pytest

from pymgrit_tpu import Diffusion2D, Mgrit
from pymgrit_tpu.models.diffusion_2d import _assemble_p1dg_sipg


def test_operator_invariants():
    M, K, xy = _assemble_p1dg_sipg(8, 10.0, 0.1, 5.0)
    one = np.ones(M.shape[0])
    assert np.max(np.abs(K - K.T)) == 0.0            # symmetric by assembly
    assert np.max(np.abs(K @ one)) < 1e-13           # constants in kernel
    assert abs(one @ M @ one - 100.0) < 1e-10        # total mass = area
    import scipy.linalg
    lam = scipy.linalg.eigh(K, M, eigvals_only=True)
    assert lam[0] > -1e-12                           # SIPG is PSD at mu=5


def test_spectrum_matches_periodic_laplacian():
    """Lowest nonzero generalized eigenvalues approximate
    kappa*(2pi/L)^2*(kx^2+ky^2) with the right multiplicities, O(h^2)."""
    import scipy.linalg
    M, K, _ = _assemble_p1dg_sipg(12, 10.0, 0.1, 5.0)
    lam = scipy.linalg.eigh(K, M, eigvals_only=True)
    base = 0.1 * (2 * np.pi / 10.0) ** 2
    assert abs(lam[0]) < 1e-12
    np.testing.assert_allclose(lam[1:5], base, rtol=0.03)   # multiplicity 4
    np.testing.assert_allclose(lam[5], 2 * base, rtol=0.03)


def test_inhomogeneous_kappa_invariants():
    kappa = lambda x, y: 0.05 + 0.1 * (x > 5.0)
    M, K, _ = _assemble_p1dg_sipg(8, 10.0, kappa, 5.0)
    one = np.ones(M.shape[0])
    assert np.max(np.abs(K - K.T)) < 1e-14
    assert np.max(np.abs(K @ one)) < 1e-13


def test_step_mass_conservation_and_decay():
    """BE steps conserve int u dx exactly (periodic) and decay a Fourier
    mode at the discrete-eigenvalue rate."""
    d = Diffusion2D(n=12, length=10.0, kappa=0.1, t_start=0, t_stop=1, nt=3)
    u = np.asarray(d.vector_t_start, np.float64)
    w = d.mass @ np.ones(d.mass.shape[0])
    m0 = w @ u
    import jax.numpy as jnp
    v = d.step(jnp.asarray(u), 0.0, 0.25)
    v = d.step(v, 0.25, 0.5)
    assert abs(float(w @ np.asarray(v, np.float64)) - m0) < 1e-8 * abs(m0)
    # mode decay: project IC off; after long time only the mean survives
    vlong = d.step(jnp.asarray(u), 0.0, 1e6)
    mean = m0 / 100.0
    assert np.max(np.abs(np.asarray(vlong) - mean)) < 1e-4


def test_mgrit_matches_sequential():
    """2-level MGRIT (the reference example's configuration: nt=17/9, V,
    FCF) converges and reproduces sequential time stepping."""
    def mk(nt):
        return Diffusion2D(n=10, length=10.0, kappa=0.1, t_start=0,
                           t_stop=10, nt=nt)

    mgrit = Mgrit(problem=[mk(17), mk(9)], tol=1e-9, logging_lvl=30)
    info = mgrit.solve()
    assert info['conv'][-1] < 1e-9
    assert len(info['conv']) <= 8

    d = mk(17)
    import jax.numpy as jnp
    u = jnp.asarray(np.asarray(d.vector_t_start, np.float64))
    for i in range(1, 17):
        u = d.step(u, d.t[i - 1], d.t[i])
    got = np.asarray(mgrit.u[0])[-1]
    np.testing.assert_allclose(got, np.asarray(u), atol=1e-8)


@pytest.mark.slow   # 27 s; DD x f64 cross-check, nightly
def test_diffusion_dd_matches_f64():
    """precision='dd' on the DG diffusion model (Ozaki eigenbasis step):
    histories match fp64 down to tol=1e-11."""
    def mk(nt, prec=None):
        return Diffusion2D(n=8, length=10.0, kappa=0.1, t_start=0,
                           t_stop=10, nt=nt, precision=prec)

    base = Mgrit(problem=[mk(17), mk(9)], tol=1e-11, max_iter=10,
                 logging_lvl=30).solve()['conv']
    conv = Mgrit(problem=[mk(17, 'dd'), mk(9, 'dd')], tol=1e-11, max_iter=10,
                 logging_lvl=30).solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv[:-1], base[:-1], rtol=1e-4)
    assert conv[-1] < 1e-11
