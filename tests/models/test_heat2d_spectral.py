"""Heat2D basis='spectral': the solver state lives in eigen-coefficient
space, every step is elementwise (no matmuls in the hot loop), and —
because the sine basis is orthonormal and MGRIT's algebra is orthogonally
invariant — residual histories and solutions are identical to the physical
basis (reference semantics preserved by construction).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pymgrit_tpu import Mgrit
from pymgrit_tpu.models.heat_2d import Heat2D

KW = dict(x_start=0, x_end=1, y_start=3, y_end=5, nx=17, ny=21, a=3.5,
          rhs=lambda x, y, t: jnp.sin(jnp.pi * x) * jnp.cos(y) * (1.0 + jnp.sin(t)),
          init_cond=lambda x, y: np.sin(np.pi * x) * np.cos(y),
          bc_left=1.0, bc_right=2.0, bc_bottom=0.5, bc_top=0.0)


def _mk(nt, basis='physical', method='BE', precision=None):
    return Heat2D(t_start=0, t_stop=1, nt=nt, basis=basis, method=method,
                  precision=precision, **KW)


@pytest.mark.parametrize("method", ['BE', 'CN'])
def test_spectral_matches_physical(method):
    hist, sol = {}, {}
    for basis in ('physical', 'spectral'):
        prob = [_mk(33, basis, method), _mk(9, basis, method), _mk(3, basis, method)]
        m = Mgrit(problem=prob, tol=1e-10, max_iter=12, logging_lvl=30)
        hist[basis] = m.solve()['conv']
        sol[basis] = (np.asarray(m.u[0]) if basis == 'physical'
                      else np.asarray(prob[0].to_physical(m.u[0])))
    assert len(hist['physical']) == len(hist['spectral'])
    # identical histories; the final (roundoff-floor) iteration may differ
    np.testing.assert_allclose(hist['spectral'][:-1], hist['physical'][:-1],
                               rtol=1e-6)
    assert hist['spectral'][-1] < 1e-10
    np.testing.assert_allclose(sol['spectral'], sol['physical'], atol=1e-12)


def test_spectral_step_equals_physical_step():
    mp = _mk(9)
    ms = _mk(9, basis='spectral')
    u0 = np.asarray(mp.vector_t_start, np.float64)
    want = np.asarray(mp.step(jnp.asarray(u0), mp.t[0], mp.t[1]))
    got_hat = ms.step(jnp.asarray(np.asarray(ms.vector_t_start, np.float64)),
                      ms.t[0], ms.t[1])
    got = np.asarray(ms.to_physical(got_hat))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_spectral_fe_raises():
    with pytest.raises(Exception, match="spectral"):
        _mk(9, basis='spectral', method='FE')


def test_spectral_dd_reaches_deep_tolerance():
    """DD + spectral: extended precision with zero matmuls — the cheapest
    route to the 1e-10 class (no Ozaki overhead in the hot loop)."""
    prob = [_mk(33, 'spectral', 'BE', 'dd'), _mk(9, 'spectral', 'BE', 'dd'),
            _mk(3, 'spectral', 'BE', 'dd')]
    m = Mgrit(problem=prob, tol=1e-12, max_iter=12, logging_lvl=30)
    conv = m.solve()['conv']
    assert conv[-1] < 1e-12
    # same history as fp64 physical (all but the floor iteration)
    prob64 = [_mk(33), _mk(9), _mk(3)]
    conv64 = Mgrit(problem=prob64, tol=1e-12, max_iter=12,
                   logging_lvl=30).solve()['conv']
    n = min(len(conv), len(conv64))
    np.testing.assert_allclose(conv[:n - 1], conv64[:n - 1], rtol=1e-5)


def test_spectral_closed_form_relaxation_matches():
    """Time-independent rhs activates the closed-form interval relaxation
    (relax_interval hook: A^k seed + G_k, no scan); histories must match
    the physical basis, in f64 and in DD."""
    def mk(nt, basis, precision=None):
        return Heat2D(x_start=0, x_end=1, y_start=0, y_end=1, nx=17, ny=17,
                      a=1.0,
                      rhs=lambda x, y, t: jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)
                      * jnp.ones_like(t * x * y),
                      init_cond=lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y),
                      t_start=0, t_stop=1, nt=nt, basis=basis,
                      precision=precision)

    hist = {}
    for basis, prec in (('physical', None), ('spectral', None), ('spectral', 'dd')):
        m = Mgrit(problem=[mk(33, basis, prec), mk(9, basis, prec),
                           mk(3, basis, prec)], tol=1e-9, max_iter=8,
                  logging_lvl=30)
        hist[(basis, prec)] = m.solve()['conv']
    base = hist[('physical', None)]
    for key in (('spectral', None), ('spectral', 'dd')):
        h = hist[key]
        assert len(h) == len(base)
        np.testing.assert_allclose(h[:-1], base[:-1], rtol=1e-6)
        assert h[-1] < 1e-9


def test_heat1d_spectral_matches_physical():
    """Heat1D basis='spectral' (elementwise BE in eigenspace + closed-form
    interval relaxation) matches the physical basis, f64 and DD, for both
    time-dependent (scan path) and time-independent (fast path) rhs."""
    from pymgrit_tpu.models.heat_1d import Heat1D

    for rhs in (lambda x, t: -jnp.sin(jnp.pi * x) * (jnp.sin(t) - jnp.pi ** 2 * jnp.cos(t)),
                lambda x, t: jnp.sin(jnp.pi * x) * jnp.ones_like(t * x)):
        hist = {}
        for basis, prec in (('physical', None), ('spectral', None),
                            ('spectral', 'dd')):
            mk = lambda nt: Heat1D(x_start=0, x_end=2, nx=33, a=1, rhs=rhs,
                                   init_cond=lambda x: np.sin(np.pi * x),
                                   t_start=0, t_stop=2, nt=nt, basis=basis,
                                   precision=prec)
            m = Mgrit(problem=[mk(65), mk(17), mk(5)], tol=1e-9, max_iter=8,
                      logging_lvl=30)
            hist[(basis, prec)] = m.solve()['conv']
        base = hist[('physical', None)]
        for k, h in hist.items():
            assert len(h) == len(base), (k, h, base)
            np.testing.assert_allclose(h[:-1], base[:-1], rtol=1e-5)
            assert h[-1] < 1e-9
