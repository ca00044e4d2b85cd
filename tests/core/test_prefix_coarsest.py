"""Parallel-prefix (associative-scan) coarsest-level solve.

``Mgrit(coarsest_prefix=True)`` replaces the sequential coarsest-level scan
(reference src/pymgrit/core/mgrit.py:459-486) with an O(log n)-depth
``lax.associative_scan`` over composed affine maps (ops/prefix.py) for
applications whose step is elementwise-affine in the state
(``affine_coeffs`` capability: Dahlquist, spectral-basis Heat2D).  It is
EXACT — the same recurrence, associated differently — so every history
must match the sequential solver to f64 roundoff, unlike AT-MGRIT's
truncated windows which only approximate the chain.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pymgrit_tpu import Mgrit, Dahlquist, Heat2D
from pymgrit_tpu.ops.prefix import affine_prefix_states


@pytest.mark.core
def test_affine_prefix_matches_sequential_recurrence():
    rng = np.random.default_rng(0)
    n, s = 37, (5,)
    A = jnp.asarray(rng.uniform(-1.0, 1.0, (n,) + s))
    c = jnp.asarray(rng.normal(size=(n,) + s))
    x0 = jnp.asarray(rng.normal(size=s))
    got = affine_prefix_states(A, c, x0)
    ref, x = [], x0
    for k in range(n):
        x = A[k] * x + c[k]
        ref.append(x)
    np.testing.assert_allclose(np.asarray(got), np.stack(ref),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.core
@pytest.mark.parametrize("method", ["BE", "FE", "TR", "MR"])
def test_dahlquist_affine_coeffs_consistent_with_step(method):
    app = Dahlquist(t_start=0, t_stop=5, nt=11, method=method)
    u = jnp.asarray(0.7317)
    for t0, t1 in [(0.0, 0.5), (1.25, 1.3)]:
        A, b = app.affine_coeffs(t0, t1)
        np.testing.assert_allclose(np.asarray(app.step(u, t0, t1)),
                                   np.asarray(A * u + b), rtol=1e-14)


@pytest.mark.core
@pytest.mark.parametrize("method", [
    "BE", pytest.param("TR", marks=pytest.mark.slow)])
def test_dahlquist_prefix_history_matches_scan(method):
    def build():
        return [Dahlquist(t_start=0, t_stop=5, nt=1025, method=method),
                Dahlquist(t_start=0, t_stop=5, nt=129, method=method)]
    seq = Mgrit(problem=build(), tol=1e-300, max_iter=4, logging_lvl=40)
    rs = seq.solve_compiled()['conv']
    pfx = Mgrit(problem=build(), tol=1e-300, max_iter=4, logging_lvl=40,
                coarsest_prefix=True)
    rp = pfx.solve_compiled()['conv']
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rs),
                               rtol=1e-9, atol=1e-13)


def _rhs(x, y, t):
    return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.exp(-t) \
        * jnp.ones_like(t * x * y)


def _ic(x, y):
    return np.sin(np.pi * x) * np.sin(np.pi * y)


def _heat(nt, method):
    return Heat2D(x_start=0, x_end=1, y_start=0, y_end=1, nx=17, ny=17,
                  a=1.0, rhs=_rhs, init_cond=_ic,
                  t_interval=np.linspace(0, 1, nt), basis='spectral',
                  method=method)


@pytest.mark.core
@pytest.mark.parametrize("method", [
    pytest.param("BE", marks=pytest.mark.slow), "CN"])
def test_heat2d_spectral_affine_coeffs_consistent_with_step(method):
    app = _heat(9, method)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(15, 15)))
    A, c = app.affine_coeffs(0.125, 0.25)
    np.testing.assert_allclose(np.asarray(app.step(u, 0.125, 0.25)),
                               np.asarray(A * u + c), rtol=1e-12, atol=1e-14)


@pytest.mark.core
def test_heat2d_spectral_prefix_history_and_solution_match():
    def build():
        return [_heat(257, 'CN'), _heat(33, 'CN')]
    seq = Mgrit(problem=build(), tol=1e-300, max_iter=4, logging_lvl=40)
    rs = seq.solve_compiled()
    pfx = Mgrit(problem=build(), tol=1e-300, max_iter=4, logging_lvl=40,
                coarsest_prefix=True)
    rp = pfx.solve_compiled()
    np.testing.assert_allclose(np.asarray(rp['conv']),
                               np.asarray(rs['conv']), rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(pfx.u[0])[0]),
        np.asarray(jax.tree_util.tree_leaves(seq.u[0])[0]),
        rtol=1e-9, atol=1e-12)


@pytest.mark.core
def test_heat1d_spectral_prefix_history_matches():
    from pymgrit_tpu import Heat1D

    def build():
        return [Heat1D(x_start=0, x_end=2, nx=33, a=1.0,
                       init_cond=lambda x: np.sin(np.pi * x / 2),
                       rhs=lambda x, t: jnp.sin(t) * jnp.ones_like(x * t),
                       basis='spectral',
                       t_interval=np.linspace(0, 2, nt))
                for nt in (257, 33)]
    seq = Mgrit(problem=build(), tol=1e-300, max_iter=4, logging_lvl=40)
    rs = seq.solve_compiled()['conv']
    pfx = Mgrit(problem=build(), tol=1e-300, max_iter=4, logging_lvl=40,
                coarsest_prefix=True)
    rp = pfx.solve_compiled()['conv']
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rs),
                               rtol=1e-9, atol=1e-13)


@pytest.mark.core
def test_prefix_f_cycle_and_jump_criterion_match_scan():
    # the prefix path must hold everywhere _forward_solve is reached:
    # F-cycles re-enter the coarsest level repeatedly, and conv_crit=1
    # exercises the jump criterion's distinct carry inside the fused loop
    def build():
        d0 = Dahlquist(t_start=0, t_stop=5, nt=513)
        d1 = Dahlquist(t_interval=d0.t[::4])
        d2 = Dahlquist(t_interval=d1.t[::4])
        return [d0, d1, d2]
    for kw in (dict(cycle_type='F'), dict(conv_crit=1)):
        seq = Mgrit(problem=build(), tol=1e-300, max_iter=3,
                    logging_lvl=40, **kw)
        rs = seq.solve_compiled()['conv']
        pfx = Mgrit(problem=build(), tol=1e-300, max_iter=3,
                    logging_lvl=40, coarsest_prefix=True, **kw)
        rp = pfx.solve_compiled()['conv']
        np.testing.assert_allclose(np.asarray(rp), np.asarray(rs),
                                   rtol=1e-9, atol=1e-13)


@pytest.mark.core
def test_prefix_requires_affine_capability():
    phys = [Heat2D(x_start=0, x_end=1, y_start=0, y_end=1, nx=9, ny=9,
                   a=1.0, init_cond=_ic, t_interval=np.linspace(0, 1, nt))
            for nt in (33, 9)]
    with pytest.raises(Exception, match="affine_coeffs"):
        Mgrit(problem=phys, logging_lvl=40, coarsest_prefix=True)
