"""Round-2 ShardedMgrit features: 2D ('time','space') mesh, feature parity
with the general solver (output hooks, random init, overridable convergence
criterion), and the distance-k windowed AT-MGRIT coarsest exchange.

Reference anchors: comm_space delegation (mgrit.py:130-138 +
split_communicator, split.py:10-30), output_fcn semantics (mgrit.py:55-59,
198-203, 242-243, 625-626), random_init_guess (mgrit.py:854-856),
convergence_criterion subclassing (examples/example_convergence_criterion.py),
AT-MGRIT's k-window communication (at_mgrit.py:45-76).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pymgrit_tpu import Mgrit, Dahlquist, Heat2D
from pymgrit_tpu.parallel.sharding import make_time_space_mesh
from pymgrit_tpu.parallel.shard_solver import ShardedMgrit, ShardedAtMgrit


def _dahlquist(nts):
    return [Dahlquist(t_start=0, t_stop=5, nt=nt) for nt in nts]


def _heat2d(nts):
    def rhs(x, y, t):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.ones_like(t * x * y)

    def ic(x, y):
        return np.sin(np.pi * x) * np.sin(np.pi * y)

    return [Heat2D(x_start=0, x_end=1, y_start=0, y_end=1, nx=10, ny=12,
                   a=1.0, rhs=rhs, init_cond=ic, t_start=0, t_stop=1, nt=nt)
            for nt in nts]


def test_heat2d_time_space_2d_mesh_matches_serial():
    """(4,2) ('time','space') mesh: explicit time halos + GSPMD space
    sharding of the state's x axis inside the shard_map body."""
    nts = (65, 17, 5)
    base_solver = Mgrit(problem=_heat2d(nts), tol=1e-9, logging_lvl=30)
    base = base_solver.solve()['conv']
    mesh = make_time_space_mesh(n_time=4, n_space=2)
    sm = ShardedMgrit(problem=_heat2d(nts), mesh=mesh, tol=1e-9, logging_lvl=30)
    conv = sm.solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)
    np.testing.assert_allclose(np.asarray(sm.fine_solution()),
                               np.asarray(base_solver.u[0]), atol=1e-10)


def test_heat2d_2d_mesh_compiled_loop():
    nts = (33, 9, 3)
    mesh = make_time_space_mesh(n_time=4, n_space=2)
    base = Mgrit(problem=_heat2d(nts), tol=1e-9, logging_lvl=30).solve()['conv']
    conv = ShardedMgrit(problem=_heat2d(nts), mesh=mesh, tol=1e-9,
                        logging_lvl=30).solve_compiled()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)


def test_output_fcn_levels_match_mgrit():
    """output_lvl=2 fires after setup + per iteration; output_lvl=1 once at
    the end; the hook sees reference-style self.t/self.index_local/self.u."""
    mesh = make_time_space_mesh(n_time=4, n_space=1)
    for lvl, expect_extra in ((1, 1), (2, None), (0, 0)):
        calls = []

        def hook(solver):
            u0 = np.asarray(solver.u[0])
            assert u0.shape[0] == len(solver.t[0]) == 129
            calls.append(solver.solve_iter)

        sm = ShardedMgrit(problem=_dahlquist((129, 33)), mesh=mesh, tol=1e-8,
                          output_fcn=hook, output_lvl=lvl, logging_lvl=30)
        n_setup_calls = len(calls)
        info = sm.solve()
        iters = len(info['conv'])
        if lvl == 0:
            assert calls == []
        elif lvl == 1:
            assert len(calls) == 1
        else:
            assert n_setup_calls == 1          # post-setup call
            assert len(calls) == 1 + iters     # + one per iteration


def test_random_init_guess_matches_mgrit():
    """Same PRNG seed -> same random fine tube -> identical histories
    between the general and the sharded executor."""
    nts = (65, 17)
    kw = dict(tol=1e-9, random_init_guess=True, rng_seed=7,
              nested_iteration=False, logging_lvl=30)
    base = Mgrit(problem=_dahlquist(nts), **kw).solve()['conv']
    mesh = make_time_space_mesh(n_time=4, n_space=1)
    conv = ShardedMgrit(problem=_dahlquist(nts), mesh=mesh, **kw).solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6)


def test_custom_convergence_criterion_subclass():
    """Overriding convergence_criterion drives solve() stopping, mirroring
    the reference's documented subclassing surface."""

    class RelJump(ShardedMgrit):
        def convergence_criterion(self, iteration):
            super().convergence_criterion(iteration)
            self._history = getattr(self, "_history", [])
            self._history.append(self.conv[iteration])
            # loosen: stop once the built-in residual drops 4 orders
            self.conv[iteration] = self.conv[iteration] / 1e-4

    mesh = make_time_space_mesh(n_time=4, n_space=1)
    sm = RelJump(problem=_dahlquist((129, 33)), mesh=mesh, tol=1e-4,
                 logging_lvl=30)
    info = sm.solve()
    # built-in residual would need ~5 iterations to 1e-8; the scaled
    # criterion stops as soon as the raw residual is below 1e-8 * 1e-4...
    assert len(info['conv']) < 10
    assert sm._history[-1] * 1e4 == pytest.approx(info['conv'][-1])


@pytest.mark.parametrize("k", [2, 6, 40])
def test_windowed_at_mgrit_matches_serial(k):
    """The k-window coarsest exchange (single- and multi-hop halos; k=40
    forces ceil((k-1)/J_loc) = 3 ppermute hops at J_loc=16) reproduces the
    serial AtMgrit history."""
    from pymgrit_tpu.core.at_mgrit import AtMgrit
    nts = (129, 65)
    base = AtMgrit(k=k, problem=_dahlquist(nts), tol=1e-9,
                   logging_lvl=30).solve()['conv']
    mesh = make_time_space_mesh(n_time=4, n_space=1)
    conv = ShardedAtMgrit(k=k, problem=_dahlquist(nts), mesh=mesh, tol=1e-9,
                          logging_lvl=30).solve()['conv']
    # at small k MGRIT converges *exactly* on the last iteration (nilpotent
    # error propagation): a residual of literal 0.0 is filtered from the
    # history, so allow a +-1 length difference with a below-tol tail
    n = min(len(conv), len(base))
    assert abs(len(conv) - len(base)) <= 1, (k, conv, base)
    np.testing.assert_allclose(conv[:n - 1], base[:n - 1], rtol=1e-6, atol=1e-15)
    assert conv[len(conv) - 1] < 1e-9 or base[len(base) - 1] < 1e-9 or n == len(conv) == len(base)


def test_dd_precision_sharded_matches_serial():
    """Double-double states in the shard_map executor: 1e-12-class
    residuals with float32 pairs across a time mesh, matching the serial
    DD solver (and the windowed AT-MGRIT variant)."""
    mk = lambda nts: [Dahlquist(t_start=0, t_stop=5, nt=nt, precision='dd')
                      for nt in nts]
    mesh = make_time_space_mesh(n_time=4, n_space=1)
    base = Mgrit(problem=mk((129, 65)), tol=1e-10, logging_lvl=30).solve()['conv']
    conv = ShardedMgrit(problem=mk((129, 65)), mesh=mesh, tol=1e-10,
                        logging_lvl=30).solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-4)
    assert conv[-1] < 1e-10

    from pymgrit_tpu.core.at_mgrit import AtMgrit
    base_at = AtMgrit(k=6, problem=mk((129, 65)), tol=1e-9,
                      logging_lvl=30).solve()['conv']
    conv_at = ShardedAtMgrit(k=6, problem=mk((129, 65)), mesh=mesh, tol=1e-9,
                             logging_lvl=30).solve()['conv']
    n = min(len(conv_at), len(base_at))
    assert abs(len(conv_at) - len(base_at)) <= 1
    np.testing.assert_allclose(conv_at[:n - 1], base_at[:n - 1], rtol=1e-4)


def test_dd_heat2d_sharded_compiled_loop():
    """DD heat_2d in the fused sharded loop on a padded (non-divisible)
    grid: residual reaches the 1e-10 class and matches serial DD."""
    import jax.numpy as jnp

    def mk(nt):
        return Heat2D(x_start=0, x_end=1, y_start=0, y_end=1, nx=10, ny=12,
                      a=1.0,
                      rhs=lambda x, y, t: jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)
                      * jnp.ones_like(t * x * y),
                      init_cond=lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y),
                      t_start=0, t_stop=1, nt=nt, precision='dd')

    mesh = make_time_space_mesh(n_time=4, n_space=1)
    base = Mgrit(problem=[mk(33), mk(9)], tol=1e-10, max_iter=10,
                 logging_lvl=30).solve()['conv']
    conv = ShardedMgrit(problem=[mk(33), mk(9)], mesh=mesh, tol=1e-10,
                        max_iter=10, logging_lvl=30).solve_compiled()['conv']
    assert len(conv) == len(base)
    # the final iteration sits at the DD roundoff floor (~6e-15): compare
    # the pre-floor history tightly, the floor itself only in magnitude
    np.testing.assert_allclose(conv[:-1], base[:-1], rtol=1e-4)
    assert conv[-1] < 1e-10
