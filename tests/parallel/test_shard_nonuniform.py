"""Non-uniform coarsening on the shard_map executor (round-3, VERDICT r2
missing-#3): ragged per-block lengths, adjacent-C-point Gauss-Seidel passes,
trailing F-points, all_gather level transitions.

Golden anchor: the reference's distributed varying-coarsening matrix
(/root/reference/tests/mpi/varying_coarsening.py:12-20, golden history
tests/mpi/results/varying_coarsening, 6 iterations 3.73e-2 ... 4.82e-13),
which the reference runs at np=1..7; here at 1/2/4/8 shards.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from pymgrit_tpu import Mgrit, Dahlquist, Heat1D
from pymgrit_tpu.parallel.shard_solver import ShardedMgrit

GOLDEN = [0.037311841611405, 0.003124171062320715, 3.129166834664884e-05,
          1.8514542798812671e-07, 4.995916285724713e-10, 4.82164655680165e-13]


def _varying_problem():
    d0 = Dahlquist(t_start=0, t_stop=5, nt=65)
    t1 = d0.t[[0, 3, 10, 12, 14, 17, 23, 27, 33, 34, 55, 57, 59, 61, 63, 64]]
    grids = [d0.t, t1, t1[::2], t1[::2][::2], t1[::2][::2][::2]]
    return [Dahlquist(t_interval=g.copy()) for g in grids]


def _mesh(n):
    return Mesh(np.array(jax.devices("cpu")[:n]), ("time",))


def test_varying_coarsening_golden_core():
    conv = Mgrit(problem=_varying_problem(), tol=1e-10,
                 nested_iteration=False, logging_lvl=30).solve()['conv']
    np.testing.assert_allclose(conv, GOLDEN, rtol=1e-6, atol=1e-15)


@pytest.mark.parametrize("n_shards", [1, 2, 4, 8])
def test_varying_coarsening_golden_sharded(n_shards):
    s = ShardedMgrit(problem=_varying_problem(), mesh=_mesh(n_shards),
                     tol=1e-10, nested_iteration=False, logging_lvl=30)
    assert s._general
    conv = s.solve()['conv']
    np.testing.assert_allclose(conv, GOLDEN, rtol=1e-6, atol=1e-15)


def test_varying_coarsening_sharded_compiled():
    s = ShardedMgrit(problem=_varying_problem(), mesh=_mesh(4), tol=1e-10,
                     nested_iteration=False, logging_lvl=30)
    conv = s.solve_compiled()['conv']
    np.testing.assert_allclose(conv, GOLDEN, rtol=1e-6, atol=1e-15)


def test_varying_coarsening_nested_and_fcycle():
    """Nested iteration + F-cycles through the general path must match the
    core executor exactly."""
    for kw in (dict(nested_iteration=True),
               dict(nested_iteration=True, cycle_type='F'),
               dict(nested_iteration=False, cf_iter=2, weight_c=1.3)):
        conv_core = Mgrit(problem=_varying_problem(), tol=1e-10,
                          logging_lvl=30, **kw).solve()['conv']
        conv_sh = ShardedMgrit(problem=_varying_problem(), mesh=_mesh(4),
                               tol=1e-10, logging_lvl=30, **kw).solve()['conv']
        assert len(conv_core) == len(conv_sh), (kw, conv_core, conv_sh)
        np.testing.assert_allclose(conv_sh, conv_core, rtol=1e-7, atol=1e-12)


def test_trailing_f_point_heat1d():
    """A hierarchy whose coarse grid drops the final time point (the
    reference's t[::2] slicing with even nt): the last point is an F-point,
    relaxed in F-relaxation and excluded from the residual measurement."""
    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - jnp.pi ** 2 * jnp.cos(t))

    def mk(t_interval):
        return Heat1D(x_start=0, x_end=1, nx=17, a=1, rhs=rhs,
                      init_cond=lambda x: np.sin(np.pi * x),
                      t_interval=t_interval)

    t0 = np.linspace(0, 2, 32)                 # even count -> trailing F
    grids = [t0, t0[::2], t0[::2][::2]]
    conv_core = Mgrit(problem=[mk(g.copy()) for g in grids], tol=1e-9,
                      max_iter=10, logging_lvl=30).solve()['conv']
    s = ShardedMgrit(problem=[mk(g.copy()) for g in grids], mesh=_mesh(4),
                     tol=1e-9, max_iter=10, logging_lvl=30)
    assert s._general and s.g_trailing[0]
    conv_sh = s.solve()['conv']
    assert len(conv_core) == len(conv_sh)
    np.testing.assert_allclose(conv_sh, conv_core, rtol=1e-7, atol=1e-12)
    # the gathered fine solution matches the core executor's tube
    m_core = Mgrit(problem=[mk(g.copy()) for g in grids], tol=1e-9,
                   max_iter=10, logging_lvl=30)
    m_core.solve()
    np.testing.assert_allclose(np.asarray(s.fine_solution()),
                               np.asarray(m_core.u[0]), rtol=1e-8, atol=1e-12)


def test_adjacent_cpoints_jump_criterion():
    """Adjacent C-points (Gauss-Seidel chains) + jump criterion through the
    general path."""
    probs = _varying_problem()[:2]
    t0, t1 = probs[0].t, probs[1].t
    mk = lambda: [Dahlquist(t_interval=t0.copy()), Dahlquist(t_interval=t1.copy())]
    conv_core = Mgrit(problem=mk(), tol=1e-10, conv_crit=1,
                      nested_iteration=False, logging_lvl=30).solve()['conv']
    conv_sh = ShardedMgrit(problem=mk(), mesh=_mesh(4), tol=1e-10,
                           conv_crit=1, nested_iteration=False,
                           logging_lvl=30).solve()['conv']
    assert len(conv_core) == len(conv_sh)
    np.testing.assert_allclose(conv_sh, conv_core, rtol=1e-7, atol=1e-12)


def test_fine_solution_roundtrip_nonuniform():
    """fine_solution() reassembles the ragged blocks into the exact core
    executor tube."""
    m_core = Mgrit(problem=_varying_problem(), tol=1e-10,
                   nested_iteration=False, logging_lvl=30)
    m_core.solve()
    s = ShardedMgrit(problem=_varying_problem(), mesh=_mesh(4), tol=1e-10,
                     nested_iteration=False, logging_lvl=30)
    s.solve()
    np.testing.assert_allclose(np.asarray(s.fine_solution()),
                               np.asarray(m_core.u[0]), rtol=1e-9, atol=1e-13)


def test_nonuniform_dd_matches_core():
    """DD (double-double) states through the ragged sharded path: histories
    match the core executor's DD run."""
    def mk():
        t = np.linspace(0, 5, 65)
        idx = np.array([0, 3, 10, 12, 14, 17, 23, 27, 33, 34, 55, 57, 59,
                        61, 63, 64])
        return [Dahlquist(t_interval=t.copy(), precision='dd'),
                Dahlquist(t_interval=t[idx].copy(), precision='dd'),
                Dahlquist(t_interval=t[idx][::2].copy(), precision='dd')]

    conv_core = Mgrit(problem=mk(), tol=1e-10, max_iter=6,
                      nested_iteration=False, logging_lvl=30).solve()['conv']
    s = ShardedMgrit(problem=mk(), mesh=_mesh(4), tol=1e-10, max_iter=6,
                     nested_iteration=False, logging_lvl=30)
    assert s._general
    conv_sh = s.solve()['conv']
    assert len(conv_core) == len(conv_sh)
    np.testing.assert_allclose(conv_sh, conv_core, rtol=1e-6, atol=1e-12)


def test_nonuniform_atmgrit_sharded():
    """ShardedAtMgrit (distance-k windowed coarsest) on a ragged hierarchy
    matches the core AtMgrit."""
    from pymgrit_tpu.core.at_mgrit import AtMgrit
    from pymgrit_tpu.parallel.shard_solver import ShardedAtMgrit

    def mk():
        t = np.linspace(0, 5, 65)
        idx = np.array([0, 3, 10, 12, 14, 17, 23, 27, 33, 34, 55, 57, 59,
                        61, 63, 64])
        return [Dahlquist(t_interval=t.copy()),
                Dahlquist(t_interval=t[idx].copy())]

    conv_core = AtMgrit(3, problem=mk(), tol=1e-10, max_iter=6,
                        nested_iteration=False, logging_lvl=30).solve()['conv']
    s = ShardedAtMgrit(3, problem=mk(), mesh=_mesh(4), tol=1e-10, max_iter=6,
                       nested_iteration=False, logging_lvl=30)
    assert s._general
    conv_sh = s.solve()['conv']
    assert len(conv_core) == len(conv_sh), (conv_core, conv_sh)
    np.testing.assert_allclose(conv_sh, conv_core, rtol=1e-6, atol=1e-12)
