"""shard_map executor vs the serial solver: identical residual histories on
an 8-way virtual mesh (the reference's rank-count invariance, realized with
explicit ppermute halos instead of MPI messages)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pymgrit_tpu import Mgrit, Dahlquist, Heat2D
from pymgrit_tpu.parallel.sharding import make_time_space_mesh
from pymgrit_tpu.parallel.shard_solver import ShardedMgrit


def _dahlquist(nts):
    return [Dahlquist(t_start=0, t_stop=5, nt=nt) for nt in nts]


def test_two_level_matches_serial():
    # nt=129: J = 64 intervals over 8 shards
    serial = Mgrit(problem=_dahlquist((129, 65)), tol=1e-10, logging_lvl=30)
    base = serial.solve()['conv']

    mesh = make_time_space_mesh(n_time=8, n_space=1)
    sm = ShardedMgrit(problem=_dahlquist((129, 65)), mesh=mesh, tol=1e-10,
                      logging_lvl=30)
    conv = sm.solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)

    # solutions agree too
    u_serial = np.asarray(serial.u[0])
    u_sm = np.asarray(sm.fine_solution())
    np.testing.assert_allclose(u_sm, u_serial, atol=1e-12)


def test_three_level_fcycle_matches_serial():
    nts = (257, 65, 17)
    kw = dict(tol=1e-10, cycle_type='F', cf_iter=1, logging_lvl=30)
    base = Mgrit(problem=_dahlquist(nts), **kw).solve()['conv']
    mesh = make_time_space_mesh(n_time=4, n_space=1)
    conv = ShardedMgrit(problem=_dahlquist(nts), mesh=mesh, **kw).solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)


def test_heat2d_matches_serial():
    def build():
        def rhs(x, y, t):
            return 5 * x * (1 - x) * y * (1 - y) + 0 * t

        h0 = Heat2D(x_start=0, x_end=1, y_start=0, y_end=1, nx=17, ny=19, a=1.0,
                    rhs=rhs, t_start=0, t_stop=1, nt=65)
        h1 = Heat2D(x_start=0, x_end=1, y_start=0, y_end=1, nx=17, ny=19, a=1.0,
                    rhs=rhs, t_interval=h0.t[::4])
        return [h0, h1]

    kw = dict(tol=1e-11, max_iter=6, logging_lvl=30)
    base = Mgrit(problem=build(), **kw).solve()['conv']
    mesh = make_time_space_mesh(n_time=8, n_space=1)
    conv = ShardedMgrit(problem=build(), mesh=mesh, **kw).solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)


def test_weighted_and_norms():
    nts = (129, 33)
    for kw in (dict(weight_c=1.3), dict(t_norm=1), dict(t_norm=3), dict(cf_iter=2)):
        base = Mgrit(problem=_dahlquist(nts), tol=1e-9, logging_lvl=30, **kw).solve()['conv']
        mesh = make_time_space_mesh(n_time=4, n_space=1)
        conv = ShardedMgrit(problem=_dahlquist(nts), mesh=mesh, tol=1e-9,
                            logging_lvl=30, **kw).solve()['conv']
        assert len(conv) == len(base), kw
        np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15, err_msg=str(kw))


def test_non_uniform_runs_and_matches_serial():
    """Round-3: non-uniform coarsening runs natively on the sharded
    executor (the round-2 raise is gone) — ragged blocks + GS chains; the
    full battery lives in test_shard_nonuniform.py."""
    mesh = make_time_space_mesh(n_time=8, n_space=1)
    t = np.linspace(0, 5, 101)
    idx = np.array([0, 1, 3, 7, 30, 60, 100])

    def mk():
        return [Dahlquist(t_interval=t.copy()),
                Dahlquist(t_interval=t[idx].copy())]

    s = ShardedMgrit(problem=mk(), mesh=mesh, tol=1e-10, max_iter=8,
                     logging_lvl=30)
    assert s._general
    conv_sh = s.solve()['conv']
    conv_core = Mgrit(problem=mk(), tol=1e-10, max_iter=8,
                      logging_lvl=30).solve()['conv']
    assert len(conv_sh) == len(conv_core)
    np.testing.assert_allclose(conv_sh, conv_core, rtol=1e-7, atol=1e-12)


def test_padded_nondivisible_matches_serial():
    """J=50 intervals over 8 shards (non-divisible): phantom-interval padding
    must reproduce the serial history exactly — the README nt=101 config."""
    serial = Mgrit(problem=_dahlquist((101, 51)), tol=1e-10, logging_lvl=30)
    base = serial.solve()['conv']

    mesh = make_time_space_mesh(n_time=8, n_space=1)
    sm = ShardedMgrit(problem=_dahlquist((101, 51)), mesh=mesh, tol=1e-10,
                      logging_lvl=30)
    conv = sm.solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)

    u_serial = np.asarray(serial.u[0])
    u_sm = np.asarray(sm.fine_solution())
    np.testing.assert_allclose(u_sm, u_serial, atol=1e-12)


def test_padded_three_level_matches_serial():
    """3-level with padding on every level: nt=101/51/26 over 8 shards
    (J0=50, J1=25, coarsest 25 points — none divisible by 8)."""
    nts = (101, 51, 26)
    kw = dict(tol=1e-10, logging_lvl=30)
    base = Mgrit(problem=_dahlquist(nts), **kw).solve()['conv']
    mesh = make_time_space_mesh(n_time=8, n_space=1)
    conv = ShardedMgrit(problem=_dahlquist(nts), mesh=mesh, **kw).solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)


def test_padded_fcycle_weighted_matches_serial():
    """Padding composed with F-cycles, cf_iter=2 and weighted C-relax."""
    nts = (81, 41, 21)
    kw = dict(tol=1e-10, cycle_type='F', cf_iter=2, weight_c=1.3, logging_lvl=30)
    base = Mgrit(problem=_dahlquist(nts), **kw).solve()['conv']
    mesh = make_time_space_mesh(n_time=8, n_space=1)
    conv = ShardedMgrit(problem=_dahlquist(nts), mesh=mesh, **kw).solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)


def test_spatial_coarsening_matches_serial():
    """Spatial transfer operators in the sharded executor (full-weighting
    restriction between per-level nx grids)."""
    from pymgrit_tpu import Heat1D, GridTransferCopy
    from pymgrit_tpu.models.grid_transfer_heat import GridTransferHeat

    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - jnp.pi ** 2 * jnp.cos(t))

    def ic(x):
        return np.sin(np.pi * x)

    def build():
        h0 = Heat1D(x_start=0, x_end=2, nx=2 ** 4 + 1, a=1, rhs=rhs, init_cond=ic,
                    t_start=0, t_stop=2, nt=65)
        h1 = Heat1D(x_start=0, x_end=2, nx=2 ** 3 + 1, a=1, rhs=rhs, init_cond=ic,
                    t_interval=h0.t[::2])
        h2 = Heat1D(x_start=0, x_end=2, nx=2 ** 3 + 1, a=1, rhs=rhs, init_cond=ic,
                    t_interval=h1.t[::2])
        return [h0, h1, h2], [GridTransferHeat(), GridTransferCopy()]

    probs, tr = build()
    base = Mgrit(problem=probs, transfer=tr, tol=1e-9, logging_lvl=30).solve()['conv']
    probs, tr = build()
    mesh = make_time_space_mesh(n_time=4, n_space=1)
    conv = ShardedMgrit(problem=probs, transfer=tr, mesh=mesh, tol=1e-9,
                        logging_lvl=30).solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)


def test_compiled_sharded_loop():
    """The device-resident sharded loop matches the host-driven one."""
    base = ShardedMgrit(problem=_dahlquist((129, 65)),
                        mesh=make_time_space_mesh(n_time=8, n_space=1),
                        tol=1e-10, logging_lvl=30).solve()['conv']
    sm = ShardedMgrit(problem=_dahlquist((129, 65)),
                      mesh=make_time_space_mesh(n_time=8, n_space=1),
                      tol=1e-10, logging_lvl=30)
    conv = sm.solve_compiled()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-10)


def test_sharded_at_mgrit_matches_core():
    """ShardedAtMgrit reproduces the core AtMgrit's history."""
    from pymgrit_tpu import AtMgrit
    from pymgrit_tpu.parallel.shard_solver import ShardedAtMgrit

    kw = dict(tol=1e-9, max_iter=12, logging_lvl=30)
    base = AtMgrit(k=4, problem=_dahlquist((129, 33)), **kw).solve()['conv']
    mesh = make_time_space_mesh(n_time=8, n_space=1)
    conv = ShardedAtMgrit(k=4, problem=_dahlquist((129, 33)), mesh=mesh,
                          **kw).solve()['conv']
    assert len(conv) == len(base), (conv, base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)


def test_sharded_at_mgrit_vector_state():
    """Vector-valued states through the sharded AT-MGRIT coarsest solve."""
    from pymgrit_tpu import AtMgrit, Heat1D
    from pymgrit_tpu.parallel.shard_solver import ShardedAtMgrit

    def rhs(x, t):
        return -jnp.sin(jnp.pi * x) * (jnp.sin(t) - jnp.pi ** 2 * jnp.cos(t))

    def build():
        h0 = Heat1D(x_start=0, x_end=2, nx=33, a=1, rhs=rhs,
                    init_cond=lambda x: np.sin(np.pi * x), t_start=0, t_stop=2, nt=129)
        h1 = Heat1D(x_start=0, x_end=2, nx=33, a=1, rhs=rhs,
                    init_cond=lambda x: np.sin(np.pi * x), t_interval=h0.t[::4])
        return [h0, h1]

    kw = dict(tol=1e-9, max_iter=12, logging_lvl=30)
    base = AtMgrit(k=4, problem=build(), **kw).solve()['conv']
    mesh = make_time_space_mesh(n_time=4, n_space=1)
    conv = ShardedAtMgrit(k=4, problem=build(), mesh=mesh, **kw).solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)


def test_sharded_at_mgrit_padded():
    """AT-MGRIT truncated coarsest solve composed with phantom-interval
    padding (nt=101/26: J=25 windows over 8 shards, non-divisible)."""
    from pymgrit_tpu import AtMgrit
    from pymgrit_tpu.parallel.shard_solver import ShardedAtMgrit

    kw = dict(tol=1e-9, max_iter=15, logging_lvl=30)
    base = AtMgrit(k=5, problem=_dahlquist((101, 26)), **kw).solve()['conv']
    mesh = make_time_space_mesh(n_time=8, n_space=1)
    conv = ShardedAtMgrit(k=5, problem=_dahlquist((101, 26)), mesh=mesh,
                          **kw).solve()['conv']
    assert len(conv) == len(base), (conv, base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)


def test_conv_criteria_match_serial():
    """conv_crit 1 (global jump), 2 (local residual), 3 (local jump) in the
    sharded executor reproduce the general solver's histories and stopping
    points (the reference's per-rank handshake protocol collapses into a
    reduced all())."""
    nts = (129, 33)
    mesh = make_time_space_mesh(n_time=4, n_space=1)
    for crit in (1, 2, 3):
        kw = dict(tol=1e-8, conv_crit=crit, logging_lvl=30)
        base = Mgrit(problem=_dahlquist(nts), **kw).solve()['conv']
        conv = ShardedMgrit(problem=_dahlquist(nts), mesh=mesh, **kw).solve()['conv']
        assert len(conv) == len(base), (crit, conv, base)
        np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15,
                                   err_msg=f"conv_crit={crit}")


def test_conv_criteria_compiled_loop():
    """The device-resident sharded loop honors jump/local criteria too."""
    nts = (101, 51)   # non-divisible: padding composed with criteria
    mesh = make_time_space_mesh(n_time=8, n_space=1)
    for crit in (1, 3):
        kw = dict(tol=1e-8, conv_crit=crit, logging_lvl=30)
        base = Mgrit(problem=_dahlquist(nts), **kw).solve()['conv']
        conv = ShardedMgrit(problem=_dahlquist(nts), mesh=mesh,
                            **kw).solve_compiled()['conv']
        assert len(conv) == len(base), (crit, conv, base)
        np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15,
                                   err_msg=f"conv_crit={crit}")


def test_nonuniform_dt_matches_serial():
    """Stretched (geometric) time grid with uniform coarsening: the padded
    block times are taken from the real grid per block, so arbitrary dt
    profiles shard exactly (the reference supports any nested t_interval,
    mgrit.py:93-96)."""
    t = np.geomspace(1, 6, 65) - 1.0
    def build():
        return [Dahlquist(t_interval=t), Dahlquist(t_interval=t[::2]),
                Dahlquist(t_interval=t[::4])]
    base_solver = Mgrit(problem=build(), tol=1e-10, logging_lvl=30)
    base = base_solver.solve()['conv']
    mesh = make_time_space_mesh(n_time=8, n_space=1)
    sm = ShardedMgrit(problem=build(), mesh=mesh, tol=1e-10, logging_lvl=30)
    conv = sm.solve()['conv']
    assert len(conv) == len(base)
    np.testing.assert_allclose(conv, base, rtol=1e-6, atol=1e-15)
    np.testing.assert_allclose(np.asarray(sm.fine_solution()),
                               np.asarray(base_solver.u[0])[:65], atol=1e-12)
