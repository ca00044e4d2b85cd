"""Partition arithmetic vs the reference, computed live.

Replicates the reference's most important unit-test pattern
(tests/core/test_mgrit.py:86-218): the decomposition is pure arithmetic, so
simulate every rank in-process and compare our rank_partition tables against
the reference solver's setup_points_and_comm_info fields, field by field.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "tools", "mpi4py_stub"))
sys.path.insert(0, "/root/reference/src")

from pymgrit_tpu.core.partition import split_into, split_points, rank_partition


def test_split_into_and_points():
    """Golden values from reference tests/core/test_mgrit.py:33-57."""
    np.testing.assert_equal(split_into(10, 3), np.array([4, 3, 3]))
    assert split_points(10, 3, 0) == (4, 0)
    assert split_points(10, 3, 1) == (3, 4)
    assert split_points(10, 3, 2) == (3, 7)


@pytest.mark.parametrize("n_ranks", [1, 2, 3, 4, 5, 6, 7])
def test_rank_tables_vs_reference(n_ranks):
    from pymgrit.heat.heat_1d import Heat1D as RefHeat1D
    from pymgrit.core.mgrit import Mgrit as RefMgrit

    def ic(x):
        return np.sin(np.pi * x)

    probs = [RefHeat1D(x_start=0, x_end=2, nx=5, a=1, init_cond=ic,
                       t_start=0, t_stop=2, nt=nt) for nt in (65, 17, 5)]
    t_grids = [p.t for p in probs]

    for rank in range(n_ranks):
        ref = RefMgrit(problem=[RefHeat1D(x_start=0, x_end=2, nx=5, a=1, init_cond=ic,
                                          t_start=0, t_stop=2, nt=nt) for nt in (65, 17, 5)],
                       nested_iteration=False, max_iter=1, logging_lvl=30)
        # Reference pattern: overwrite rank/size and recompute the tables
        ref.comm_time_rank = rank
        ref.comm_time_size = n_ranks
        ref.int_start = 0
        ref.int_stop = 0
        ref.cpts = []
        ref.comm_front = []
        ref.comm_back = []
        ref.index_local = []
        ref.index_local_c = []
        ref.index_local_f = []
        ref.first_is_c_point = []
        ref.first_is_f_point = []
        ref.last_is_c_point = []
        ref.last_is_f_point = []
        ref.send_to = []
        ref.get_from = []
        ref.global_t = []
        ref.t = [None] * 3
        for lvl in range(3):
            ref.setup_points_and_comm_info(lvl=lvl)

        ours = rank_partition(t_grids, n_ranks, rank)
        for lvl in range(3):
            v = ours[lvl]
            np.testing.assert_array_equal(v.cpts, ref.cpts[lvl], err_msg=f"cpts r{rank} l{lvl}")
            np.testing.assert_array_equal(v.index_local, ref.index_local[lvl])
            np.testing.assert_array_equal(v.index_local_c, ref.index_local_c[lvl])
            np.testing.assert_array_equal(np.sort(v.index_local_f),
                                          np.sort(ref.index_local_f[lvl]))
            assert v.first_is_c_point == ref.first_is_c_point[lvl]
            assert v.first_is_f_point == ref.first_is_f_point[lvl]
            assert v.last_is_c_point == ref.last_is_c_point[lvl]
            assert v.last_is_f_point == ref.last_is_f_point[lvl]
            assert v.comm_front == ref.comm_front[lvl]
            assert v.comm_back == ref.comm_back[lvl]
            assert v.send_to == ref.send_to[lvl]
            assert v.get_from == ref.get_from[lvl]
            np.testing.assert_array_equal(v.t_local, ref.t[lvl])
