"""Fast distributed smoke for the core tier: both executors reproduce the
serial Dahlquist history on an 8-device mesh in seconds (the heavy parity
matrices live in the slow tier: test_shard_solver / test_shard_features /
test_shard_nonuniform / test_mesh_invariance)."""

import numpy as np
import jax
from jax.sharding import Mesh

from pymgrit_tpu import Mgrit, Dahlquist, simple_setup_problem
from pymgrit_tpu.parallel.shard_solver import ShardedMgrit


def _build():
    return simple_setup_problem(problem=Dahlquist(t_start=0, t_stop=5, nt=101),
                                level=3, coarsening=2)


def test_both_executors_match_serial():
    conv = Mgrit(problem=_build(), tol=1e-10, logging_lvl=30).solve()['conv']
    mesh8 = Mesh(np.array(jax.devices("cpu")[:8]).reshape(8, 1),
                 ("time", "space"))
    conv_g = Mgrit(problem=_build(), mesh=mesh8, tol=1e-10,
                   logging_lvl=30).solve()['conv']
    s = ShardedMgrit(problem=_build(),
                     mesh=Mesh(np.array(jax.devices("cpu")[:8]), ("time",)),
                     tol=1e-10, logging_lvl=30)
    conv_s = s.solve_compiled()['conv']
    assert len(conv) == len(conv_g) == len(conv_s)
    np.testing.assert_allclose(conv_g, conv, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(conv_s, conv, rtol=1e-9, atol=1e-13)
