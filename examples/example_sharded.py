"""Production sharded solve: ShardedMgrit with explicit ppermute halos over
a 'time' device mesh (run with 8 virtual CPU devices or on a pod slice):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/example_sharded.py
"""

import jax

from pymgrit_tpu import Dahlquist
from pymgrit_tpu.parallel.sharding import make_time_space_mesh
from pymgrit_tpu.parallel.shard_solver import ShardedMgrit


def main():
    n = len(jax.devices())
    mesh = make_time_space_mesh(n_time=n, n_space=1)
    nt = 32 * n + 1   # interval count divisible over the shards

    solver = ShardedMgrit(problem=[Dahlquist(t_start=0, t_stop=5, nt=nt),
                                   Dahlquist(t_start=0, t_stop=5, nt=nt // 2 + 1)],
                          mesh=mesh, tol=1e-10)
    return solver.solve()


if __name__ == '__main__':
    main()
