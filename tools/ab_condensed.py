"""Round-4 on-chip A/B: condensed level-0 carry vs full-tube executors.

Protocol (memory/tpu-ab-protocol): warm solve_compiled, reset conv, time the
second end-to-end call.  Rows:
  - core condensed  (round-4)          spectral + physical
  - core full-tube  (round-3 state)    spectral + physical
  - shard_map 1-dev (round-3 headline) spectral
at the TOMS example-3 scale (129^2, nt=16385, 5-level 32/16/4/4).
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("PYMGRIT_TPU_NO_X64", "1")   # f64 emulation on TPU is
# 10x slower and OOMs — same guard as bench.main (learned the hard way)


def main(nx=129, nt=2 ** 14 + 1, ms=(32, 16, 4, 4), iters=5):
    import jax
    sys.path.insert(0, ".")
    from bench import build_problem, count_fine_steps_per_iter
    from pymgrit_tpu import Mgrit

    out = {}

    def timed(name, mk):
        jax.clear_caches()
        m = mk()
        info = m.solve_compiled()
        conv = [float(c) for c in info["conv"]]
        m.conv = np.zeros(m.iter_max + 1)
        t0 = time.time()
        m.solve_compiled()
        jax.block_until_ready(m.u[0])
        dt = time.time() - t0
        steps = sum(count_fine_steps_per_iter(m, it == 0)
                    for it in range(len(conv)))
        out[name] = {"solve_time_s": round(dt, 4),
                     "steps_per_sec": round(steps / dt, 1),
                     "conv": [float(f"{c:.4e}") for c in conv]}
        print(name, out[name], flush=True)
        del m

    cfg = dict(nx=nx, ny=nx, nt=nt, ms=list(ms))
    for basis in ("spectral", "physical"):
        for cond in (True, False):
            nm = f"core_{basis}_{'condensed' if cond else 'fulltube'}"
            timed(nm, lambda basis=basis, cond=cond: Mgrit(
                problem=build_problem(basis=basis, **cfg), tol=1e-300,
                max_iter=iters, logging_lvl=30, condensed=cond))

    from jax.sharding import Mesh
    from pymgrit_tpu.parallel.shard_solver import ShardedMgrit

    def mk_sharded():
        mesh = Mesh(np.array(jax.devices()[:1]), ("time",))
        return ShardedMgrit(problem=build_problem(basis="spectral", **cfg),
                            mesh=mesh, tol=1e-300, max_iter=iters,
                            logging_lvl=30)

    jax.clear_caches()
    s = mk_sharded()
    info = s.solve_compiled()
    conv = [float(c) for c in info["conv"]]
    s.conv = np.zeros(s.iter_max + 1)
    t0 = time.time()
    s.solve_compiled()
    jax.block_until_ready(s.state[0]["blocks"])
    dt = time.time() - t0

    class _A:
        levels = s.levels
        cf_iter = s.cf_iter
    steps = sum(count_fine_steps_per_iter(_A, it == 0)
                for it in range(len(conv)))
    out["sharded_spectral"] = {"solve_time_s": round(dt, 4),
                               "steps_per_sec": round(steps / dt, 1),
                               "conv": [float(f"{c:.4e}") for c in conv]}
    print("sharded_spectral", out["sharded_spectral"], flush=True)
    print("ABRESULT" + json.dumps(out), flush=True)


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["nx"] = int(sys.argv[1])
    main(**kw)
