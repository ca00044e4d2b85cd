"""Measure the reference PyMGRIT on the bench config (serial, CPU, f64).

Run with: PYTHONPATH=tools/mpi4py_stub:/root/reference/src python tools/bench_reference.py
Prints one JSON line with solve time, iterations, and fine-level step count.
"""

import json
import sys
import time

import numpy as np

from pymgrit.heat.heat_2d import Heat2D
from pymgrit.core.mgrit import Mgrit


def main(nt=4097, nx=65, ny=65, levels=4, m=4, tol=1e-7, max_iter=10, ms=None):
    problem = []
    t = np.linspace(0, 1, nt)
    if ms is None:
        ms = [m] * (levels - 1)
    stride = 1
    for lvl in range(levels):
        problem.append(Heat2D(x_start=0, x_end=1, y_start=0, y_end=1, nx=nx, ny=ny,
                              a=1.0,
                              rhs=lambda x, y, t: np.sin(np.pi * x) * np.sin(np.pi * y) * np.ones_like(t * x * y),
                              init_cond=lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y),
                              t_interval=t[::stride]))
        if lvl < len(ms):
            stride *= ms[lvl]

    # Count fine-level step evaluations
    counter = {"n": 0}
    orig_step = problem[0].step

    def counted_step(u_start, t_start, t_stop):
        counter["n"] += 1
        return orig_step(u_start=u_start, t_start=t_start, t_stop=t_stop)

    problem[0].step = counted_step

    mgrit = Mgrit(problem=problem, tol=tol, max_iter=max_iter, logging_lvl=30)
    setup_steps = counter["n"]
    t0 = time.time()
    info = mgrit.solve()
    solve_time = time.time() - t0
    solve_steps = counter["n"] - setup_steps
    print(json.dumps({
        "framework": "pymgrit-reference",
        "config": f"heat_2d {nx}x{ny} nt={nt} levels={levels} m={m}",
        "iterations": len(info["conv"]),
        "conv": [float(c) for c in info["conv"]],
        "solve_time_s": solve_time,
        "setup_time_s": info["time_setup"],
        "fine_steps_in_solve": solve_steps,
        "steps_per_sec": solve_steps / solve_time,
    }))


if __name__ == "__main__":
    # args: nt [nx [ny [levels [m [max_iter [ms]]]]]] — steps/s is dominated
    # by per-step spsolve cost, so a reduced nt at the same spatial size
    # measures the same steps/s as the full TOMS-scale run; passing the full
    # nt with a bounded max_iter measures it directly (one iteration at the
    # TOMS scale is ~49k fine steps).  ms = comma-separated per-level
    # coarsening (e.g. 32,16,4,4) overriding the uniform m.
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 4097
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 65
    ny = int(sys.argv[3]) if len(sys.argv) > 3 else nx
    levels = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    m = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    max_iter = int(sys.argv[6]) if len(sys.argv) > 6 else 10
    ms = ([int(x) for x in sys.argv[7].split(",")]
          if len(sys.argv) > 7 else None)
    main(nt=nt, nx=nx, ny=ny, levels=levels, m=m, max_iter=max_iter, ms=ms)
