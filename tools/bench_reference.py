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


def build_allen_cahn(nt, nx, ms, t_stop):
    """Reference Allen-Cahn hierarchy (reference allen_cahn.py:139-260,
    example_allen_cahn.py:36-40 scaled to an at-scale nt)."""
    from pymgrit.allen_cahn.allen_cahn import AllenCahn
    t = np.linspace(0, t_stop, nt)
    problem, stride = [], 1
    for lvl in range(len(ms) + 1):
        problem.append(AllenCahn(nx=nx, method='IMEX', t_interval=t[::stride]))
        if lvl < len(ms):
            stride *= ms[lvl]
    return problem


def main(nt=4097, nx=65, ny=65, levels=4, m=4, tol=1e-7, max_iter=10, ms=None,
         model="heat2d", t_stop=1.0):
    problem = []
    t = np.linspace(0, t_stop, nt)
    if ms is None:
        ms = [m] * (levels - 1)
    if model == "allen_cahn":
        problem = build_allen_cahn(nt, nx, ms, t_stop)
    else:
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
        "config": f"{model} {nx}x{ny} nt={nt} levels={len(ms) + 1} ms={ms}",
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
    argv = sys.argv[1:]
    model = "heat2d"
    t_stop = 1.0
    if argv and argv[0] == "allen_cahn":
        # allen_cahn nt nx max_iter ms t_stop
        model = "allen_cahn"
        nt = int(argv[1]) if len(argv) > 1 else 4097
        nx = ny = int(argv[2]) if len(argv) > 2 else 128
        max_iter = int(argv[3]) if len(argv) > 3 else 1
        ms = [int(x) for x in argv[4].split(",")] if len(argv) > 4 else [8, 8]
        t_stop = float(argv[5]) if len(argv) > 5 else 0.032
        main(nt=nt, nx=nx, max_iter=max_iter, ms=ms, model=model,
             t_stop=t_stop, tol=1e-300)
    else:
        nt = int(argv[0]) if len(argv) > 0 else 4097
        nx = int(argv[1]) if len(argv) > 1 else 65
        ny = int(argv[2]) if len(argv) > 2 else nx
        levels = int(argv[3]) if len(argv) > 3 else 4
        m = int(argv[4]) if len(argv) > 4 else 4
        max_iter = int(argv[5]) if len(argv) > 5 else 10
        ms = ([int(x) for x in argv[6].split(",")] if len(argv) > 6 else None)
        main(nt=nt, nx=nx, ny=ny, levels=levels, m=m, max_iter=max_iter, ms=ms)
