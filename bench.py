"""Benchmark: heat_2d MGRIT throughput (time-steps/sec/chip) vs the reference.

Config (BASELINE.json): 2D heat, nx=ny=65, nt=4097, 4-level hierarchy (m=4).
Metric: fine-level Phi evaluations per second during the solve phase, on one
chip.  vs_baseline = our steps/sec divided by the reference PyMGRIT's
steps/sec measured live on this machine's CPU (the reference has no TPU
path; serial CPU is its best single-"chip" configuration, and its published
artifacts contain no absolute runtimes — see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "BENCH_BASELINE_CACHE.json")

NT = 4097
NX = NY = 65
LEVELS = 4
M = 4
MAX_ITER = 5


def build_problem():
    import numpy as np
    import jax.numpy as jnp
    from pymgrit_tpu import Heat2D

    def rhs(x, y, t):
        return jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y) * jnp.ones_like(t * x * y)

    def init_cond(x, y):
        return np.sin(np.pi * x) * np.sin(np.pi * y)

    t = np.linspace(0, 1, NT)
    return [
        __import__("pymgrit_tpu").Heat2D(
            x_start=0, x_end=1, y_start=0, y_end=1, nx=NX, ny=NY, a=1.0,
            rhs=rhs, init_cond=init_cond, t_interval=t[:: M ** lvl])
        for lvl in range(LEVELS)
    ]


def count_fine_steps_per_iter(mgrit, first):
    """Fine-level Phi evaluations per MGRIT iteration (same accounting as the
    instrumented reference run in tools/bench_reference.py)."""
    info = mgrit.levels[0]
    nf = info.fpts.size
    nc1 = info.cpts.size - 1
    steps = 0
    if first:
        steps += nf                      # initial F-relax (iteration 1 only)
    steps += mgrit.cf_iter[0] * (nc1 + nf)   # CF-relaxations
    steps += nc1                         # FAS residual restriction
    steps += nf                          # post-correction F-relax
    steps += nc1                         # convergence residual
    return steps


def run_ours():
    import jax
    from pymgrit_tpu import Mgrit

    problem = build_problem()
    mgrit = Mgrit(problem=problem, tol=1e-300, max_iter=MAX_ITER, logging_lvl=30)

    # Warm-up run compiles the full device-resident solve loop; the timed
    # run then measures pure execution (the loop runs max_iter iterations
    # regardless of state, so re-solving from the converged state performs
    # identical work).
    info_first = mgrit.solve_compiled()
    first_conv = [float(c) for c in info_first["conv"]]
    import numpy as _np
    mgrit.conv = _np.zeros(mgrit.iter_max + 1)

    t0 = time.time()
    info = mgrit.solve_compiled()
    jax.block_until_ready(mgrit.u[0])
    solve_time = time.time() - t0

    iters = len(info["conv"])
    steps = sum(count_fine_steps_per_iter(mgrit, it == 0) for it in range(iters))
    return {
        "steps": steps,
        "iterations": iters,
        "conv": first_conv,
        "solve_time_s": solve_time,
        "steps_per_sec": steps / solve_time,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def parity_iters_cpu():
    """Iterations to tol=1e-10 in fp64 on CPU, in a subprocess (the TPU
    backend silently demotes f64)."""
    code = (
        "import json\n"
        "import bench\n"
        "from pymgrit_tpu import Mgrit\n"
        "p = bench.build_problem()\n"
        "m = Mgrit(problem=p, tol=1e-10, max_iter=20, logging_lvl=30)\n"
        "info = m.solve()\n"
        "print('PARITY' + json.dumps({'iterations': len(info['conv']),"
        " 'conv': [float(c) for c in info['conv']]}))\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYMGRIT_TPU_NO_X64="")
    try:
        out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                             capture_output=True, text=True, timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("PARITY"):
                return json.loads(line[len("PARITY"):])
    except Exception:
        pass
    return None


def reference_baseline():
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)
    env = dict(os.environ,
               PYTHONPATH=os.path.join(REPO, "tools", "mpi4py_stub") + ":" +
               "/root/reference/src")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_reference.py"), str(NT)],
            env=env, capture_output=True, text=True, timeout=3600)
        data = json.loads(out.stdout.strip().splitlines()[-1])
        with open(CACHE, "w") as f:
            json.dump(data, f)
        return data
    except Exception:
        return None


def main():
    # Throughput is measured in f32 — the TPU production dtype (full-precision
    # 6-pass matmuls; bf16-default would stall MGRIT).  fp64 parity to 1e-10
    # is verified separately on the CPU backend (TPUs demote f64).
    os.environ.setdefault("PYMGRIT_TPU_NO_X64", "1")
    ours = run_ours()
    ref = reference_baseline()
    parity = parity_iters_cpu()

    vs = (ours["steps_per_sec"] / ref["steps_per_sec"]) if ref else -1.0
    result = {
        "metric": "heat_2d 65x65 nt=4097 4-level MGRIT fine time-steps/sec/chip",
        "value": round(ours["steps_per_sec"], 2),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3) if vs > 0 else None,
        "backend": ours["backend"],
        "iterations_measured": ours["iterations"],
        "solve_time_s": round(ours["solve_time_s"], 3),
        "conv": [float(f"{c:.4e}") for c in ours["conv"]],
        "parity_iters_to_1e-10_cpu_f64": parity["iterations"] if parity else None,
        "reference_steps_per_sec": round(ref["steps_per_sec"], 2) if ref else None,
        "reference_iterations": ref["iterations"] if ref else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
