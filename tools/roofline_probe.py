"""Phase-level device-time breakdown at publication scale (round-5,
VERDICT r4 weak-#3 / next-#3).

Question: the 257^2 x nt=16385 solve is no longer launch-dominated
(~0.5 s end-to-end) yet sits at ~3% of the measured HBM copy roofline —
where does the device time actually go?

Protocol: ONLY chained whole-program diffs (the round-4 finding: micro
phase timers and fori-loop probes are untrustworthy through the relay;
whole-solve end-to-end timings that fetch values are the unit of
measurement).  Every quantity is a difference of median-of-N timed
solves between two configs that differ in exactly one static knob:

  T_iter      = [T(K2 iters) - T(K1 iters)] / (K2 - K1)
                  -> steady-state device time per V-cycle (launch cost,
                     setup and the one-time materialization cancel)
  T_cf0       = [T(cf_iter=[2,1,...], K2) - T(cf_iter=[1,1,...], K2)] / K2
                  -> device cost of ONE extra level-0 (C-relax + F-relax)
                     pass per iteration: the fine-level relaxation unit
  T_coarse    = [T(cf_iter=2 all levels) - T(cf_iter=[2,1,...])] / K2
                  -> the same extra pass summed over all coarse levels

With the static level structure, each phase's algorithmic-minimum HBM
bytes (bench.min_hbm_bytes_per_solve accounting) divides by its measured
device time to give the achieved fraction of the measured copy roofline
PER PHASE — the number that says whether the dominant phase is
memory-bound (irreducible on this chip) or executor-bound (fixable).

Writes results/roofline_r05.json.  Run on the TPU (default env); a CPU
smoke mode exists for CI (--smoke).
"""

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed_median(m, fetch_leaf, n):
    import jax
    import numpy as _np
    times = []
    for _ in range(n):
        m.conv = _np.zeros(m.iter_max + 1)
        t0 = time.time()
        m.solve_compiled()
        jax.block_until_ready(fetch_leaf())
        times.append(time.time() - t0)
    return statistics.median(times)


def solve_time(build_problem_kw, solver_kw, n):
    import jax
    import bench
    from pymgrit_tpu import Mgrit

    jax.clear_caches()
    p = bench.build_problem(**build_problem_kw)
    m = Mgrit(problem=p, tol=1e-300, logging_lvl=30, **solver_kw)
    m.solve_compiled()                          # compile + warm
    t = timed_median(m, lambda: m.u[0], n)
    # drop the device tubes + executable before the next build: at 257^2
    # each solver holds a ~4 GB fine tube and three coexisting builds OOM
    # the chip; the returned object keeps only the host-side static
    # structure (levels, templates, cf_iter) the byte accounting reads
    m.u = m.v = m.g = None
    for attr in ("_u_save_dummy", "_cnd_stash", "_jit_solve_loop",
                 "_compiled_conv_aux", "save_values_last_iter"):
        if hasattr(m, attr):
            setattr(m, attr, None)
    return t, m


def probe(name, geom, basis, k1, k2, n, copy_bw):
    import bench

    levels = len(geom["ms"]) + 1
    bp = dict(geom, basis=basis)
    rows = {}
    t1, m1 = solve_time(bp, dict(max_iter=k1), n)
    t2, m2 = solve_time(bp, dict(max_iter=k2), n)
    cf0 = [2] + [1] * (levels - 2)
    t3, m3 = solve_time(bp, dict(max_iter=k2, cf_iter=cf0), n)
    t4, _ = solve_time(bp, dict(max_iter=k2, cf_iter=2), n)

    T_iter = (t2 - t1) / (k2 - k1)
    T_cf0 = (t3 - t2) / k2
    T_coarse = (t4 - t3) / k2

    # per-phase algorithmic-minimum bytes: one extra level-0 CF pass moves
    # (full-tube: C-relax 2J + F-relax J + J(m-1) rows r+w; condensed:
    # 2J seed rows) of level-0 state, independent of iteration count
    import jax as _jax
    import numpy as _np

    def leaf_bytes(app):
        return sum(_np.asarray(l).size * 4
                   for l in _jax.tree_util.tree_leaves(app.vector_template))

    info = m2.levels[0]
    S = leaf_bytes(m2.problem[0])
    J = (info.nt - 1) // info.m
    if getattr(m2, "_condensed0", False):
        cf0_bytes = 2 * J * S                      # seeds read+write
    else:
        cf0_bytes = (2 * J + (J + J * (info.m - 1))) * S
    # whole-iteration minimum bytes: per-iteration slice of the bench model
    it_bytes = (bench.min_hbm_bytes_per_solve(m2, k2)
                - bench.min_hbm_bytes_per_solve(m1, k1)) / (k2 - k1)

    rows.update({
        "config": name,
        "basis": basis,
        "condensed": bool(getattr(m2, "_condensed0", False)),
        "iters": [k1, k2],
        "endtoend_median_s": {"k1": round(t1, 4), "k2": round(t2, 4),
                              "cf0_k2": round(t3, 4), "cfall_k2": round(t4, 4)},
        "device_time_per_iteration_ms": round(T_iter * 1e3, 3),
        "device_time_extra_lvl0_cf_pass_ms": round(T_cf0 * 1e3, 3),
        "device_time_extra_coarse_cf_passes_ms": round(T_coarse * 1e3, 3),
        "lvl0_cf_min_bytes_mb": round(cf0_bytes / 1e6, 1),
        "lvl0_cf_achieved_gbps": round(cf0_bytes / max(T_cf0, 1e-9) / 1e9, 1),
        "lvl0_cf_pct_of_copy_roofline": round(
            cf0_bytes / max(T_cf0, 1e-9) / 1e9 / copy_bw, 4),
        "iteration_min_bytes_mb": round(it_bytes / 1e6, 1),
        "iteration_achieved_gbps": round(it_bytes / max(T_iter, 1e-9) / 1e9, 1),
        "iteration_pct_of_copy_roofline": round(
            it_bytes / max(T_iter, 1e-9) / 1e9 / copy_bw, 4),
    })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU config (CI; no TPU claims)")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "results",
                                                  "roofline_r05.json"))
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ.setdefault("PYMGRIT_TPU_NO_X64", "1")

    import bench

    if args.smoke:
        configs = [("smoke129", dict(nx=17, ny=17, nt=257, ms=[8, 4]),
                    "spectral", 3, 9)]
    else:
        configs = [
            # the VERDICT-cited row: 257^2 full-nt physical (0.49 s e2e)
            ("toms257_fullnt_physical",
             dict(nx=257, ny=257, nt=2 ** 14 + 1, ms=[32, 16, 4, 4]),
             "physical", 5, 25),
            # the heaviest-traffic executor: full-tube spectral at 129^2
            ("toms129_fulltube_spectral",
             dict(nx=129, ny=129, nt=2 ** 14 + 1, ms=[32, 16, 4, 4]),
             "spectral", 5, 25),
            # the headline executor for reference
            ("toms129_condensed_spectral",
             dict(nx=129, ny=129, nt=2 ** 14 + 1, ms=[32, 16, 4, 4]),
             "spectral", 5, 25),
        ]

    copy_bw = bench.measure_copy_bw_gbps() if not args.smoke else 10.0
    out = {"hbm_copy_bw_gbps_measured": round(copy_bw, 1),
           "protocol": "chained whole-program diffs of median-of-%d solves"
                       % args.n,
           "rows": []}
    for name, geom, basis, k1, k2 in configs:
        kw = {}
        if name == "toms129_fulltube_spectral":
            kw["condensed"] = False
        row = probe_with_kw(name, geom, basis, k1, k2, args.n, copy_bw, kw)
        out["rows"].append(row)
        print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


def probe_with_kw(name, geom, basis, k1, k2, n, copy_bw, extra_solver_kw):
    if extra_solver_kw:
        import bench
        orig = solve_time

        def patched(bp, skw, nn):
            return orig(bp, dict(skw, **extra_solver_kw), nn)
        globals()["solve_time"], restore = patched, orig
        try:
            return probe(name, geom, basis, k1, k2, n, copy_bw)
        finally:
            globals()["solve_time"] = restore
    return probe(name, geom, basis, k1, k2, n, copy_bw)


if __name__ == "__main__":
    main()
