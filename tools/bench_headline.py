"""Headline-only reproducibility probe.

Runs JUST the bench headline pair (toms129 spectral condensed at K1=5 and
K2=AMORT_K2 iterations, median-of-N protocol) and prints one JSON line per
--repeat with the device-amortized steps/s — the number bench.py quotes as
"value".  Used to demonstrate run-to-run stability of the quoted headline
(VERDICT r4 weak-#1) without paying for the full ~45-min bench sweep.

Usage:  python tools/bench_headline.py [--repeat N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYMGRIT_TPU_NO_X64", "1")

import bench  # noqa: E402


def one_measurement(k2_iters=None):
    geom = {k: bench.CONFIGS["toms129"][k] for k in ("nx", "ny", "nt", "ms")}
    k1 = bench.run_ours("toms129", basis='spectral', **bench.CONFIGS["toms129"])
    k2 = bench.run_ours("toms129_kamort", basis='spectral',
                        max_iter=k2_iters or bench.AMORT_K2, **geom)
    am = bench.amortized_pair(k1, k2)
    return {
        "value_device_amortized_steps_per_sec": am["device_steps_per_sec"],
        "device_time_per_iteration_ms": am["device_time_per_iteration_ms"],
        "endtoend_median_steps_per_sec": round(k1["steps_per_sec"], 2),
        "endtoend_median_solve_time_s": round(k1["solve_time_s"], 4),
        "k1_times_s": k1["solve_times_s"],
        "k2_times_s": k2["solve_times_s"],
    }


def main():
    n = 1
    if "--repeat" in sys.argv:
        n = int(sys.argv[sys.argv.index("--repeat") + 1])
    k2 = None
    if "--k2" in sys.argv:
        k2 = int(sys.argv[sys.argv.index("--k2") + 1])
    for i in range(n):
        t0 = time.time()
        out = one_measurement(k2)
        out["measurement"] = i
        out["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
