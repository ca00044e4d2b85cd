#!/usr/bin/env bash
# Tiered test runner — the analogue of the reference's tox.ini
# (/root/reference/tox.ini:14-29), which runs pytest plus the mpi test sets.
# The distributed tier runs on the virtual 8-device CPU mesh (conftest.py
# forces the CPU platform + device count) plus a real 2-process
# jax.distributed run (slow tier); the examples sweep replaces
# tests/mpi/test_examples.sh.
#
# Usage:
#   tools/run_tests.sh            # quick core tier (<5 min, standalone-safe)
#   tools/run_tests.sh --all      # full suite (slow + ref batteries, ~40 min)
#   tools/run_tests.sh --full     # full suite + examples sweep + dryrun
set -euo pipefail
cd "$(dirname "$0")/.."

case "${1:-}" in
  --all|--full)
    python -m pytest tests/ -q
    ;;
  *)
    # -n 2: two xdist workers fill both cores of this box (serial drifted
    # to ~5:40 as the tier grew; measured 3:56 with -n 2, same 143 green).
    # The full suite stays serial: the slow tier's multi-process
    # jax.distributed test spawns its own workers and would oversubscribe.
    if python -c "import xdist" 2>/dev/null; then
      python -m pytest tests/ -m "core and not slow" -q -n 2
    else
      python -m pytest tests/ -m "core and not slow" -q
    fi
    ;;
esac

if [[ "${1:-}" == "--full" ]]; then
    python tools/run_examples.py
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
fi
