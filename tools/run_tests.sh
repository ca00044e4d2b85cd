#!/usr/bin/env bash
# Full test matrix runner — the analogue of the reference's tox.ini
# (/root/reference/tox.ini:14-29), which runs pytest plus the mpi test sets.
# Here the distributed tier is covered by the virtual 8-device CPU mesh
# tests under tests/parallel/ (conftest.py forces the CPU platform and the
# device count), and the examples sweep replaces tests/mpi/test_examples.sh.
#
# Usage:
#   tools/run_tests.sh            # unit + parallel test suite
#   tools/run_tests.sh --full     # also sweep every example script
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/ -q "${PYTEST_ARGS[@]:-}"

if [[ "${1:-}" == "--full" ]]; then
    python tools/run_examples.py
fi
