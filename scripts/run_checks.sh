#!/usr/bin/env bash
# Full CI gate (ADVICE r4): the external driver's 50-query window is a
# sampling optimization; THIS is the complete check — every registered
# query against the DuckDB oracle at sf0.01, plus the pytest suite.
#
#   bash scripts/run_checks.sh            # full sweep + tests
#   bash scripts/run_checks.sh --quick    # oracle sweep only
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/check_correctness.py /root/testdata/sf0.01

if [[ "${1:-}" != "--quick" ]]; then
    python -m pytest tests/ -x -q
fi
