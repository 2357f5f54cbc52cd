#!/usr/bin/env bash
# Multi-host evaluation (reference tools/scripts/dist_test.sh).
# See dist_train.sh for the coordinator environment contract.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python test.py "$@"
