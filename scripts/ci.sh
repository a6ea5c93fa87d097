#!/usr/bin/env bash
# CI gates (the reference's .circleci/config.yml:94-200 matrix role):
#   fast   — capability + host layers + one end-to-end micro proof (<6 min)
#   full   — everything incl. full-size SNARK/KZG/MSM/pairing/batch tiers
#   driver — the graft entry/dryrun contract on the virtual 8-device mesh
set -euo pipefail
cd "$(dirname "$0")/.."
tier="${1:-fast}"
case "$tier" in
  fast)   exec python -m pytest tests/ -m "not slow" -q ;;
  full)   exec python -m pytest tests/ -q ;;
  driver) exec python __graft_entry__.py ;;
  *) echo "usage: scripts/ci.sh [fast|full|driver]" >&2; exit 2 ;;
esac
