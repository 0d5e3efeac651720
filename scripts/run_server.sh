#!/usr/bin/env bash
# Launch the serving system (equivalent of reference scripts/run_server.sh,
# minus the NFS code copy — the code runs in place and data roots are
# relocatable via RAGROUTE_DATA).
set -euo pipefail

DATASET="${1:-medrag}"
ROUTING="${2:-ragroute}"
shift 2 || true

exec python "$(dirname "$0")/../main.py" \
  --dataset "$DATASET" --routing "$ROUTING" "$@"
